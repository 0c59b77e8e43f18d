"""Per-op breakdown of the M=4096 cliff (VERDICT r4 weak #3 / next #2).

Step anatomy at M=4096 (probe_step_anatomy --m4096): VE 19.6 ms,
VM+refresh ~62 ms, 4:1 mix 28.0 ms/step (35.7 steps/s).  This probe times
the candidate dominant ops in isolation on the real chip so the cliff is
attributed, DESIGN §7-style, before pulling any lever:

  - refresh: blocked_cholesky_inverse (Q,4096,4096) at nb in {128,256,512}
  - factor only: blocked_cholesky at the same tile sizes
  - stock jnp.linalg.cholesky (the roofline-off baseline)
  - tri_matmul (B,M)x(M,M) at _TRI_NB in {256,512,1024}
  - VE loss fwd+bwd w.r.t. (q_mu, q_sqrt) (the per-VE-step autodiff work)
  - VM loss fwd+bwd w.r.t. hypers (the per-VM-step autodiff work)

Each timing scan-chains ITERS applications with a data dependency and
divides; value-fetched (block_until_ready alone does not wait over the
tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           tools/probe_m4096_breakdown.py [M]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def chain(f, x0, iters, consts=()):
    """Time f applied iters times with a forced data dependency.

    consts: extra operands passed as jit ARGUMENTS (device-resident), not
    python closures — a closed-over (Q, 4096, 4096) array would be baked
    into the HLO as a 268 MB constant and blow the remote-compile tunnel's
    request-size limit (HTTP 413)."""

    @jax.jit
    def run(x, *cs):
        def body(c, _):
            y = f(c, *cs)
            # fold output back into the carry so XLA cannot hoist/dedup
            # (y's pytree may differ from c's: reduce y to one scalar)
            s = sum(jnp.mean(leaf) for leaf in jax.tree_util.tree_leaves(y))
            return jax.tree_util.tree_map(lambda a: a + 0.0 * s, c), None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jax.tree_util.tree_map(jnp.sum, c)

    consts = tuple(jax.device_put(c) for c in consts)
    x0 = jax.device_put(x0)
    r = run(x0, *consts)
    jax.tree_util.tree_map(lambda a: float(np.asarray(a)), r)  # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(x0, *consts)
        jax.tree_util.tree_map(lambda a: float(np.asarray(a)), r)
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    return min(ts)


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    Q, B = 4, 512
    from hetmogp_tpu.ops import linalg

    rng = np.random.RandomState(0)
    A = rng.randn(Q, M, 8).astype(np.float32)
    K = jnp.asarray(A @ np.transpose(A, (0, 2, 1))
                    + np.eye(M, dtype=np.float32) * M)
    print(f"# M={M} Q={Q} B={B} device={jax.devices()[0].device_kind}")

    if "--ve-only" in sys.argv:
        _ve_vm_section(M, Q, B)
        return

    for nb in (128, 256, 512):
        ms = chain(lambda k, nb=nb: linalg.blocked_cholesky_inverse(
            k, nb=nb)[1], K, 4)
        print(f"blocked_cholesky_inverse nb={nb:4d}: {ms:8.2f} ms",
              flush=True)
    for nb in (128, 256, 512):
        ms = chain(lambda k, nb=nb: linalg.blocked_cholesky(k, nb=nb), K, 4)
        print(f"blocked_cholesky         nb={nb:4d}: {ms:8.2f} ms",
              flush=True)
    ms = chain(jnp.linalg.cholesky, K, 4)
    print(f"stock jnp.linalg.cholesky        : {ms:8.2f} ms", flush=True)
    ms = chain(lambda k: linalg.rec_tri_inverse(jnp.linalg.cholesky(k)), K, 4)
    print(f"stock chol + rec_tri_inverse     : {ms:8.2f} ms", flush=True)

    L = jnp.linalg.cholesky(K)
    X = jnp.asarray(rng.randn(Q, B, M).astype(np.float32))
    hi = jax.lax.Precision.HIGHEST
    for nb in (256, 512, 1024):
        ms = chain(lambda x, l, nb=nb: linalg.matmul_tril_t(
            x, l, precision=hi, nb=nb), X, 8, consts=(L,))
        print(f"matmul_tril_t (B,M)x(M,M) nb={nb:4d}: {ms:8.2f} ms",
              flush=True)
    ms = chain(lambda x, l: jnp.matmul(x, jnp.swapaxes(l, -1, -2),
                                       precision=hi), X, 8, consts=(L,))
    print(f"dense matmul  (B,M)x(M,M) HIGHEST : {ms:8.2f} ms", flush=True)

    if "--linalg-only" not in sys.argv:
        _ve_vm_section(M, Q, B)


def _ve_vm_section(M, Q, B):
    # VE / VM autodiff work at bench shapes
    sys.path.insert(0, "/root/repo/tools")
    import probe_ve_parts as pv

    cfg, params, Luu, iLuu, data, scales, elbo_mod = pv.setup(M=M, Q=Q, B=B)

    from hetmogp_tpu.models import elbo as em

    def ve_loss(qm, qs, p, Luu_, iLuu_):
        p = p.replace(q_mu=qm, q_sqrt=qs)
        return -em.elbo_fn(p, data, scales, cfg, Luu=Luu_, iLuu=iLuu_)[0]

    g_ve = jax.grad(ve_loss, argnums=(0, 1))
    ms = chain(lambda t, p, l, il: g_ve(t[0], t[1], p, l, il),
               (params.q_mu, params.q_sqrt), 4,
               consts=(params, Luu, iLuu))
    print(f"VE fwd+bwd (q_mu,q_sqrt), cached Luu: {ms:8.2f} ms", flush=True)

    def vm_loss(ls, var, Z, W, p):
        p = p.replace(log_lengthscale=ls, log_variance=var, Z=Z, W=W)
        return -em.elbo_fn(p, data, scales, cfg)[0]  # no cache: VM refactorizes

    g_vm = jax.grad(vm_loss, argnums=(0, 1, 2, 3))
    ms = chain(lambda t, p: g_vm(t[0], t[1], t[2], t[3], p),
               (params.log_lengthscale, params.log_variance, params.Z,
                params.W), 2,
               consts=(params,))
    print(f"VM fwd+bwd (hypers), uncached      : {ms:8.2f} ms", flush=True)

    # the refresh as the trainer actually runs it
    ms = chain(lambda p: em.prior_cholesky_inverse(p, cfg)[1], params, 4)
    print(f"prior_cholesky_inverse (refresh)   : {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
