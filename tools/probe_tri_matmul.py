"""Probe: blocked-triangular projection matmul vs the full einsum.

The VE fast path computes P = Kfu @ iLuu^T at HIGHEST precision
(models/elbo.py latent_projections).  iLuu is LOWER triangular, so ~44%
of the MXU passes multiply structural zero blocks (8 x 128-tiles: only
36/64 blocks are nonzero).  This probe measures, on the real chip at
bench shapes, whether skipping those blocks at the XLA level (block-column
einsums + concat) beats the single dense einsum.

Methodology: scan-chained with data dependence (single-dispatch timings
over the tunnel are meaningless — see docs/DESIGN.md §7b).
"""

import functools
import time

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def tri_matmul_blocked(Kfu, iLuu, nb, precision=HI):
    """P[q,n,k] = sum_{m<=k} Kfu[q,n,m] iLuu[q,k,m] skipping zero blocks."""
    M = iLuu.shape[-1]
    cols = []
    for j in range(M // nb):
        hi = (j + 1) * nb
        cols.append(jnp.einsum("qnm,qkm->qnk", Kfu[..., :hi],
                               iLuu[:, j * nb:hi, :hi], precision=precision))
    return jnp.concatenate(cols, axis=-1)


def dense(Kfu, iLuu, precision=HI):
    return jnp.einsum("qnm,qkm->qnk", Kfu, iLuu, precision=precision)


def chain(f, Kfu, iLuu, seed, iters=50):
    def body(carry, _):
        out = f(Kfu + carry, iLuu)
        return jnp.sum(out) * 1e-30 + seed * 1e-25, None

    carry, _ = jax.lax.scan(body, jnp.float32(0.0) + seed * 1e-25, None,
                            length=iters)
    return carry


def time_fn(name, f, Kfu, iLuu, iters=50, reps=5):
    g = jax.jit(functools.partial(chain, f, iters=iters))
    g(Kfu, iLuu, jnp.float32(-1.0)).block_until_ready()
    best = float("inf")
    for r in range(reps):
        # vary the seed per call: the tunnel deduplicates repeated identical
        # dispatches (docs/DESIGN.md §7b), which reports ~0 for real work
        s = jnp.float32(r)
        t0 = time.perf_counter()
        g(Kfu, iLuu, s).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:36s} {best*1e3:8.3f} ms/iter")
    return best


def main():
    key = jax.random.PRNGKey(0)
    Q, M = 4, 1024
    tasks = 6
    B = 512
    k1, k2 = jax.random.split(key)
    # one iLuu shared; per-task Kfu list emulated as one (Q, tasks*B, M)
    L = jnp.tril(jax.random.normal(k1, (Q, M, M), jnp.float32))
    L = L + 3.0 * jnp.eye(M)[None]
    iLuu = jnp.linalg.inv(L)  # dense repr of a triangular inverse
    iLuu = jnp.tril(iLuu)
    Kfu = jax.random.normal(k2, (Q, tasks * B, M), jnp.float32)

    print(f"shapes: Kfu {Kfu.shape}  iLuu {iLuu.shape}  (HIGHEST precision)")
    t_dense = time_fn("dense einsum HIGHEST", dense, Kfu, iLuu)
    for nb in (512, 256, 128):
        f = functools.partial(tri_matmul_blocked, nb=nb)
        t = time_fn(f"blocked-tri nb={nb}", f, Kfu, iLuu)
        print(f"   speedup vs dense: {t_dense/t:.3f}x")

    # numerical agreement
    P0 = dense(Kfu, iLuu)
    for nb in (256, 128):
        P1 = tri_matmul_blocked(Kfu, iLuu, nb)
        err = float(jnp.max(jnp.abs(P0 - P1)) / jnp.max(jnp.abs(P0)))
        print(f"nb={nb} max relerr vs dense: {err:.3e}")

    # default-precision variant (the P @ Lq term runs at default)
    d1 = time_fn("dense einsum DEFAULT",
                 functools.partial(dense, precision=None), Kfu, iLuu)
    for nb in (256,):
        f = functools.partial(tri_matmul_blocked, nb=nb, precision=None)
        t = time_fn(f"blocked-tri DEFAULT nb={nb}", f, Kfu, iLuu)
        print(f"   speedup vs dense default: {d1/t:.3f}x")


if __name__ == "__main__":
    main()
