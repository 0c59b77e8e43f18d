"""Decompose the VE step: projections vs quadrature vs optimizer.

Times jax.grad of the VE loss w.r.t. (q_mu, q_sqrt) with
(a) the real likelihood chain, (b) a quadratic stand-in for var_exp
(projections only), (c) var_exp alone on fixed (m_F, v_F).
Scan-chained with per-iteration abs() perturbation; value-fetched.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp


def setup(M=1024, Q=4, B=512):
    from hetmogp_tpu import (Bernoulli, Categorical, Exponential, Gamma,
                             HetGaussian, ModelConfig, Poisson)
    from hetmogp_tpu.models import elbo as elbo_mod
    from hetmogp_tpu.models.params import init_params
    from hetmogp_tpu.train import _prior_cholesky_jit, _tri_inverse

    liks = (HetGaussian(), Bernoulli(), Categorical(K=3), Poisson(), Gamma(),
            Exponential())
    T = len(liks)
    rng = np.random.RandomState(0)
    Dx = 2
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=Dx, dtype="float32", jitter=1e-4,
                      adaptive_jitter=False)
    Z = rng.rand(M, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    Luu = _prior_cholesky_jit(params, cfg)
    iLuu = _tri_inverse(Luu)
    data = []
    Ys = [rng.randn(B, 1), (rng.rand(B, 1) > 0.5).astype(float),
          rng.randint(1, 4, (B, 1)).astype(float),
          rng.poisson(3.0, (B, 1)).astype(float),
          rng.gamma(2.0, 1.0, (B, 1)) + 1e-3,
          rng.exponential(1.0, (B, 1)) + 1e-3]
    for t in range(T):
        X = rng.rand(B, Dx).astype(np.float32)
        data.append(elbo_mod.task_data(X, Ys[t], dtype=np.float32))
    scales = jnp.full((T,), 300.0, jnp.float32)
    return cfg, params, Luu, iLuu, tuple(data), scales, elbo_mod


def timeit(name, mk_loss, params, iters=50, reps=4):
    q0, s0 = params.q_mu, params.q_sqrt
    grad = jax.grad(mk_loss, argnums=(0, 1))

    @jax.jit
    def run(q, s, cs):
        def body(acc, c):
            gq, gs = grad(jnp.abs(q + c), s)
            return acc + jnp.sum(gq * gq) + jnp.sum(gs * gs) * 1e-20, None
        return jax.lax.scan(body, jnp.float32(0.0), cs)[0]

    cs = jnp.linspace(0.0, 1e-4, iters)
    float(run(q0, s0, cs))
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(run(q0, s0, cs + 1e-6 * r))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best/iters*1e3:7.3f} ms/iter", flush=True)
    return best / iters


def main():
    cfg, params, Luu, iLuu, data, scales, elbo_mod = setup()

    def full_ve(q, s):
        p = params.replace(q_mu=q, q_sqrt=s)
        total = 0.0
        for t, lik in enumerate(cfg.likelihoods):
            X_t, Y_t, mask_t = data[t]
            m_F, v_F = elbo_mod.task_qf_moments(p, cfg, Luu, X_t, t,
                                                iLuu=iLuu)
            ve = lik.var_exp(Y_t, m_F, v_F)
            total = total + scales[t] * jnp.sum(ve * mask_t)
        return total

    def proj_only(q, s):
        p = params.replace(q_mu=q, q_sqrt=s)
        total = 0.0
        for t in range(len(cfg.likelihoods)):
            X_t, Y_t, mask_t = data[t]
            m_F, v_F = elbo_mod.task_qf_moments(p, cfg, Luu, X_t, t,
                                                iLuu=iLuu)
            total = total + scales[t] * jnp.sum((m_F - 0.1 * v_F) * mask_t[:, None])
        return total

    # var_exp alone: m_F/v_F precomputed once, grads w.r.t. them
    mv = []
    for t in range(len(cfg.likelihoods)):
        X_t, _, _ = data[t]
        mv.append(elbo_mod.task_qf_moments(params, cfg, Luu, X_t, t,
                                           iLuu=iLuu))

    def quad_only(q, s):
        total = 0.0
        for t, lik in enumerate(cfg.likelihoods):
            _, Y_t, mask_t = data[t]
            m_F, v_F = mv[t]
            # tie to (q, s) so grads flow but with trivial extra compute
            m_F = m_F + jnp.sum(q) * 0.0
            v_F = v_F + jnp.sum(s) * 0.0
            ve = lik.var_exp(Y_t, m_F, v_F)
            total = total + scales[t] * jnp.sum(ve * mask_t)
        return total

    t_full = timeit("full VE grad", full_ve, params)
    t_proj = timeit("projections-only grad", proj_only, params)
    t_quad = timeit("var_exp-only grad", quad_only, params)
    print(f"implied quadrature share: {t_full - t_proj:.4f} ms")


if __name__ == "__main__":
    main()
