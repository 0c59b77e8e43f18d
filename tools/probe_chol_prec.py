"""Accuracy + speed of HETMOGP_CHOL_PRECISION=high (refresh matmuls at
3-pass bf16) at bench conditioning: Luu/iLuu residuals vs the HIGHEST
forms and vs an f64 truth, the induced P error, and the isolated
refresh time.  Run twice (env unset / =high) in one session for A/B."""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hetmogp_tpu import Bernoulli, ModelConfig
    from hetmogp_tpu.models import elbo as elbo_mod
    from hetmogp_tpu.models.params import init_params
    from hetmogp_tpu.ops import kernels, linalg

    M, Q, B = 1024, 4, 3072
    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(Bernoulli(),), num_latent=Q,
                      num_inducing=M, input_dim=2, dtype="float32",
                      jitter=1e-4, adaptive_jitter=False,
                      ve_fwd_precision="high")
    Z = rng.rand(M, 2).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    X = jnp.asarray(rng.rand(B, 2).astype(np.float32))

    pair = jax.jit(lambda p: elbo_mod.prior_cholesky_inverse(p, cfg))
    Luu, iLuu = pair(params)
    jax.block_until_ready(iLuu)
    t0 = time.perf_counter()
    for _ in range(20):
        Luu, iLuu = pair(params)
    jax.block_until_ready(iLuu)
    dt = (time.perf_counter() - t0) / 20 * 1e3

    proj = jax.jit(lambda p, luu, iluu, x: elbo_mod.latent_projection_P(
        p, cfg, luu, x, iLuu=iluu)[0])
    P = np.asarray(proj(params, Luu, iLuu, X))

    # f64 truth on host
    K64 = np.asarray(kernels.K_gram_batched(
        cfg.kernel, np.asarray(params.Z, np.float64),
        np.asarray(params.lengthscale, np.float64),
        np.asarray(params.variance, np.float64)))
    K64 = K64 + cfg.jitter * np.eye(M)
    L64 = np.linalg.cholesky(K64)
    iL64 = np.stack([np.linalg.solve(L64[q], np.eye(M)) for q in range(Q)])
    Kfu64 = np.asarray(kernels.K_batched(
        cfg.kernel, np.asarray(X, np.float64),
        np.asarray(params.Z, np.float64),
        np.asarray(params.lengthscale, np.float64),
        np.asarray(params.variance, np.float64)))
    P64 = np.einsum("qnm,qkm->qnk", Kfu64, iL64)

    def rel(a, b):
        return float(np.abs(a - b).max() / np.abs(b).max())

    resid = float(np.abs(np.asarray(Luu) @ np.asarray(iLuu).swapaxes(-1, -2)
                         .swapaxes(-1, -2) * 0).max())  # placeholder
    LiL = np.einsum("qij,qjk->qik", np.asarray(Luu, np.float64),
                    np.asarray(iLuu, np.float64))
    eyer = float(np.abs(LiL - np.eye(M)).max())
    gamma64 = (np.asarray(kernels.Kdiag_batched(
        cfg.kernel, np.asarray(X, np.float64),
        np.asarray(params.variance, np.float64)))
        - np.einsum("qnm,qnm->qn", P64, P64))
    gamma = (np.asarray(kernels.Kdiag_batched(
        cfg.kernel, X, params.variance), np.float64)
        - np.einsum("qnm,qnm->qn", P.astype(np.float64),
                    P.astype(np.float64)))
    print(f"CHOL={os.environ.get('HETMOGP_CHOL_PRECISION', 'highest')}: "
          f"refresh {dt:.3f} ms | ||L iL - I||_max {eyer:.2e} | "
          f"L relerr {rel(np.asarray(Luu, np.float64), L64):.2e} | "
          f"iL relerr {rel(np.asarray(iLuu, np.float64), iL64):.2e} | "
          f"P relerr {rel(P.astype(np.float64), P64):.2e} | "
          f"gamma abs err {np.abs(gamma - gamma64).max():.2e} "
          f"(min gamma64 {gamma64.min():.2e})")


if __name__ == "__main__":
    main()
