"""Property sweep: random model configurations stay finite and match the
oracle — a robustness net over the single hand-picked test problems."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hetmogp_tpu import likelihoods as L
from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.data import full_batch
from hetmogp_tpu.models import elbo as elbo_mod
from hetmogp_tpu.models import predict as predict_mod
from hetmogp_tpu.models.params import init_params

_LIK_POOL = [
    (L.Gaussian(sigma=0.7), lambda rng, n: rng.randn(n, 1)),
    (L.HetGaussian(), lambda rng, n: rng.randn(n, 1)),
    (L.Bernoulli(), lambda rng, n: (rng.rand(n, 1) > 0.5).astype(float)),
    (L.Categorical(K=4), lambda rng, n: rng.randint(1, 5, (n, 1)).astype(float)),
    (L.Poisson(), lambda rng, n: rng.poisson(2.0, (n, 1)).astype(float)),
    (L.Gamma(), lambda rng, n: rng.gamma(2.0, 1.0, (n, 1)) + 1e-3),
    (L.Beta(), lambda rng, n: np.clip(rng.rand(n, 1), 0.02, 0.98)),
    (L.Exponential(), lambda rng, n: rng.exponential(1.0, (n, 1)) + 1e-3),
    (L.StudentT(df=5.0), lambda rng, n: rng.standard_t(5.0, (n, 1))),
    (L.Ordinal(K=3), lambda rng, n: rng.randint(1, 4, (n, 1)).astype(float)),
    (L.NegativeBinomial(r=1.5),
     lambda rng, n: rng.poisson(2.0, (n, 1)).astype(float)),
    (L.Binomial(n=4),
     lambda rng, n: rng.binomial(4, 0.4, (n, 1)).astype(float)),
    (L.ZeroInflatedPoisson(),
     lambda rng, n: (rng.poisson(2.0, (n, 1))
                     * (rng.rand(n, 1) > 0.3)).astype(float)),
    (L.LogNormal(), lambda rng, n: np.exp(0.5 * rng.randn(n, 1))),
    (L.Weibull(k=1.5), lambda rng, n: rng.weibull(1.5, (n, 1)) + 1e-3),
]


@pytest.mark.parametrize("seed", range(4))
def test_random_config_elbo_grads_predictions_finite(seed):
    rng = np.random.RandomState(seed)
    T = rng.randint(1, 5)
    picks = rng.choice(len(_LIK_POOL), size=T, replace=True)
    liks = tuple(_LIK_POOL[i][0] for i in picks)
    gens = [_LIK_POOL[i][1] for i in picks]
    Q = rng.randint(1, 4)
    M = rng.choice([4, 8, 12])
    Dx = rng.randint(1, 3)
    whiten = bool(rng.rand() < 0.5)
    R = int(rng.choice([1, 1, 2]))  # coregionalization rank, biased to 1

    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=int(M),
                      input_dim=Dx, whiten=whiten, dtype="float64", rank=R)
    Ns = [int(rng.randint(10, 40)) for _ in range(T)]
    X_list = [rng.rand(n, Dx) for n in Ns]
    Y_list = [g(rng, n) for g, n in zip(gens, Ns)]
    # k-means Z init: random Z can produce near-coincident inducing points
    # whose Kuu is numerically singular (cond ~ 1e9) — gradients through
    # its factorization legitimately overflow there (the reference's
    # explicit inverse blows up identically), so the sweep exercises sane
    # initializations, which is also what the library recommends.
    from hetmogp_tpu.data import init_z_kmeans

    Z0 = init_z_kmeans(X_list, int(M), seed=seed)
    params = init_params(jax.random.PRNGKey(seed), cfg, Z0,
                         lengthscale=0.2 + 0.3 * rng.rand(),
                         variance=0.5 + rng.rand(), q_mu_scale=0.5)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)

    # ELBO + gradients finite (jit: eager quadrature custom-VJP dispatch on
    # the 1-core CI host costs ~10x the one-shot compile)
    def loss(p):
        return -elbo_mod.elbo_fn(p, data, scales, cfg)[0]

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()

    # the fused-rows path (the default) matches the per-task loop across
    # the whole random config space (DESIGN §7g).  It is gated on the
    # cached inverse being present, so both sides get the same cache.
    from hetmogp_tpu.ops import linalg

    Luu = elbo_mod.prior_cholesky(params, cfg)
    iLuu = linalg.rec_tri_inverse(Luu)
    valF, gradsF = jax.jit(jax.value_and_grad(
        lambda p: -elbo_mod.elbo_fn(p, data, scales, cfg,
                                    Luu=Luu, iLuu=iLuu)[0]))(params)
    cfgP = dataclasses.replace(cfg, fuse_task_rows=False)
    valP, gradsP = jax.jit(jax.value_and_grad(
        lambda p: -elbo_mod.elbo_fn(p, data, scales, cfgP,
                                    Luu=Luu, iLuu=iLuu)[0]))(params)
    np.testing.assert_allclose(float(valP), float(valF), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(gradsF),
                    jax.tree_util.tree_leaves(gradsP)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-7,
                                   atol=1e-9)

    # whitened/un-whitened agree on the ELBO value
    other = dataclasses.replace(cfg, whiten=not whiten)
    params_other = (elbo_mod.unwhiten_params(params, cfg) if whiten
                    else elbo_mod.whiten_params(params, cfg))
    val2 = -jax.jit(lambda p: elbo_mod.elbo_fn(p, data, scales, other)[0])(
        params_other)
    np.testing.assert_allclose(float(val2), float(val), rtol=1e-8)

    # one SVI step runs and predictions are finite
    from hetmogp_tpu import train as train_mod

    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(params, cfg, opt)
    state, metrics = step(state, data, scales)
    assert np.isfinite(float(metrics["elbo"]))

    Xp = rng.rand(7, Dx)
    mp, vp = jax.jit(lambda p: predict_mod.predictive(p, cfg, [Xp] * T))(
        state.params)
    for m, v in zip(mp, vp):
        assert np.isfinite(np.asarray(m)).all()
        assert (np.asarray(v) >= -1e-9).all()

    # full-covariance q(f) for the first task: finite, PSD-ish diagonal,
    # and diag(full) == marginal variance
    Luu = elbo_mod.prior_cholesky(state.params, cfg)
    mF, covF = elbo_mod.task_qf_full_cov(state.params, cfg, Luu,
                                         jnp.asarray(Xp), 0)
    mF2, vF2 = elbo_mod.task_qf_moments(state.params, cfg, Luu,
                                        jnp.asarray(Xp), 0,
                                        clip_variance=False)
    assert np.isfinite(np.asarray(covF)).all()
    diag = np.diagonal(np.asarray(covF), axis1=-2, axis2=-1).T  # (N, F_t)
    np.testing.assert_allclose(diag, np.asarray(vF2), atol=1e-8)
