"""Natural-gradient correctness.

The classic property: with a conjugate (Gaussian) likelihood and step size
1.0, one natural-gradient step in (mean, covariance) natural parameters
lands exactly on the optimal q(u) for the current hyperparameters — i.e.
CAVI in one step.  This pins the whole NGD implementation (dELBO/d(m,S),
natural-parameter transforms, recovery of (m, L)).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu import likelihoods as L
from hetmogp_tpu import train as train_mod
from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.data import full_batch
from hetmogp_tpu.models import elbo as elbo_mod
from hetmogp_tpu.models.params import init_params


def _gaussian_problem():
    # Q=1: with multiple latents the factorized-over-q family has cross
    # coupling, so simultaneous NGD is a Jacobi iteration (converges, but
    # not one-shot); the one-step CAVI exactness property needs Q=1.
    rng = np.random.RandomState(0)
    n, M, Q = 50, 6, 1
    liks = (L.Gaussian(sigma=0.4),)
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, whiten=True, dtype="float64")
    X_list = [np.sort(rng.rand(n, 1), 0)]
    Y_list = [np.sin(5 * X_list[0]) + 0.1 * rng.randn(n, 1)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3,
                         q_mu_scale=1.0)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    return cfg, params, data, jnp.asarray(scales, cfg.np_dtype)


def test_one_natgrad_step_is_exact_for_conjugate_likelihood():
    cfg, params, data, scales = _gaussian_problem()
    ng = jax.jit(lambda p: train_mod.natgrad_update(p, data, scales, cfg,
                                                    lr=1.0))
    p1 = ng(params)

    # at the optimum, the gradient wrt variational params vanishes
    def elbo_of_q(q_mu, q_sqrt):
        p = p1.replace(q_mu=q_mu, q_sqrt=q_sqrt)
        return elbo_mod.elbo_fn(p, data, scales, cfg)[0]

    g_mu, g_L = jax.jit(jax.grad(elbo_of_q, argnums=(0, 1)))(p1.q_mu,
                                                             p1.q_sqrt)
    g_L = jnp.tril(g_L)  # only the lower triangle is a real parameter
    assert float(jnp.abs(g_mu).max()) < 1e-8
    assert float(jnp.abs(g_L).max()) < 1e-8

    # a second step is a fixed point
    p2 = ng(p1)
    np.testing.assert_allclose(np.asarray(p2.q_mu), np.asarray(p1.q_mu),
                               atol=1e-8)
    S1 = np.asarray(jnp.tril(p1.q_sqrt) @ jnp.tril(p1.q_sqrt).mT)
    S2 = np.asarray(jnp.tril(p2.q_sqrt) @ jnp.tril(p2.q_sqrt).mT)
    np.testing.assert_allclose(S2, S1, atol=1e-8)


def test_multi_latent_natgrad_progress():
    """Q>1: simultaneous block NGD is a (damped) Jacobi iteration over the
    cross-coupled blocks.  Robust properties to pin down: the covariance
    gradient collapses essentially immediately (the S-update is exact per
    block), the ELBO improves monotonically, and the mean gradient shrinks.
    (Full stationarity can be arbitrarily slow when latents are redundant —
    Jacobi's spectral radius approaches 1 for unidentifiable mixtures.)
    """
    rng = np.random.RandomState(2)
    n, M, Q = 40, 5, 2
    cfg = ModelConfig(likelihoods=(L.Gaussian(sigma=0.5),), num_latent=Q,
                      num_inducing=M, input_dim=1, whiten=True,
                      dtype="float64")
    X_list = [np.sort(rng.rand(n, 1), 0)]
    Y_list = [np.sin(5 * X_list[0]) + 0.1 * rng.randn(n, 1)]
    params = init_params(jax.random.PRNGKey(3), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3,
                         q_mu_scale=1.0)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)

    @jax.jit
    def elbo_and_grads_j(p):
        def f(q_mu, q_sqrt):
            return elbo_mod.elbo_fn(p.replace(q_mu=q_mu, q_sqrt=q_sqrt),
                                    data, scales, cfg)[0]

        e = f(p.q_mu, p.q_sqrt)
        g_mu, g_L = jax.grad(f, argnums=(0, 1))(p.q_mu, p.q_sqrt)
        return e, jnp.abs(g_mu).max(), jnp.abs(jnp.tril(g_L)).max()

    def elbo_and_grads(p):
        e, gmu, gL = elbo_and_grads_j(p)
        return float(e), float(gmu), float(gL)

    ng_step = jax.jit(lambda p: train_mod.natgrad_update(p, data, scales,
                                                         cfg, lr=0.7))
    e0, gmu0, _ = elbo_and_grads(params)
    p = params
    elbos = [e0]
    for _ in range(30):
        p = ng_step(p)
        elbos.append(elbo_and_grads(p)[0])
    e1, gmu1, gL1 = elbo_and_grads(p)
    assert gL1 < 1e-8  # per-block S-update is exact
    assert all(b >= a - 1e-9 for a, b in zip(elbos, elbos[1:]))  # monotone
    assert gmu1 < 0.2 * gmu0  # mean gradient shrinking


def test_natgrad_step_improves_nonconjugate():
    rng = np.random.RandomState(1)
    n, M, Q = 60, 6, 2
    cfg = ModelConfig(likelihoods=(L.Bernoulli(),), num_latent=Q,
                      num_inducing=M, input_dim=1, whiten=True,
                      dtype="float64")
    X_list = [np.sort(rng.rand(n, 1), 0)]
    Y_list = [(rng.rand(n, 1) < 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(1), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3,
                         q_mu_scale=1.0)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    ej = jax.jit(lambda p: elbo_mod.elbo_fn(p, data, scales, cfg)[0])
    ng = jax.jit(lambda p: train_mod.natgrad_update(p, data, scales, cfg,
                                                    lr=0.5))
    e0 = float(ej(params))
    p = params
    for _ in range(5):
        p = ng(p)
    e1 = float(ej(p))
    assert e1 > e0


def test_natgrad_adam_beats_adam_nonconjugate_e2e():
    """End-to-end: the natgrad_adam driver reaches a better ELBO than plain
    Adam in the same (small) number of steps on a non-conjugate model
    (Bernoulli + HetGaussian)."""
    from hetmogp_tpu.data import MinibatchStream

    rng = np.random.RandomState(4)
    n, M, Q = 80, 8, 2
    cfg = ModelConfig(likelihoods=(L.Bernoulli(), L.HetGaussian()),
                      num_latent=Q, num_inducing=M, input_dim=1,
                      whiten=True, dtype="float64")
    X1 = np.sort(rng.rand(n, 1), 0)
    X2 = np.sort(rng.rand(n, 1), 0)
    Y1 = (np.sin(6 * X1) + 0.3 * rng.randn(n, 1) > 0).astype(float)
    Y2 = np.sin(4 * X2) + 0.2 * rng.randn(n, 1)
    params = init_params(jax.random.PRNGKey(5), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.2,
                         q_mu_scale=0.5)
    data, scales = full_batch([X1, X2], [Y1, Y2], dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)

    steps = 25

    def run(optimizer, **kw):
        tc = TrainConfig(optimizer=optimizer, step_rate=0.02, **kw)
        stream = MinibatchStream([X1, X2], [Y1, Y2], n, shuffle=False,
                                 dtype=cfg.np_dtype)  # full batch each step
        p, hist = train_mod.svi_fit(params, cfg, tc, stream, steps, vem=False)
        return float(elbo_mod.elbo_fn(p, data, scales, cfg)[0])

    e_adam = run("adam")
    e_ng = run("natgrad_adam", natgrad_lr=0.5)
    assert e_ng > e_adam


def test_natgrad_vem_scan_trainer_on_device():
    """The restructured VEM natgrad path inside the scan trainer: NGD as a
    lax.cond branch on VE steps reusing the cached prior Cholesky, adam on
    hypers in VM steps — finite and improving end-to-end."""
    rng = np.random.RandomState(7)
    n, M, Q = 64, 8, 2
    cfg = ModelConfig(likelihoods=(L.Bernoulli(), L.HetGaussian()),
                      num_latent=Q, num_inducing=M, input_dim=1,
                      whiten=True, dtype="float64")
    X1, X2 = np.sort(rng.rand(n, 1), 0), np.sort(rng.rand(n, 1), 0)
    Y1 = (np.sin(6 * X1) + 0.3 * rng.randn(n, 1) > 0).astype(float)
    Y2 = np.sin(4 * X2) + 0.2 * rng.randn(n, 1)
    params = init_params(jax.random.PRNGKey(5), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.2,
                         q_mu_scale=0.5)
    tc = TrainConfig(optimizer="natgrad_adam", step_rate=0.02,
                     natgrad_lr=0.3)
    new_params, hist = train_mod.svi_fit_on_device(
        params, cfg, tc, [X1, X2], [Y1, Y2], batch_sizes=32, num_steps=30,
        key=jax.random.PRNGKey(1), steps_per_call=15, vem=True)
    assert hist.shape == (30,)
    assert np.isfinite(hist).all()
    assert hist[-10:].mean() > hist[:10].mean()
    # NGD actually moved the variational state and VM moved the hypers
    assert np.abs(np.asarray(new_params.q_mu)
                  - np.asarray(params.q_mu)).max() > 1e-3
    assert np.abs(np.asarray(new_params.log_lengthscale)
                  - np.asarray(params.log_lengthscale)).max() > 1e-6


def test_natgrad_fused_rows_matches_per_task():
    """config.fuse_task_rows through the natural-gradient VE step: the
    fused (m, S)-forward must give the same update, ELBO and aux as the
    per-task loop (same math, different matmul blocking) on a
    multi-task heterogeneous problem."""
    import dataclasses

    rng = np.random.RandomState(4)
    liks = (L.HetGaussian(), L.Bernoulli(), L.Poisson())
    cfg = ModelConfig(likelihoods=liks, num_latent=2, num_inducing=8,
                      input_dim=1, whiten=True, dtype="float64")
    X_list = [np.sort(rng.rand(n, 1), 0) for n in (40, 32, 24)]
    Y_list = [rng.randn(40, 1), (rng.rand(32, 1) > 0.5).astype(float),
              rng.poisson(2.0, (24, 1)).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 8)[:, None], lengthscale=0.3)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    cfgP = dataclasses.replace(cfg, fuse_task_rows=False)
    cfgF = dataclasses.replace(cfg, fuse_task_rows=True)
    # the fused path is gated on the cached inverse being present, so both
    # sides get the same (Luu, iLuu) cache (the trainer's fast_projection
    # state does the same)
    from hetmogp_tpu.models import elbo as elbo_mod
    from hetmogp_tpu.ops import linalg

    Luu = elbo_mod.prior_cholesky(params, cfgP)
    iLuu = linalg.rec_tri_inverse(Luu)
    p0, e0, a0, si0 = train_mod.natgrad_ve_step(params, data, scales, cfgP,
                                                0.3, Luu=Luu, iLuu=iLuu)
    p1, e1, a1, si1 = train_mod.natgrad_ve_step(params, data, scales, cfgF,
                                                0.3, Luu=Luu, iLuu=iLuu)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a1["ve"]), np.asarray(a0["ve"]),
                               rtol=1e-12)
    assert int(a0["ng_backoff"]) == 0 and int(a1["ng_backoff"]) == 0
    np.testing.assert_allclose(np.asarray(si1), np.asarray(si0), rtol=1e-9,
                               atol=1e-11)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9,
                                   atol=1e-11)


def test_natgrad_carried_s_inv_matches_cold_start():
    """The trainer-carried S^{-1} (the update's exact A + jitter*I
    byproduct) must give the same next step as recomputing S^{-1} from Lq
    — and a chain of carried steps stays consistent."""
    cfg, params, data, scales = _gaussian_problem()
    p, s_inv = params, None
    for i in range(3):
        p_cold, e_cold, _, si_cold = train_mod.natgrad_ve_step(
            p, data, scales, cfg, 0.5)
        p_carr, e_carr, _, si_carr = train_mod.natgrad_ve_step(
            p, data, scales, cfg, 0.5, S_inv=s_inv)
        np.testing.assert_allclose(float(e_carr), float(e_cold), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(p_carr.q_mu),
                                   np.asarray(p_cold.q_mu), atol=1e-9)
        np.testing.assert_allclose(np.asarray(p_carr.q_sqrt),
                                   np.asarray(p_cold.q_sqrt), atol=1e-9)
        p, s_inv = p_carr, si_carr
        # the carried value IS (Lq_new Lq_new^T)^{-1} up to roundoff
        Lq = jnp.tril(p.q_sqrt)
        S = np.asarray(Lq @ Lq.mT)
        prod = np.asarray(s_inv) @ S
        eye = np.eye(S.shape[-1])
        assert np.abs(prod - eye[None]).max() < 1e-6


def test_natgrad_lr_backoff_recovers_from_indefinite_A():
    """Robustness (round-3 verdict weak #2): A = S^{-1} - 2 lr g_S can go
    indefinite at large lr.  Engineered case: whitened KL makes
    A ~ (1-lr) S^{-1} + lr I - lr sym(g_ve); with q_sqrt = I/sqrt(2)
    (S^{-1} = 2I) the KL part alone gives A ~ (2 - lr) I, so lr = 4 fails
    and lr/4 = 1 succeeds -> ng_backoff == 1, finite update, state moved.
    At lr = 4000 even the retry (lr 1000) fails -> ng_backoff == 2 and the
    step degrades to a no-op on q instead of NaNs.  (sigma is large so the
    VE curvature term lr * P^T diag(c) P stays small against the KL part —
    with the conjugate sigma=0.4 problem the likelihood curvature keeps A
    PD at any practical lr.)"""
    rng = np.random.RandomState(0)
    n, M, Q = 50, 6, 1
    cfg = ModelConfig(likelihoods=(L.Gaussian(sigma=20.0),), num_latent=Q,
                      num_inducing=M, input_dim=1, whiten=True,
                      dtype="float64")
    X_list = [np.sort(rng.rand(n, 1), 0)]
    Y_list = [np.sin(5 * X_list[0]) + 0.1 * rng.randn(n, 1)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3,
                         q_mu_scale=1.0)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    params = params.replace(
        q_sqrt=jnp.broadcast_to(
            jnp.eye(cfg.num_inducing, dtype=params.q_sqrt.dtype)
            / np.sqrt(2.0), params.q_sqrt.shape))

    p1, e1, a1, si1 = train_mod.natgrad_ve_step(params, data, scales, cfg,
                                                lr=4.0)
    assert int(a1["ng_backoff"]) == 1
    for leaf in (p1.q_mu, p1.q_sqrt, si1):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(p1.q_mu) - np.asarray(params.q_mu)).max() > 1e-6

    p2, e2, a2, si2 = train_mod.natgrad_ve_step(params, data, scales, cfg,
                                                lr=4000.0)
    assert int(a2["ng_backoff"]) == 2
    np.testing.assert_array_equal(np.asarray(p2.q_mu),
                                  np.asarray(params.q_mu))
    np.testing.assert_array_equal(np.asarray(p2.q_sqrt),
                                  np.asarray(jnp.tril(params.q_sqrt)))
    assert np.isfinite(np.asarray(si2)).all()


def test_exact_retraction_rejects_finite_divergent_step():
    """The round-5 divergence guard (DESIGN §7n): a step can stay FINITE
    while blowing up — with Gaussian data far from the init, the VE
    curvature keeps A = S^{-1} - 2 lr g_S positive definite at any lr (the
    curvature term enters with the stabilizing sign), so the old
    finiteness-only acceptance would take a step that moves the whitened
    mean thousands of prior sd at once.  One such accepted step poisons q
    and the backoff then rejects everything from the garbage point — a
    livelock (measured on tools/probe_natgrad_frontier.py at lr=1.0).
    The guard bounds per-step whitened-mean movement (_NG_STEP_MAX) and
    whitened posterior variance (_NG_SANE_VAR): the divergent step must be
    rejected at lr AND lr/4 (ng_backoff == 2, q unchanged), while a small
    step from the same point is still accepted."""
    rng = np.random.RandomState(0)
    n, M, Q = 50, 6, 1
    cfg = ModelConfig(likelihoods=(L.Gaussian(sigma=0.4),), num_latent=Q,
                      num_inducing=M, input_dim=1, whiten=True,
                      dtype="float64")
    X_list = [np.sort(rng.rand(n, 1), 0)]
    # observations ~1e4 sd away from the zero-mean init: the raw natgrad
    # step is finite but moves the whitened mean off the map
    Y_list = [1e4 + np.sin(5 * X_list[0]) + 0.1 * rng.randn(n, 1)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3,
                         q_mu_scale=1.0)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)

    # the raw lr=1 step really is finite AND divergent (the scenario the
    # guard exists for) — verified against the UNGUARDED attempt by
    # checking the guard's own report: rejected at both attempts
    p1, e1, a1, si1 = train_mod.natgrad_ve_step(params, data, scales, cfg,
                                                lr=1.0, retraction="exact")
    assert int(a1["ng_backoff"]) == 2
    np.testing.assert_array_equal(np.asarray(p1.q_mu),
                                  np.asarray(params.q_mu))
    np.testing.assert_array_equal(np.asarray(p1.q_sqrt),
                                  np.asarray(jnp.tril(params.q_sqrt)))
    assert np.isfinite(np.asarray(si1)).all()

    # a small step from the same point passes the guard and moves q
    # toward the data (movement below _NG_STEP_MAX but well above noise)
    p2, e2, a2, si2 = train_mod.natgrad_ve_step(params, data, scales, cfg,
                                                lr=1e-6, retraction="exact")
    assert int(a2["ng_backoff"]) == 0
    moved = np.abs(np.asarray(p2.q_mu) - np.asarray(params.q_mu)).max()
    assert 1e-4 < moved < train_mod._NG_STEP_MAX


def test_cholesky_retraction_matches_exact_direction():
    """natgrad_retraction='cholesky' is the same natural gradient under a
    different retraction: as lr -> 0 (inside the trust ball, where the
    damping is inactive) the (m, S) update directions coincide with the
    exact (theta-line) retraction."""
    cfg, params, data, scales = _gaussian_problem()

    def updates(retraction, lr):
        p, _, _, _ = train_mod.natgrad_ve_step(params, data, scales, cfg,
                                               lr, retraction=retraction)
        L0 = jnp.tril(params.q_sqrt)
        L1 = jnp.tril(p.q_sqrt)
        dS = (L1 @ L1.mT - L0 @ L0.mT) / lr
        dm = (p.q_mu - params.q_mu) / lr
        return np.asarray(dm), np.asarray(dS)

    # lr small against the curvature scale: the retractions agree to O(lr)
    # RELATIVE (expansion parameter ~ 2 lr ||S g_S|| ~ 1e4 lr here), so
    # lr = 1e-8 puts the expected gap at ~1e-4 relative
    lr = 1e-8
    dm_e, dS_e = updates("exact", lr)
    dm_c, dS_c = updates("cholesky", lr)
    assert np.abs(dm_c - dm_e).max() < 1e-3 * np.abs(dm_e).max()
    assert np.abs(dS_c - dS_e).max() < 1e-3 * np.abs(dS_e).max()


def test_cholesky_retraction_trust_keeps_factor_valid_any_lr():
    """The trust damping keeps diag(I + X) in [1-trust, 1+trust]: for ANY
    lr (including the engineered case that drives the exact retraction's
    A indefinite, and absurd lrs) the factor stays exactly lower
    triangular with positive diagonal, per-step contraction is bounded,
    S_inv is never materialized, and no backoff fires."""
    rng = np.random.RandomState(0)
    n, M, Q = 50, 6, 1
    cfg = ModelConfig(likelihoods=(L.Gaussian(sigma=20.0),), num_latent=Q,
                      num_inducing=M, input_dim=1, whiten=True,
                      dtype="float64")
    X_list = [np.sort(rng.rand(n, 1), 0)]
    Y_list = [np.sin(5 * X_list[0]) + 0.1 * rng.randn(n, 1)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3,
                         q_mu_scale=1.0)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    params = params.replace(
        q_sqrt=jnp.broadcast_to(
            jnp.eye(M, dtype=params.q_sqrt.dtype) / np.sqrt(2.0),
            params.q_sqrt.shape))
    d0 = 1.0 / np.sqrt(2.0)
    for lr in (0.5, 4.0, 4000.0):
        p, e, a, s_inv = train_mod.natgrad_ve_step(
            params, data, scales, cfg, lr, retraction="cholesky", trust=0.3)
        assert s_inv is None  # never materialized, passes through
        Lq = np.asarray(p.q_sqrt)
        assert np.isfinite(Lq).all()
        assert (np.triu(Lq, 1) == 0).all()  # exactly lower triangular
        d = np.diagonal(Lq, axis1=-2, axis2=-1)
        assert (d > 0).all()
        # bounded multiplicative step: the diagonal cannot move past the
        # trust ball in one step (columns scale within [1-2*trust, ...]
        # through the off-diagonal coupling; the diagonal itself is tight)
        assert (d >= d0 * (1 - 0.3) - 1e-12).all()
        assert int(a["ng_backoff"]) == 0


def test_cholesky_retraction_converges_nonconjugate():
    """End-to-end quality: the cholesky retraction reaches an ELBO in the
    same neighborhood as the exact retraction on a non-conjugate problem
    (same steps, same lr) and beats the starting point decisively."""
    rng = np.random.RandomState(1)
    n, M, Q = 60, 6, 2
    cfg = ModelConfig(likelihoods=(L.Bernoulli(),), num_latent=Q,
                      num_inducing=M, input_dim=1, whiten=True,
                      dtype="float64")
    X_list = [np.sort(rng.rand(n, 1), 0)]
    Y_list = [(rng.rand(n, 1) < 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(1), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3,
                         q_mu_scale=1.0)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    ej = jax.jit(lambda p: elbo_mod.elbo_fn(p, data, scales, cfg)[0])

    def run(retraction, steps):
        ng = jax.jit(lambda p: train_mod.natgrad_update(
            p, data, scales, cfg, lr=0.5, retraction=retraction))
        p = params
        for _ in range(steps):
            p = ng(p)
        return float(ej(p))

    e0 = float(ej(params))
    e_exact = run("exact", 15)
    e_chol = run("cholesky", 30)  # bounded steps: allow 2x the iterations
    assert e_chol > e0 + 0.8 * (e_exact - e0)


def test_cholesky_retraction_on_device_trainer():
    """TrainConfig(natgrad_retraction='cholesky') through the scan
    trainer: no S^{-1} in the state, finite and improving end-to-end."""
    rng = np.random.RandomState(7)
    n, M, Q = 64, 8, 2
    cfg = ModelConfig(likelihoods=(L.Bernoulli(), L.HetGaussian()),
                      num_latent=Q, num_inducing=M, input_dim=1,
                      whiten=True, dtype="float64")
    X1, X2 = np.sort(rng.rand(n, 1), 0), np.sort(rng.rand(n, 1), 0)
    Y1 = (np.sin(6 * X1) + 0.3 * rng.randn(n, 1) > 0).astype(float)
    Y2 = np.sin(4 * X2) + 0.2 * rng.randn(n, 1)
    params = init_params(jax.random.PRNGKey(5), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.2,
                         q_mu_scale=0.5)
    tc = TrainConfig(optimizer="natgrad_adam", step_rate=0.02,
                     natgrad_lr=0.3, natgrad_retraction="cholesky")
    new_params, hist = train_mod.svi_fit_on_device(
        params, cfg, tc, [X1, X2], [Y1, Y2], batch_sizes=32, num_steps=30,
        key=jax.random.PRNGKey(1), steps_per_call=15, vem=True)
    assert np.isfinite(hist).all()
    assert hist[-10:].mean() > hist[:10].mean()
    assert np.abs(np.asarray(new_params.q_mu)
                  - np.asarray(params.q_mu)).max() > 1e-3
