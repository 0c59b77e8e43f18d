"""Auxiliary subsystems: metrics logging, profiling/debug utilities."""

import jax.numpy as jnp
import numpy as np
import pytest


def test_metrics_logger_collects_and_jsonl(tmp_path):
    import jax.numpy as jnp

    from hetmogp_tpu.metrics import MetricsLogger

    path = tmp_path / "metrics.jsonl"
    printed = []
    log = MetricsLogger(print_every=2, jsonl_path=str(path),
                        printer=printed.append)
    for i in range(4):
        log(i, {"elbo": jnp.asarray(-100.0 + i), "kl": jnp.asarray(3.0),
                "ve": jnp.asarray([1.0, 2.0])})
    log.close()

    assert len(log.history) == 4
    np.testing.assert_allclose(log.elbo, [-100, -99, -98, -97])
    assert log.history[0]["ve"] == [1.0, 2.0]
    assert len(printed) == 2  # steps 2 and 4

    import json

    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) == 4 and lines[-1]["elbo"] == -97.0


def test_metrics_logger_as_fit_callback():
    import jax

    from hetmogp_tpu import (Bernoulli, Gaussian, ModelConfig, SVMOGP,
                             TrainConfig)
    from hetmogp_tpu.metrics import MetricsLogger

    rng = np.random.RandomState(0)
    X = [rng.rand(30, 1), rng.rand(25, 1)]
    Y = [rng.randn(30, 1), (rng.rand(25, 1) > 0.5).astype(float)]
    cfg = ModelConfig(likelihoods=(Gaussian(), Bernoulli()), num_latent=2,
                      num_inducing=5, input_dim=1, dtype="float64")
    m = SVMOGP(cfg, X, Y, np.linspace(0, 1, 5)[:, None],
               key=jax.random.PRNGKey(0), lengthscale=0.3)
    log = MetricsLogger(print_every=0)
    m.fit_svi(batch_size=16, num_steps=8,
              train_config=TrainConfig(optimizer="adam"), callback=log)
    assert len(log.history) == 8
    assert np.isfinite(log.elbo).all()


def test_assert_finite_names_offending_leaf():
    import jax.numpy as jnp

    from hetmogp_tpu.profiling import assert_finite

    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_finite(good, "params")  # no raise

    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, jnp.nan])}}
    with pytest.raises(FloatingPointError, match=r"params\['b'\]\['c'\]"):
        assert_finite(bad, "params")


def test_debug_nans_toggle():
    import jax

    from hetmogp_tpu.profiling import debug_nans

    debug_nans(True)
    assert jax.config.jax_debug_nans
    debug_nans(False)
    assert not jax.config.jax_debug_nans


def test_trace_annotation_smoke(tmp_path):
    import jax.numpy as jnp

    from hetmogp_tpu.profiling import annotate, trace

    with trace(str(tmp_path / "prof")):
        with annotate("region"):
            x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            x.block_until_ready()
    # a trace directory was produced
    assert any((tmp_path / "prof").rglob("*"))


def test_export_predictive_roundtrip():
    import jax
    import jax.numpy as jnp

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig
    from hetmogp_tpu.export import (export_predictive, load_predictive,
                                    params_args)
    from hetmogp_tpu.models import predict as predict_mod
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(Gaussian(sigma=0.5), Bernoulli()),
                      num_latent=2, num_inducing=5, input_dim=1,
                      dtype="float64")
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 5)[:, None], lengthscale=0.3)
    X_list = [rng.rand(7, 1), rng.rand(6, 1)]

    blob = export_predictive(params, cfg, X_list)
    assert isinstance(blob, bytes) and len(blob) > 100

    fn = load_predictive(blob)
    xs = [jnp.asarray(x, cfg.np_dtype) for x in X_list]
    out = fn(*params_args(params), *xs)
    m1, v1, m2, v2 = out
    em, ev = predict_mod.predictive(params, cfg, X_list)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(em[0]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(ev[1]), atol=1e-10)


def test_predictive_projected_mode():
    import jax

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig, SVMOGP

    rng = np.random.RandomState(1)
    X = [np.sort(rng.rand(25, 1), 0), np.sort(rng.rand(20, 1), 0)]
    Y = [rng.randn(25, 1), (rng.rand(20, 1) > 0.5).astype(float)]
    cfg = ModelConfig(likelihoods=(Gaussian(), Bernoulli()), num_latent=2,
                      num_inducing=5, input_dim=1, dtype="float64")
    m = SVMOGP(cfg, X, Y, np.linspace(0, 1, 5)[:, None],
               key=jax.random.PRNGKey(0), lengthscale=0.3)
    Xp = np.linspace(0, 1, 10)[:, None]
    mp_d, vp_d = m.predictive([Xp, Xp])
    mp_p, vp_p = m.predictive([Xp, Xp], projected=True)
    for arr in (*mp_p, *vp_p):
        assert np.isfinite(np.asarray(arr)).all()
    # both are valid posteriors; means should be broadly consistent
    assert np.abs(np.asarray(mp_p[1]) - np.asarray(mp_d[1])).max() < 0.5


def test_plotting_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import jax

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig, SVMOGP

    rng = np.random.RandomState(0)
    X = [np.sort(rng.rand(20, 1), 0), np.sort(rng.rand(15, 1), 0)]
    Y = [rng.randn(20, 1), (rng.rand(15, 1) > 0.5).astype(float)]
    cfg = ModelConfig(likelihoods=(Gaussian(), Bernoulli()), num_latent=2,
                      num_inducing=4, input_dim=1, dtype="float64")
    m = SVMOGP(cfg, X, Y, np.linspace(0, 1, 4)[:, None],
               key=jax.random.PRNGKey(0), lengthscale=0.3)
    ax = m.plot_u(num_points=30)
    assert len(ax.lines) >= 2
    # true-curve overlays + median input fixing (reference svmogp.py:379,405)
    ax = m.plot_u(num_points=30, true_U=np.zeros(30),
                  true_UX=np.linspace(0, 1, 30), median=True)
    assert len(ax.lines) >= 3
    ax = m.plot_f(num_points=30)
    assert len(ax.lines) >= 2  # one mean line per output function
    ax = m.plot_f(num_points=30, true_F=[np.zeros((20, 1)), np.zeros((15, 1))],
                  true_FX=X)
    assert len(ax.lines) >= 4
    Xp = np.linspace(0, 1, 25)[:, None]
    ax = m.plot_pred([Xp, Xp], task=0)
    assert len(ax.lines) >= 2


def test_plotting_2d_inputs():
    """plot_u/plot_f with input_dim=2: valid (N, 2) grids reach the predict
    paths (regression — plot_f used to pass a (N, 1) grid that the kernels
    silently broadcast into wrong covariances)."""
    import matplotlib

    matplotlib.use("Agg")
    import jax

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig, SVMOGP

    rng = np.random.RandomState(1)
    X = [rng.rand(20, 2), rng.rand(15, 2)]
    Y = [rng.randn(20, 1), (rng.rand(15, 1) > 0.5).astype(float)]
    cfg = ModelConfig(likelihoods=(Gaussian(), Bernoulli()), num_latent=2,
                      num_inducing=4, input_dim=2, dtype="float64")
    m = SVMOGP(cfg, X, Y, rng.rand(4, 2), key=jax.random.PRNGKey(0),
               lengthscale=0.3)
    for median in (False, True):
        ax = m.plot_f(num_points=10, median=median)
        assert len(ax.lines) >= 2
        ax = m.plot_u(num_points=10, median=median)
        assert len(ax.lines) >= 2


def test_export_rank2_roundtrip():
    """Regression: exporting a rank-2 coregionalization model (per-group
    hypers Q rows vs Q*R latent copies) must reconstruct params with the
    right rank inside the exported function."""
    import jax

    from hetmogp_tpu import Gaussian, ModelConfig
    from hetmogp_tpu.export import export_predictive, load_predictive, params_args
    from hetmogp_tpu.models import predict as predict_mod
    from hetmogp_tpu.models.params import init_params

    cfg = ModelConfig(likelihoods=(Gaussian(),), num_latent=2,
                      num_inducing=4, input_dim=1, dtype="float64", rank=2)
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 4)[:, None], lengthscale=0.3)
    assert params.q_mu.shape[0] == 4  # Q*R copies
    X = np.linspace(0, 1, 7)[:, None]
    blob = export_predictive(params, cfg, [X])
    fn = load_predictive(blob)
    out = fn(*params_args(params), *[jnp.asarray(X, cfg.np_dtype)])
    m_ref, v_ref = predict_mod.predictive(params, cfg, [X])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(m_ref[0]),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(v_ref[0]),
                               rtol=1e-10)


def test_checkpoint_rng_key_roundtrip(tmp_path):
    import jax

    from hetmogp_tpu import Gaussian, ModelConfig
    from hetmogp_tpu.checkpoint import load_checkpoint, save_checkpoint
    from hetmogp_tpu.models.params import init_params

    cfg = ModelConfig(likelihoods=(Gaussian(),), num_latent=2,
                      num_inducing=4, input_dim=1, dtype="float64")
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 4)[:, None])
    key = jax.random.PRNGKey(42)
    p = tmp_path / "ck"
    save_checkpoint(p, params, step=5, rng_key=key)
    _, _, step, extra = load_checkpoint(p, params)
    assert step == 5
    np.testing.assert_array_equal(extra["rng_key"], np.asarray(key))


def test_clipped_scale_logpdf_tails():
    """Regression: StudentT/HetGaussian logpdf must go DOWN (not +inf) as
    the log-scale latent goes far negative past the clip floor — the raw
    -f2 normalizer kept growing while the clipped residual froze."""
    from hetmogp_tpu.likelihoods import HetGaussian, StudentT

    for lik in (StudentT(df=5.0), HetGaussian()):
        f_mid = jnp.asarray([0.0, -30.0])
        f_deep = jnp.asarray([0.0, -300.0])
        y = jnp.asarray([1.0])
        lp_mid = float(lik.logpdf(f_mid, y))
        lp_deep = float(lik.logpdf(f_deep, y))
        assert lp_deep <= lp_mid + 1e-6, (lik, lp_mid, lp_deep)
        assert np.isfinite(lp_deep)


def test_batch_scales_with_masks():
    from hetmogp_tpu.data import batch_scales

    X_all = [np.zeros((100, 1))]
    Xb = [np.zeros((32, 1))]
    mask = [np.concatenate([np.ones(30), np.zeros(2)])]
    assert batch_scales(X_all, Xb) == [100.0 / 32.0]
    assert batch_scales(X_all, Xb, masks=mask) == [100.0 / 30.0]


def test_export_predict_f_full_cov_roundtrip():
    import jax
    import jax.numpy as jnp

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig
    from hetmogp_tpu.export import (export_predict_f,
                                    export_predict_f_projected,
                                    load_predictive, params_args)
    from hetmogp_tpu.models import predict as predict_mod
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(1)
    cfg = ModelConfig(likelihoods=(Gaussian(sigma=0.5), Bernoulli()),
                      num_latent=2, num_inducing=5, input_dim=1,
                      dtype="float64")
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 5)[:, None], lengthscale=0.3)
    X = rng.rand(7, 1)

    # full-covariance latent-f predictive
    blob = export_predict_f(params, cfg, X, output_function_ind=1,
                            full_cov=True)
    fn = load_predictive(blob)
    mu, cov = fn(*params_args(params), jnp.asarray(X, cfg.np_dtype))
    emu, ecov = predict_mod.predict_f(params, cfg, X, 1, full_cov=True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(emu), atol=1e-10)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(ecov), atol=1e-10)
    assert np.asarray(cov).shape == (7, 7)

    # projected (reference _raw_predict_f semantics) variant
    Xtr = rng.rand(9, 1)
    Xs = rng.rand(4, 1)
    blob2 = export_predict_f_projected(params, cfg, Xtr, Xs, task=0)
    fn2 = load_predictive(blob2)
    mu2, var2 = fn2(*params_args(params), jnp.asarray(Xtr, cfg.np_dtype),
                    jnp.asarray(Xs, cfg.np_dtype))
    emu2, evar2 = predict_mod.predict_f_projected_task(
        params, cfg, [Xtr, None], Xs, 0)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(emu2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var2), np.asarray(evar2),
                               atol=1e-10)


def test_plot_callback_live_figure(tmp_path):
    """The reference's verbose_plot live-ELBO callback equivalent
    (svmogp.py:208-213): accumulates history and saves/redraws every N."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    import jax

    from hetmogp_tpu import (Bernoulli, Gaussian, MinibatchStream,
                             ModelConfig, TrainConfig, plot_callback)
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(Gaussian(sigma=0.5), Bernoulli()),
                      num_latent=2, num_inducing=5, input_dim=1,
                      dtype="float64")
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 5)[:, None], lengthscale=0.3)
    X_list = [rng.rand(30, 1), rng.rand(30, 1)]
    Y_list = [rng.randn(30, 1), (rng.rand(30, 1) > 0.5).astype(float)]
    stream = MinibatchStream(X_list, Y_list, 16, dtype=cfg.np_dtype)
    out = tmp_path / "elbo.png"
    cb = plot_callback(every=5, path=str(out))
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    train_mod.svi_fit(params, cfg, tc, stream, 12, callback=cb)
    assert len(cb.history) == 12
    assert out.exists() and out.stat().st_size > 0
    line = cb.figure.axes[0].lines[0]
    assert len(line.get_xdata()) >= 11  # redrawn at iteration 10


def test_export_serving_predictive_roundtrip():
    """Serving fast-path export: load + call == make_serving_predictive."""
    import jax
    import jax.numpy as jnp

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig
    from hetmogp_tpu.export import (export_serving_predictive,
                                    load_predictive, params_args,
                                    serving_state)
    from hetmogp_tpu.models import predict as predict_mod
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(1)
    cfg = ModelConfig(likelihoods=(Gaussian(sigma=0.5), Bernoulli()),
                      num_latent=2, num_inducing=8, input_dim=1,
                      dtype="float64", jitter=1e-6, adaptive_jitter=False)
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 8)[:, None], lengthscale=0.2)
    X = rng.rand(9, 1)

    blob = export_serving_predictive(params, cfg, X, task=1)
    fn = load_predictive(blob)
    m, v = fn(*params_args(params), *serving_state(params, cfg),
              jnp.asarray(X, cfg.np_dtype))
    em, ev = predict_mod.make_serving_predictive(params, cfg, 1)(
        jnp.asarray(X, cfg.np_dtype))
    np.testing.assert_allclose(np.asarray(m), np.asarray(em), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ev), atol=1e-12)


def test_whole_model_save_load_roundtrip(tmp_path):
    """SVMOGP.save/load: config (incl. likelihood objects with tuple fields
    and rank-R) + params round-trip through one npz; the rebuilt model
    predicts identically and its config stays hashable (jit-static)."""
    import jax

    from hetmogp_tpu import ModelConfig, SVMOGP, TrainConfig
    from hetmogp_tpu import likelihoods as L

    rng = np.random.RandomState(3)
    liks = (L.Gaussian(sigma=0.35), L.Categorical(K=3),
            L.Ordinal(K=4, thresholds=(-0.5, 0.1, 0.9)))
    cfg = ModelConfig(likelihoods=liks, num_latent=2, num_inducing=8,
                      input_dim=1, dtype="float64", rank=2, jitter=1e-6,
                      adaptive_jitter=False)
    X = [np.sort(rng.rand(40, 1), 0) for _ in range(3)]
    Y = [rng.randn(40, 1), rng.randint(1, 4, (40, 1)).astype(float),
         rng.randint(1, 5, (40, 1)).astype(float)]
    m = SVMOGP(cfg, X, Y, np.linspace(0, 1, 8)[:, None],
               key=jax.random.PRNGKey(0), lengthscale=0.25)
    m._ensure_lik_theta(TrainConfig(learn_lik_params=True))
    assert m.params.lik_theta is not None  # exercises the theta leaf path

    path = tmp_path / "model"
    m.save(path)
    m2 = SVMOGP.load(path, X, Y)

    assert m2.config == m.config and hash(m2.config) == hash(m.config)
    assert m2.config.likelihoods[2].thresholds == (-0.5, 0.1, 0.9)
    for a, b in zip(jax.tree_util.tree_leaves(m.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(m2.log_likelihood(), m.log_likelihood(),
                               rtol=1e-12)
    mp, vp = m.predictive(X)
    mp2, vp2 = m2.predictive(X)
    for t in range(3):
        np.testing.assert_array_equal(np.asarray(mp[t]), np.asarray(mp2[t]))
        np.testing.assert_array_equal(np.asarray(vp[t]), np.asarray(vp2[t]))

    # a bare params checkpoint is rejected with a pointed error
    import pytest

    from hetmogp_tpu import checkpoint as ckpt

    ckpt.save_checkpoint(tmp_path / "bare", m.params)
    with pytest.raises(ValueError, match="model_config"):
        SVMOGP.load(tmp_path / "bare", X, Y)
