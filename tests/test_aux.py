"""Auxiliary subsystems: metrics logging, profiling/debug utilities."""

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
