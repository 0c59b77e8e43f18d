"""Data-parallel correctness: sharded == unsharded (SURVEY.md §4 item 5).

Runs on the 8 virtual CPU devices forced by conftest.py — exercises the
same jit-partitioned psum path a real multi-chip mesh uses.
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
from hetmogp_tpu.parallel import sharding


def _problem(n_per=64, M=8, Q=2):
    rng = np.random.RandomState(0)
    liks = (L.HetGaussian(), L.Bernoulli())
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float64")
    X_list = [rng.rand(n_per, 1), rng.rand(n_per, 1)]
    Y_list = [rng.randn(n_per, 1), (rng.rand(n_per, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    return cfg, params, data, jnp.asarray(scales, cfg.np_dtype)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_elbo_matches_unsharded():
    cfg, params, data, scales = _problem()
    e_ref, aux_ref = jax.jit(
        lambda p, d, s: elbo_mod.elbo_fn(p, d, s, cfg))(params, data, scales)

    mesh = sharding.data_mesh(jax.devices()[:8])
    sharded = sharding.make_sharded_elbo(cfg, mesh)
    data_sh = sharding.shard_batch(mesh, data)
    e_sh, aux_sh = sharded(params, data_sh, scales)
    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(aux_sh["ve"]),
                               np.asarray(aux_ref["ve"]), rtol=1e-12)


def test_sharded_train_step_matches_unsharded():
    cfg, params, data, scales = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)

    # unsharded
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    s0 = train_mod.TrainState(params, opt.init(params), jnp.asarray(0))
    s1, m1 = step(s0, data, scales)

    # sharded over 8 devices
    mesh = sharding.data_mesh(jax.devices()[:8])
    sstep = sharding.make_sharded_svi_step(cfg, tc, mesh, vem=True)
    s0b = train_mod.TrainState(params, opt.init(params), jnp.asarray(0))
    data_sh = sharding.shard_batch(mesh, data)
    s2, m2 = sstep(s0b, data_sh, scales)

    np.testing.assert_allclose(float(m2["elbo"]), float(m1["elbo"]), rtol=1e-12)
    for leaf1, leaf2 in zip(jax.tree_util.tree_leaves(s1.params),
                            jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(leaf2), np.asarray(leaf1),
                                   atol=1e-12)


def test_sharded_masked_rows_are_inert():
    """Padding rows (mask 0) must not change the sharded ELBO."""
    cfg, params, data, scales = _problem(n_per=56)  # 56 + 8 pad = 64
    # pad each task to 64 rows with junk + mask 0
    padded = []
    for td in data:
        pad = 8
        X = jnp.concatenate([td.X, 999.0 * jnp.ones((pad, 1), td.X.dtype)])
        Y = jnp.concatenate([td.Y, 7.0 * jnp.ones((pad, 1), td.Y.dtype)])
        m = jnp.concatenate([td.mask, jnp.zeros((pad,), td.mask.dtype)])
        padded.append(elbo_mod.TaskData(X=X, Y=Y, mask=m))
    padded = tuple(padded)

    e_ref, _ = jax.jit(lambda p, d, s: elbo_mod.elbo_fn(p, d, s, cfg))(
        params, data, scales)
    mesh = sharding.data_mesh(jax.devices()[:8])
    e_pad, _ = sharding.make_sharded_elbo(cfg, mesh)(
        params, sharding.shard_batch(mesh, padded), scales)
    np.testing.assert_allclose(float(e_pad), float(e_ref), rtol=1e-10)


def test_sharded_scan_trainer_matches_unsharded():
    """On-device scan training over the mesh: same key -> identical batches
    (global index sampling) -> bit-comparable trajectory to the unsharded
    scan trainer."""
    from hetmogp_tpu.data import full_batch as fb

    rng = np.random.RandomState(1)
    n = 64
    liks = (L.HetGaussian(), L.Bernoulli())
    cfg = ModelConfig(likelihoods=liks, num_latent=2, num_inducing=8,
                      input_dim=1, dtype="float64")
    X_list = [rng.rand(n, 1), rng.rand(n, 1)]
    Y_list = [rng.randn(n, 1), (rng.rand(n, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 8)[:, None], lengthscale=0.3)
    tc = TrainConfig(optimizer="adam", step_rate=0.02)
    dataset, _ = fb(X_list, Y_list, dtype=cfg.np_dtype, pad_multiple=8)
    task_sizes = (n, n)
    batch_sizes = (32, 32)

    run_plain = train_mod.make_scan_trainer(cfg, tc, task_sizes, batch_sizes,
                                            vem=True, steps_per_call=12)
    opt = train_mod.make_optimizer(tc)
    # both states up-front: the runners donate their input state buffers
    params_copy = jax.tree_util.tree_map(jnp.array, params)
    s0 = train_mod.init_train_state(params, cfg, opt, cache_luu=True)
    s0b = train_mod.init_train_state(params_copy, cfg, opt, cache_luu=True)
    key = jax.random.PRNGKey(7)
    s1, e1 = run_plain(s0, jax.device_put(dataset), key)

    mesh = sharding.data_mesh(jax.devices()[:8])
    run_sh = train_mod.make_scan_trainer(cfg, tc, task_sizes, batch_sizes,
                                         vem=True, steps_per_call=12,
                                         mesh=mesh)
    dataset_sh = sharding.shard_batch(mesh, dataset)
    s2, e2 = run_sh(s0b, dataset_sh, key)

    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-10)


def test_model_parallel_2d_mesh_matches_unsharded():
    """2-D ('data','latent') mesh: Q-sharded state + N-sharded batches ==
    unsharded step (the model-parallel axis, SURVEY.md §2c)."""
    cfg, params, data, scales = _problem(M=8, Q=4)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)

    step = train_mod.make_svi_step(cfg, tc, vem=True)
    s1, m1 = step(train_mod.TrainState(params, opt.init(params),
                                       jnp.asarray(0)), data, scales)

    mesh = sharding.model_mesh(jax.devices()[:8], latent=4)  # 2 data x 4 latent
    assert mesh.shape == {"data": 2, "latent": 4}
    sstep = sharding.make_sharded_svi_step(cfg, tc, mesh, vem=True)
    s0 = sharding.shard_state(
        mesh, train_mod.TrainState(params, opt.init(params), jnp.asarray(0)))
    # state really is latent-sharded
    assert not s0.params.q_sqrt.sharding.is_fully_replicated
    s2, m2 = sstep(s0, sharding.shard_batch(mesh, data), scales)

    np.testing.assert_allclose(float(m2["elbo"]), float(m1["elbo"]), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-11)
    # the updated state keeps its latent sharding (stable scan carry)
    assert not s2.params.q_sqrt.sharding.is_fully_replicated


def test_model_parallel_scan_trainer():
    """Scan trainer over the 2-D mesh with the Luu/iLuu cache sharded on
    the latent axis: trajectory matches the unsharded scan trainer."""
    rng = np.random.RandomState(3)
    n, M, Q = 64, 8, 4
    liks = (L.HetGaussian(), L.Bernoulli())
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float64")
    X_list = [rng.rand(n, 1), rng.rand(n, 1)]
    Y_list = [rng.randn(n, 1), (rng.rand(n, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3)
    tc = TrainConfig(optimizer="adam", step_rate=0.02)
    from hetmogp_tpu.data import full_batch as fb
    dataset, _ = fb(X_list, Y_list, dtype=cfg.np_dtype, pad_multiple=8)
    opt = train_mod.make_optimizer(tc)
    params_copy = jax.tree_util.tree_map(jnp.array, params)

    run_plain = train_mod.make_scan_trainer(cfg, tc, (n, n), (32, 32),
                                            vem=True, steps_per_call=10)
    s1, e1 = run_plain(train_mod.init_train_state(params, cfg, opt,
                                                  cache_luu=True),
                       jax.device_put(dataset), jax.random.PRNGKey(5))

    mesh = sharding.model_mesh(jax.devices()[:8], latent=4)
    run_sh = train_mod.make_scan_trainer(cfg, tc, (n, n), (32, 32),
                                         vem=True, steps_per_call=10,
                                         mesh=mesh)
    s0 = sharding.shard_state(
        mesh, train_mod.init_train_state(params_copy, cfg, opt,
                                         cache_luu=True))
    assert not s0.Luu.sharding.is_fully_replicated
    s2, e2 = run_sh(s0, sharding.shard_batch(mesh, dataset),
                    jax.random.PRNGKey(5))

    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-10)


def test_model_parallel_rank2_coregionalization():
    """Rank-2 LMC over the 2-D mesh: latent copies (Q*R rows) shard over
    the latent axis, per-group hypers (Q rows) replicate when the axis
    doesn't divide them; trajectory matches unsharded."""
    rng = np.random.RandomState(4)
    n, M, Q, R = 64, 8, 2, 2  # Qe = 4 copies
    liks = (L.Gaussian(sigma=0.4), L.Bernoulli())
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float64", rank=R)
    X_list = [rng.rand(n, 1), rng.rand(n, 1)]
    Y_list = [rng.randn(n, 1), (rng.rand(n, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3)
    assert params.q_mu.shape[0] == Q * R
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)

    step = train_mod.make_svi_step(cfg, tc, vem=True)
    s1, m1 = step(train_mod.TrainState(params, opt.init(params),
                                       jnp.asarray(0)), data, scales)

    mesh = sharding.model_mesh(jax.devices()[:8], latent=4)  # divides Qe=4
    sstep = sharding.make_sharded_svi_step(cfg, tc, mesh, vem=True)
    s0 = sharding.shard_state(
        mesh, train_mod.TrainState(params, opt.init(params), jnp.asarray(0)))
    # copies sharded; per-group hypers (Q=2 rows, not divisible by 4) whole
    assert not s0.params.q_sqrt.sharding.is_fully_replicated
    assert s0.params.log_lengthscale.sharding.is_fully_replicated
    s2, m2 = sstep(s0, sharding.shard_batch(mesh, data), scales)

    np.testing.assert_allclose(float(m2["elbo"]), float(m1["elbo"]), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-11)


def test_sharded_scan_trainer_slice_mode():
    """minibatch='slice' (wraparound blocks) over the data mesh: the
    in-jit extension concatenates row-sharded arrays — must compile,
    execute, and stay finite."""
    rng = np.random.RandomState(6)
    n, M, Q = 64, 8, 2
    liks = (L.HetGaussian(), L.Bernoulli())
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float64")
    X_list = [rng.rand(n, 1), rng.rand(n, 1)]
    Y_list = [rng.randn(n, 1), (rng.rand(n, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3)
    tc = TrainConfig(optimizer="adam", step_rate=0.02, minibatch="slice")
    from hetmogp_tpu.data import full_batch as fb
    dataset, _ = fb(X_list, Y_list, dtype=cfg.np_dtype, pad_multiple=8)
    opt = train_mod.make_optimizer(tc)

    mesh = sharding.data_mesh(jax.devices()[:8])
    run = train_mod.make_scan_trainer(cfg, tc, (n, n), (32, 32), vem=True,
                                      steps_per_call=8, mesh=mesh)
    # copy before the first run: the runners donate their input state
    params2 = jax.tree_util.tree_map(jnp.array, params)
    s0 = train_mod.init_train_state(params, cfg, opt, cache_luu=True)
    s1, e1 = run(s0, sharding.shard_batch(mesh, dataset),
                 jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(e1)).all()
    # same-key unsharded trajectory agrees
    run_p = train_mod.make_scan_trainer(cfg, tc, (n, n), (32, 32), vem=True,
                                        steps_per_call=8)
    s2, e2 = run_p(train_mod.init_train_state(params2, cfg, opt,
                                              cache_luu=True),
                   jax.device_put(dataset), jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-10)

def test_state_shardings_nondivisible_latent_replicates():
    """Regression (round-2 advice): a latent axis that does not divide the
    Q-leading dim must fall back to replication for ALL state leaves
    (cached Luu/iLuu, optimizer moments) — not just the params — instead of
    failing at device_put/jit."""
    rng = np.random.RandomState(0)
    n, M, Q = 32, 8, 3  # latent axis 2 does not divide Q=3
    liks = (L.Gaussian(sigma=0.4), L.Bernoulli())
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float64")
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(params, cfg, opt, cache_luu=True)
    mesh = sharding.model_mesh(jax.devices()[:8], latent=2)
    s0 = sharding.shard_state(mesh, state)  # raised before the guard
    # the cached Luu (Q-leading, non-divisible) must be replicated
    assert s0.Luu.sharding.is_fully_replicated
    X_list = [rng.rand(n, 1), rng.rand(n, 1)]
    Y_list = [rng.randn(n, 1), (rng.rand(n, 1) > 0.5).astype(float)]
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    data = sharding.shard_batch(mesh, data)
    step = sharding.make_sharded_svi_step(cfg, tc, mesh, vem=True)
    s1, m1 = step(s0, data, jnp.asarray(scales, cfg.np_dtype))
    assert np.isfinite(float(m1["elbo"]))


def test_sharded_predictive_matches_unsharded():
    """Serving path: predictive_sharded over a 1-D data mesh == the plain
    predictive, including a row count NOT divisible by the mesh (pad +
    unpad) — SURVEY.md §5 serving row."""
    from hetmogp_tpu.models import predict as predict_mod

    cfg, params, _, _ = _problem()
    rng = np.random.RandomState(7)
    X_list = [rng.rand(101, 1), rng.rand(64, 1)]  # 101 % 8 != 0
    m_ref, v_ref = predict_mod.predictive(params, cfg, X_list)

    mesh = sharding.data_mesh(jax.devices()[:8])
    m_sh, v_sh = predict_mod.predictive_sharded(params, cfg, X_list, mesh)
    for t in range(cfg.num_tasks):
        assert m_sh[t].shape == m_ref[t].shape
        np.testing.assert_allclose(np.asarray(m_sh[t]), np.asarray(m_ref[t]),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(v_sh[t]), np.asarray(v_ref[t]),
                                   rtol=1e-12, atol=1e-14)
        # outputs really are row-sharded before the unpad slice
        assert np.all(np.asarray(v_sh[t]) >= 0)


def test_sharded_predictive_2d_mesh_latent_params():
    """predictive_sharded on a 2-D ('data','latent') mesh with the params
    placed on the latent axis: same values, q-contractions ride psum."""
    from hetmogp_tpu.models import predict as predict_mod

    cfg, params, _, _ = _problem(M=8, Q=4)
    rng = np.random.RandomState(9)
    X_list = [rng.rand(48, 1), rng.rand(37, 1)]
    m_ref, v_ref = predict_mod.predictive(params, cfg, X_list)

    mesh = sharding.model_mesh(jax.devices()[:8], latent=4)
    placed = jax.tree_util.tree_map(
        jax.device_put, params, sharding.param_shardings(mesh, params))
    assert not placed.q_mu.sharding.is_fully_replicated
    m_sh, v_sh = predict_mod.predictive_sharded(placed, cfg, X_list, mesh)
    for t in range(cfg.num_tasks):
        np.testing.assert_allclose(np.asarray(m_sh[t]), np.asarray(m_ref[t]),
                                   rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(v_sh[t]), np.asarray(v_ref[t]),
                                   rtol=1e-11, atol=1e-13)


def test_svmogp_predictive_mesh_entry():
    """SVMOGP.predictive(mesh=...) routes through the sharded path and
    rejects the projected path."""
    import pytest

    from hetmogp_tpu import SVMOGP
    from hetmogp_tpu import likelihoods as L_

    rng = np.random.RandomState(1)
    cfg = ModelConfig(likelihoods=(L_.HetGaussian(), L_.Bernoulli()),
                      num_latent=2, num_inducing=8, input_dim=1,
                      dtype="float64")
    X = [rng.rand(40, 1), rng.rand(40, 1)]
    Y = [rng.randn(40, 1), (rng.rand(40, 1) > 0.5).astype(float)]
    m = SVMOGP(cfg, X, Y, np.linspace(0, 1, 8)[:, None],
               key=jax.random.PRNGKey(0), lengthscale=0.3)
    mesh = sharding.data_mesh(jax.devices()[:8])
    Xp = [rng.rand(21, 1), rng.rand(16, 1)]
    m_ref, v_ref = m.predictive(Xp)
    m_sh, v_sh = m.predictive(Xp, mesh=mesh)
    for t in range(2):
        np.testing.assert_allclose(np.asarray(m_sh[t]), np.asarray(m_ref[t]),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(v_sh[t]), np.asarray(v_ref[t]),
                                   rtol=1e-12)
    with pytest.raises(ValueError):
        m.predictive(Xp, projected=True, mesh=mesh)


def test_sharded_checkpoint_resume_on_2d_mesh(tmp_path):
    """Orbax sharded checkpointing: training N sharded steps on a 2-D
    ('data','latent') mesh, saving the sharded state, restoring with
    ``mesh=`` (leaves land DIRECTLY at their latent-axis shardings) and
    training N more must equal an uninterrupted 2N-step sharded run — the
    multi-chip version of test_train.test_checkpoint_resume_equivalence."""
    from hetmogp_tpu import checkpoint as ckpt

    cfg, params, data, scales = _problem(n_per=32, M=8, Q=4)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)
    mesh = sharding.model_mesh(jax.devices()[:8], latent=2)
    step = sharding.make_sharded_svi_step(cfg, tc, mesh, vem=True)
    data_sh = sharding.shard_batch(mesh, data)

    def fresh(p):
        st = train_mod.init_train_state(
            jax.tree_util.tree_map(jnp.asarray, p), cfg, opt)
        return sharding.shard_state(mesh, st)

    # uninterrupted: 4 sharded steps
    sA = fresh(params)
    for _ in range(4):
        sA, mA = step(sA, data_sh, scales)

    # interrupted at 2 -> orbax save -> restore on the mesh -> 2 more
    sB = fresh(params)
    for _ in range(2):
        sB, mB = step(sB, data_sh, scales)
    path = tmp_path / "orbax_ckpt"
    ckpt.save_checkpoint_sharded(path, sB.params, opt_state=sB.opt_state,
                                 step=int(sB.step), extra={"note": "r3"},
                                 rng_key=np.asarray(jax.random.PRNGKey(3)))

    tmpl = fresh(params)
    p2, opt2, step2, extra = ckpt.load_checkpoint_sharded(
        path, tmpl.params, opt_state_template=tmpl.opt_state, mesh=mesh)
    assert extra["note"] == "r3"
    np.testing.assert_array_equal(extra["rng_key"],
                                  np.asarray(jax.random.PRNGKey(3)))
    # restored leaves carry the latent-axis sharding, not a host copy
    assert not p2.q_mu.sharding.is_fully_replicated
    assert p2.q_mu.sharding.spec == tmpl.params.q_mu.sharding.spec
    sC = train_mod.init_train_state(p2, cfg, opt)._replace(
        opt_state=opt2, step=jnp.asarray(step2, sB.step.dtype))
    sC = sharding.shard_state(mesh, sC)
    for _ in range(2):
        sC, mC = step(sC, data_sh, scales)

    np.testing.assert_allclose(float(mC["elbo"]), float(mA["elbo"]),
                               rtol=1e-12)
    for a, c in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sC.params)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-12,
                                   atol=1e-12)


def test_sharded_checkpoint_roundtrip_no_mesh(tmp_path):
    """load_checkpoint_sharded without a mesh restores to the default
    device; structure errors (missing/extra opt_state template) raise."""
    import pytest

    from hetmogp_tpu import checkpoint as ckpt

    cfg, params, _, _ = _problem(n_per=16)
    path = tmp_path / "orbax_plain"
    ckpt.save_checkpoint_sharded(path, params, step=5)
    p2, opt2, step2, extra = ckpt.load_checkpoint_sharded(path, params)
    assert opt2 is None and step2 == 5 and extra == {}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="no opt_state"):
        ckpt.load_checkpoint_sharded(path, params,
                                     opt_state_template={"m": params})
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)
    ckpt.save_checkpoint_sharded(path, params, opt_state=opt.init(params))
    with pytest.raises(ValueError, match="opt_state_template"):
        ckpt.load_checkpoint_sharded(path, params)
    with pytest.raises(ValueError, match="rng_key"):
        ckpt.save_checkpoint_sharded(path, params, extra={"rng_key": [1]})


def test_sharded_checkpoint_overwrite_is_crash_safe(tmp_path):
    """Fixed-path overwrite goes through a sibling .tmp + swap: after a
    save, no .tmp/.old leftovers remain and the content is the NEW state;
    leftover .tmp/.old dirs from a simulated crash are reclaimed by the
    next save rather than breaking it."""
    from hetmogp_tpu import checkpoint as ckpt

    cfg, params, _, _ = _problem(n_per=16)
    path = tmp_path / "orbax_fixed"
    ckpt.save_checkpoint_sharded(path, params, step=1)
    bumped = params.replace(q_mu=params.q_mu + 1.0)
    # simulated crash leftovers around the live checkpoint
    (tmp_path / "orbax_fixed.tmp").mkdir()
    (tmp_path / "orbax_fixed.old").mkdir()
    ckpt.save_checkpoint_sharded(path, bumped, step=2)
    assert not (tmp_path / "orbax_fixed.tmp").exists()
    assert not (tmp_path / "orbax_fixed.old").exists()
    p2, _, step2, _ = ckpt.load_checkpoint_sharded(path, params)
    assert step2 == 2
    np.testing.assert_array_equal(np.asarray(p2.q_mu),
                                  np.asarray(bumped.q_mu))


def test_fused_rows_on_2d_mesh_matches_unsharded():
    """config.fuse_task_rows under a 2-D ('data','latent') mesh: the
    concatenation of data-sharded per-task batches stays row-sharded and
    the fused projection partitions like the per-task one — sharded step
    == unsharded fused step == unsharded per-task step."""
    import dataclasses

    cfg, params, data, scales = _problem(M=8, Q=4)
    cfgP = dataclasses.replace(cfg, fuse_task_rows=False)
    cfgF = dataclasses.replace(cfg, fuse_task_rows=True)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)

    # fast-projection states (cached Luu + iLuu): the fused-rows path is
    # gated on the cached inverse being present, so plain states would
    # silently compare per-task to per-task
    ref_step = train_mod.make_svi_step(cfgP, tc, vem=True)
    s1, m1 = ref_step(train_mod.init_train_state(
        params, cfgP, opt, cache_luu=True, fast_projection=True),
        data, scales)

    mesh = sharding.model_mesh(jax.devices()[:8], latent=2)
    sstep = sharding.make_sharded_svi_step(cfgF, tc, mesh, vem=True)
    s0 = sharding.shard_state(
        mesh, train_mod.init_train_state(params, cfgF, opt, cache_luu=True,
                                         fast_projection=True))
    s2, m2 = sstep(s0, sharding.shard_batch(mesh, data), scales)

    np.testing.assert_allclose(float(m2["elbo"]), float(m1["elbo"]),
                               rtol=1e-11)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-10)
    assert not s2.params.q_sqrt.sharding.is_fully_replicated


def test_scan_body_collective_structure():
    """Communication-structure regression (round-3 verdict weak #5): the
    sharded scan step's PER-STEP collectives must stay scalar/batch-sized.
    A refactor that silently all-gathers the (Q, M, M) variational state
    (or Luu/iLuu caches) on the data axis would pass the value-equality
    tests — real-pod ICI traffic is invisible on a virtual mesh — so this
    asserts on the compiled HLO itself via hlo_cost.scan_body_collectives.
    One-time dataset distribution outside the scan body is exempt (it
    amortizes over steps_per_call)."""
    from hetmogp_tpu import hlo_cost

    rng = np.random.RandomState(0)
    liks = (L.HetGaussian(), L.Bernoulli(), L.Gamma())
    T, N_per, M, Q, B = 3, 256, 64, 2, 32
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float32", jitter=1e-4,
                      adaptive_jitter=False)
    tc = TrainConfig(optimizer="adam", step_rate=0.005, minibatch="slice",
                     vm_batch_fraction=0.25)
    X_list = [rng.rand(N_per, 1).astype(np.float32) for _ in range(T)]
    Y_list = [rng.randn(N_per, 1), (rng.rand(N_per, 1) > .5).astype(float),
              rng.gamma(2., 1., (N_per, 1)) + 1e-3]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None].astype(np.float32),
                         lengthscale=0.2, variance=0.5, q_mu_scale=0.1)
    mesh = sharding.data_mesh(jax.devices()[:8])
    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    runner = train_mod.make_scan_trainer(
        cfg, tc, tuple([N_per] * T), tuple([B] * T), vem=True,
        steps_per_call=5, mesh=mesh)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(params, cfg, opt, cache_luu=True,
                                       fast_projection=True)
    ds = sharding.shard_batch(mesh, dataset)
    state = sharding.shard_state(mesh, state)
    txt = runner.lower(state, ds, jax.random.PRNGKey(1)).compile().as_text()

    body = hlo_cost.scan_body_collectives(txt)
    assert body, "no collectives found in the scan body — parse failure?"
    # the data-summed VE/grad reductions must be present as all-reduces —
    # including the unavoidable (Q, M, M) gradient psum of the replicated
    # variational state (that reduction IS data parallelism's cost model)
    assert any(kind == "all-reduce" for kind, _ in body)
    assert any(kind == "all-reduce" and e >= Q * M * M for kind, e in body)
    # but nothing (Q, M, M)-sized may be GATHERED per step: batch-row
    # gathers are B-sized and everything else scalar, so any gather-class
    # collective at >= M*M elements means replicated state is being
    # round-tripped on the data axis (M*M = 4096 here vs the largest
    # legitimate gather of ~B*T elements)
    limit = M * M
    gather_kinds = ("all-gather", "all-to-all", "collective-permute")
    offenders = [(k, e) for k, e in body if k in gather_kinds and e >= limit]
    assert not offenders, (
        f"per-step gather-class collectives moving >= M*M={limit} elements: "
        f"{offenders} — (Q, M, M)-sized state is being gathered on the "
        "data axis")


def test_sharded_predictive_splits_compute_eight_ways():
    """Serving-scaling evidence on the virtual mesh (round-3 verdict #9):
    real-chip speedup cannot be measured on virtual CPU devices (they
    share one host's cores), but the property that PRODUCES near-linear
    scaling can — XLA cost_analysis of an SPMD executable reports
    PER-DEVICE flops, so the 8-device sharded predictive must cost ~1/8
    of the single-device program per device, with no row-sized
    collectives (the computation is row-independent on a 1-D mesh)."""
    from hetmogp_tpu import hlo_cost

    cfg, params, _, _ = _problem(M=16, Q=2)
    Ns = 1024
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(Ns, 1), cfg.np_dtype)

    def flops_of(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))

    mesh1 = sharding.data_mesh(jax.devices()[:1])
    mesh8 = sharding.data_mesh(jax.devices()[:8])
    f1 = sharding.make_sharded_predictive_task(cfg, mesh1, 0)
    f8 = sharding.make_sharded_predictive_task(cfg, mesh8, 0)
    c1 = f1.lower(params, X).compile()
    c8 = f8.lower(params, X).compile()
    fl1, fl8 = flops_of(c1), flops_of(c8)
    assert fl1 > 0 and fl8 > 0
    # per-device compute splits ~8x (some per-device fixed work remains:
    # the (Q, M, M) prior Cholesky is replicated)
    assert fl8 < fl1 / 8 * 1.6, (fl1, fl8)
    # no gather-class collectives moving row-sized operands: serving rows
    # never leave their device
    comps = hlo_cost._parse_module(c8.as_text())
    colls = [c for comp in comps.values() for c in comp.colls]
    big = [(k, e) for k, e in colls if e >= Ns // 8]
    assert not big, f"row-sized collectives in the sharded predictive: {big}"
    # and the values match the unsharded path
    m8, v8 = f8(params, X)
    m1, v1 = f1(params, X)
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v8), np.asarray(v1), rtol=1e-10)


def test_sharded_natgrad_scan_trainer_matches_unsharded():
    """The round-4 natgrad state (carried S^{-1} in TrainState) through
    the sharded scan trainer: 8-device 1-D mesh trajectory == unsharded,
    and on a 2-D ('data','latent') mesh the carried S^{-1} stays
    latent-sharded across steps."""
    rng = np.random.RandomState(11)
    n, M, Q = 64, 8, 4
    liks = (L.HetGaussian(), L.Bernoulli())
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, whiten=True, dtype="float64")
    X_list = [rng.rand(n, 1), rng.rand(n, 1)]
    Y_list = [rng.randn(n, 1), (rng.rand(n, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.3)
    tc = TrainConfig(optimizer="natgrad_adam", step_rate=0.02,
                     natgrad_lr=0.3,
                     natgrad_retraction="exact")  # the S^{-1}-carrying path
    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype,
                            pad_multiple=8)
    opt = train_mod.make_optimizer(tc)
    # the runners donate their input states: give each its own copy
    params_copy = jax.tree_util.tree_map(jnp.array, params)
    params_copy2 = jax.tree_util.tree_map(jnp.array, params)

    run_plain = train_mod.make_scan_trainer(cfg, tc, (n, n), (32, 32),
                                            vem=True, steps_per_call=10)
    s0 = train_mod.init_train_state(params, cfg, opt, natgrad=True)
    s1, e1 = run_plain(s0, jax.device_put(dataset), jax.random.PRNGKey(7))

    mesh = sharding.data_mesh(jax.devices()[:8])
    run_sh = train_mod.make_scan_trainer(cfg, tc, (n, n), (32, 32),
                                         vem=True, steps_per_call=10,
                                         mesh=mesh)
    s0b = train_mod.init_train_state(params_copy, cfg, opt, natgrad=True)
    s2, e2 = run_sh(s0b, sharding.shard_batch(mesh, dataset),
                    jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-9)

    # 2-D mesh: S_inv (Q-leading) shards on the latent axis and stays
    # sharded through the scan carry
    mesh2 = sharding.model_mesh(jax.devices()[:8], latent=4)
    run_mp = train_mod.make_scan_trainer(cfg, tc, (n, n), (32, 32),
                                         vem=True, steps_per_call=10,
                                         mesh=mesh2)
    s0c = sharding.shard_state(
        mesh2, train_mod.init_train_state(params_copy2, cfg, opt,
                                          natgrad=True))
    assert not s0c.S_inv.sharding.is_fully_replicated
    s3, e3 = run_mp(s0c, sharding.shard_batch(mesh2, dataset),
                    jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(e3), np.asarray(e1), rtol=1e-9)
    assert not s3.S_inv.sharding.is_fully_replicated


def test_latent_axis_splits_m_cubed_work():
    """The M-cliff lever (round-5 §7m): the O(Q M^3) refresh, the
    (Q, M, M) optimizer moments, and the VE (Q, M, M) cotangents are all
    Q-leading, so on a 2-D ('data','latent') mesh they shard over the
    latent axis.  Virtual-mesh evidence (real-chip speedup is
    unmeasurable on CPU devices): per-device flops of the compiled
    sharded train step at latent=4 must be well under the 1-device
    program's — cost_analysis reports PER-DEVICE flops for SPMD
    executables.  Trajectory parity is covered by the existing
    model-parallel tests; this pins the compute *placement*."""
    cfg, params, data, scales = _problem(M=64, Q=4)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)

    def flops_of(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))

    mesh1 = sharding.data_mesh(jax.devices()[:1])
    step1 = sharding.make_sharded_svi_step(cfg, tc, mesh1, vem=True)
    s1 = sharding.shard_state(
        mesh1, train_mod.TrainState(params, opt.init(params),
                                    jnp.asarray(0)))
    d1 = sharding.shard_batch(mesh1, data)
    c1 = step1.lower(s1, d1, scales).compile()

    mesh4 = sharding.model_mesh(jax.devices()[:4], latent=4)  # 1 data x 4
    step4 = sharding.make_sharded_svi_step(cfg, tc, mesh4, vem=True)
    s4 = sharding.shard_state(
        mesh4, train_mod.TrainState(params, opt.init(params),
                                    jnp.asarray(0)))
    d4 = sharding.shard_batch(mesh4, data)
    c4 = step4.lower(s4, d4, scales).compile()

    fl1, fl4 = flops_of(c1), flops_of(c4)
    assert fl1 > 0 and fl4 > 0
    # per-q work (the whole O(Q M^3)/O(Q B M^2) spine at Q=4) splits 4x;
    # allow generous slack for the replicated likelihood/mixing remainder
    assert fl4 < fl1 / 4 * 1.8, (fl1, fl4)
