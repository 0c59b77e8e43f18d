import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu import likelihoods as L
from hetmogp_tpu import train as train_mod
from hetmogp_tpu.config import ModelConfig, TrainConfig
from hetmogp_tpu.data import MinibatchStream, full_batch
from hetmogp_tpu.models.params import init_params


def _problem(n=80, M=8, Q=2, dtype="float64"):
    rng = np.random.RandomState(0)
    liks = (L.Gaussian(sigma=0.5), L.Bernoulli())
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype=dtype)
    X_list = [np.sort(rng.rand(n, 1), 0), np.sort(rng.rand(n, 1), 0)]
    Y_list = [np.sin(6 * X_list[0]) + 0.2 * rng.randn(n, 1),
              (rng.rand(n, 1) < 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.2,
                         q_mu_scale=0.5)
    return cfg, params, X_list, Y_list


def test_ve_mask_freezes_hypers_vm_freezes_variational():
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.05, ve_steps_per_vm=4)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.TrainState(params, opt.init(params), jnp.asarray(0))

    # steps 0-3 are VE: hypers/Z/W must not move, q must move
    s1, _ = step(state, data, scales)
    np.testing.assert_array_equal(np.asarray(s1.params.Z), np.asarray(params.Z))
    np.testing.assert_array_equal(np.asarray(s1.params.W), np.asarray(params.W))
    np.testing.assert_array_equal(np.asarray(s1.params.log_lengthscale),
                                  np.asarray(params.log_lengthscale))
    assert np.abs(np.asarray(s1.params.q_mu) - np.asarray(params.q_mu)).max() > 0

    # step 4 is VM: q must not move, hypers must move
    state_vm = train_mod.TrainState(params, opt.init(params), jnp.asarray(4))
    s2, _ = step(state_vm, data, scales)
    np.testing.assert_array_equal(np.asarray(s2.params.q_mu),
                                  np.asarray(params.q_mu))
    np.testing.assert_array_equal(np.asarray(s2.params.q_sqrt),
                                  np.asarray(params.q_sqrt))
    assert np.abs(np.asarray(s2.params.log_variance)
                  - np.asarray(params.log_variance)).max() > 0
    # kappa is always fixed (reference util.py:289)
    np.testing.assert_array_equal(np.asarray(s2.params.kappa),
                                  np.asarray(params.kappa))


def test_svi_fit_improves_elbo():
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.02)
    stream = MinibatchStream(X_list, Y_list, 40, shuffle=True, seed=1,
                             dtype=cfg.np_dtype)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    from hetmogp_tpu.models import elbo as elbo_mod

    e0, _ = elbo_mod.elbo_fn(params, data, jnp.asarray(scales, cfg.np_dtype), cfg)
    new_params, hist = train_mod.svi_fit(params, cfg, tc, stream, 60, vem=True)
    e1, _ = elbo_mod.elbo_fn(new_params, data,
                             jnp.asarray(scales, cfg.np_dtype), cfg)
    assert float(e1) > float(e0)
    assert len(hist) == 60 and np.isfinite(hist).all()


def test_vem_batch_lbfgs_improves_elbo():
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(vem_iters=1, batch_inner_iters=15)
    from hetmogp_tpu.models import elbo as elbo_mod

    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    e0, _ = elbo_mod.elbo_fn(params, data, scales, cfg)
    new_params, hist = train_mod.vem_algorithm(params, cfg, X_list, Y_list,
                                               train_config=tc)
    e1, _ = elbo_mod.elbo_fn(new_params, data, scales, cfg)
    assert float(e1) > float(e0)
    # VE half-step then VM half-step recorded
    assert len(hist) == 2


def test_scan_trainer_on_device():
    cfg, params, X_list, Y_list = _problem(dtype="float64")
    tc = TrainConfig(optimizer="adam", step_rate=0.02)
    new_params, hist = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=40, num_steps=50,
        key=jax.random.PRNGKey(2), steps_per_call=25)
    assert hist.shape == (50,)
    assert np.isfinite(hist).all()
    # trend improves (compare first and last 10-step means)
    assert hist[-10:].mean() > hist[:10].mean()


def test_checkpoint_roundtrip(tmp_path):
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam")
    opt = train_mod.make_optimizer(tc)
    opt_state = opt.init(params)
    from hetmogp_tpu.checkpoint import load_checkpoint, save_checkpoint

    p = tmp_path / "ck.npz"
    save_checkpoint(p, params, opt_state, step=17, extra={"note": "hi"})
    params2, opt2, step, extra = load_checkpoint(p, params, opt_state)
    assert step == 17 and extra == {"note": "hi"}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(opt2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adadelta_optimizer_improves():
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adadelta", step_rate=0.05)
    stream = MinibatchStream(X_list, Y_list, 40, dtype=cfg.np_dtype)
    new_params, hist = train_mod.svi_fit(params, cfg, tc, stream, 60, vem=True)
    assert np.isfinite(hist).all()
    # it must actually DESCEND the loss (regression test for the optax
    # sign convention: scale(+lr) silently ascends)
    assert hist[-10:].mean() > hist[:10].mean()


def test_luu_cache_matches_uncached_steps():
    """VE-step Luu caching must be a pure optimization: trajectories with
    and without the cache are identical.  (fast_projection off: the
    matmul-vs-solve roundoff is covered by the tolerance-based test below.)"""
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.03, fast_projection=False)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)

    s_cached = train_mod.init_train_state(params, cfg, opt, cache_luu=True)
    s_plain = train_mod.TrainState(params, opt.init(params), jnp.asarray(0))
    for _ in range(7):  # crosses a VM step (cycle length 5)
        s_cached, m1 = step(s_cached, data, scales)
        s_plain, m2 = step(s_plain, data, scales)
        np.testing.assert_allclose(float(m1["elbo"]), float(m2["elbo"]),
                                   rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(s_cached.params),
                    jax.tree_util.tree_leaves(s_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)


def test_fast_projection_matches_solve_path():
    """The matmul-against-cached-inverse path must match the triangular
    solve path to float64 roundoff across VE and VM steps."""
    cfg, params, X_list, Y_list = _problem()
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    tc_a = TrainConfig(optimizer="adam", step_rate=0.03, fast_projection=False)
    tc_b = TrainConfig(optimizer="adam", step_rate=0.03, fast_projection=True)
    step_a = train_mod.make_svi_step(cfg, tc_a, vem=True)
    step_b = train_mod.make_svi_step(cfg, tc_b, vem=True)
    opt = train_mod.make_optimizer(tc_a)
    sa = train_mod.init_train_state(params, cfg, opt, cache_luu=True)
    sb = train_mod.init_train_state(params, cfg, opt, cache_luu=True,
                                    fast_projection=True)
    for _ in range(7):
        sa, ma = step_a(sa, data, scales)
        sb, mb = step_b(sb, data, scales)
        np.testing.assert_allclose(float(mb["elbo"]), float(ma["elbo"]),
                                   rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-8)


def test_ve_fwd_precision_high_plumbs_and_matches():
    """ModelConfig.ve_fwd_precision="high" (the measured large-M opt-in,
    DESIGN.md §7d) must thread through the fast-projection VE path and —
    on CPU, where matmul precision tiers are exact — reproduce the
    default-tier trajectory bit-for-bit."""
    import dataclasses

    cfg, params, X_list, Y_list = _problem()
    cfg_high = dataclasses.replace(cfg, ve_fwd_precision="high")
    assert hash(cfg_high) != hash(cfg)  # distinct jit-static identity
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    tc = TrainConfig(optimizer="adam", step_rate=0.03, fast_projection=True)
    opt = train_mod.make_optimizer(tc)
    states = {}
    for name, c in (("highest", cfg), ("high", cfg_high)):
        step = train_mod.make_svi_step(c, tc, vem=True)
        s = train_mod.init_train_state(params, c, opt, cache_luu=True,
                                       fast_projection=True)
        for _ in range(5):
            s, m = step(s, data, scales)
            assert np.isfinite(float(m["elbo"]))
        states[name] = (s, float(m["elbo"]))
    assert states["high"][1] == states["highest"][1]
    for a, b in zip(jax.tree_util.tree_leaves(states["highest"][0].params),
                    jax.tree_util.tree_leaves(states["high"][0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_extensionless_path_and_opt_dtype(tmp_path):
    """save('ckpt') + load('ckpt') round-trips (np.savez appends .npz), and
    opt_state leaves are shape-validated + cast to the template dtype."""
    import pytest

    from hetmogp_tpu.checkpoint import load_checkpoint, save_checkpoint

    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam")
    opt = train_mod.make_optimizer(tc)
    opt_state = opt.init(params)

    p = tmp_path / "ckpt"  # no suffix
    save_checkpoint(p, params, opt_state, step=3)
    params2, opt2, step, _ = load_checkpoint(p, params, opt_state)
    assert step == 3
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(opt2)):
        assert np.asarray(b).dtype == np.asarray(a).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # stale checkpoint with mismatched opt_state shapes must fail loudly
    bad_tmpl = jax.tree_util.tree_map(
        lambda x: np.zeros(np.asarray(x).shape + (2,)) if np.ndim(x) else x,
        opt_state)
    leaves_differ = any(
        np.shape(a) != np.shape(b)
        for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                        jax.tree_util.tree_leaves(bad_tmpl)))
    assert leaves_differ
    with pytest.raises(ValueError, match="opt_state"):
        load_checkpoint(p, params, bad_tmpl)


def test_climin_adadelta_matches_numpy_replica():
    """The adadelta optimizer + lookahead wiring reproduces a literal climin
    loop (step1 momentum pre-step, gradient at the shifted point, gms/sms
    accumulators with offset) to 1e-12 over 100 steps."""
    import jax.numpy as jnp

    step_rate, decay, momentum, offset = 0.05, 0.9, 0.9, 1e-4
    A = np.diag([1.0, 3.0, 0.5, 10.0])
    b = np.array([1.0, -2.0, 0.5, 3.0])

    def np_grad(w):
        return A @ w - b

    # --- hand-written climin replica -------------------------------------
    w = np.array([2.0, 2.0, -1.0, 0.5])
    gms = np.zeros_like(w)
    sms = np.zeros_like(w)
    step = np.zeros_like(w)
    traj_np = []
    for _ in range(100):
        step1 = momentum * step
        w = w - step1
        g = np_grad(w)
        gms = decay * gms + (1 - decay) * g ** 2
        step2 = np.sqrt(sms + offset) / np.sqrt(gms + offset) * g * step_rate
        w = w - step2
        step = step1 + step2
        sms = decay * sms + (1 - decay) * step ** 2
        traj_np.append(w.copy())

    # --- the optax transformation + lookahead, as the SVI step wires it ---
    opt = train_mod.climin_adadelta(step_rate, decay=decay,
                                    momentum=momentum, offset=offset)
    wj = jnp.asarray([2.0, 2.0, -1.0, 0.5], jnp.float64)
    st = opt.init(wj)
    traj_j = []
    for _ in range(100):
        w_eval = train_mod.adadelta_lookahead_point(wj, st, momentum)
        g = jnp.asarray(A, jnp.float64) @ w_eval - jnp.asarray(b, jnp.float64)
        upd, st = opt.update(g, st)
        wj = wj + upd
        traj_j.append(np.asarray(wj))

    np.testing.assert_allclose(np.stack(traj_j), np.stack(traj_np),
                               rtol=0, atol=1e-12)


def test_svi_on_device_with_mesh():
    """svi_fit_on_device(mesh=...) — user-level multi-chip entry: both the
    1-D data mesh and the 2-D ('data','latent') mesh produce the same
    trajectory as the unsharded on-device run."""
    from hetmogp_tpu.parallel import sharding

    cfg, params, X_list, Y_list = _problem(dtype="float64", Q=2)
    tc = TrainConfig(optimizer="adam", step_rate=0.02)
    _, h_plain = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=40, num_steps=20,
        key=jax.random.PRNGKey(2), steps_per_call=10)
    mesh1 = sharding.data_mesh(jax.devices()[:8])
    _, h_dp = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=40, num_steps=20,
        key=jax.random.PRNGKey(2), steps_per_call=10, mesh=mesh1)
    mesh2 = sharding.model_mesh(jax.devices()[:8], latent=2)
    _, h_mp = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=40, num_steps=20,
        key=jax.random.PRNGKey(2), steps_per_call=10, mesh=mesh2)
    np.testing.assert_allclose(h_dp, h_plain, rtol=1e-10)
    np.testing.assert_allclose(h_mp, h_plain, rtol=1e-10)


def test_model_fit_svi_on_device():
    """SVMOGP.fit_svi_on_device trains and extends the ELBO history."""
    from hetmogp_tpu.models.svmogp import SVMOGP

    cfg, params, X_list, Y_list = _problem(dtype="float64")
    m = SVMOGP(cfg, X_list, Y_list, np.asarray(params.Z[0]),
               key=jax.random.PRNGKey(0))
    e0 = m.log_likelihood()
    m.fit_svi_on_device(batch_size=40, num_steps=60,
                        train_config=TrainConfig(optimizer="adam",
                                                 step_rate=0.02),
                        steps_per_call=30)
    assert len(m.elbo_history) == 60
    assert m.log_likelihood() > e0


def test_slice_sampler_uniform_wraparound():
    """minibatch='slice' draws circular (wraparound) blocks at a uniform
    offset in [0, N): every row has inclusion probability B/N, so the N/B
    ELBO scale is unbiased.  (Regressions: plain [0, N-B) offsets gave the
    final row probability ZERO; [0, N-B] still under-sampled the first and
    last B-1 rows.)"""
    from hetmogp_tpu.models import elbo as elbo_mod

    N, B = 20, 16
    td = elbo_mod.TaskData(X=jnp.arange(N, dtype=jnp.float64)[:, None],
                           Y=jnp.zeros((N, 1)), mask=jnp.ones((N,)))
    sampler = train_mod.make_batch_sampler(
        TrainConfig(minibatch="slice"), (N,), (B,))
    starts = set()
    counts = np.zeros(N)
    for i in range(400):
        (b,) = sampler(jax.random.PRNGKey(i), (td,))
        rows = np.asarray(b.X[:, 0]).astype(int)
        start = rows[0]
        starts.add(int(start))
        # the batch is exactly the circular block [start, start+B) mod N
        np.testing.assert_array_equal(rows, (start + np.arange(B)) % N)
        counts[rows] += 1
    assert starts == set(range(N)), starts
    # uniform inclusion: every row sampled with frequency ~ B/N
    freq = counts / 400.0
    assert freq.min() > 0.5 * (B / N) and freq.max() < 1.5 * (B / N), freq

    # B >= N: the whole task every step
    sampler2 = train_mod.make_batch_sampler(
        TrainConfig(minibatch="slice"), (N,), (N,))
    (b2,) = sampler2(jax.random.PRNGKey(0), (td,))
    np.testing.assert_array_equal(np.asarray(b2.X[:, 0]), np.arange(N))


def test_adadelta_lookahead_masked_under_vem():
    """Regression: under VEM the adadelta momentum-lookahead must shift
    only the current mode's free leaves — a VE-step gradient evaluated at
    momentum-shifted (frozen) hypers would be inconsistent with both the
    masked update and the Luu cache built at the real hypers."""
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adadelta", step_rate=0.1, momentum=0.9)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(params, cfg, opt, cache_luu=True)
    # run past a VM step so opt_state.step accumulates hyper components
    for _ in range(6):
        state, m = step(state, data, scales)
        assert np.isfinite(float(m["elbo"]))
    # now on a VE step (step counter 6 -> VE), the lookahead point must
    # keep hypers at their stored values
    mask = train_mod.ve_mask(state.params)
    gp = train_mod.adadelta_lookahead_point(state.params, state.opt_state,
                                            tc.momentum, mask=mask)
    np.testing.assert_array_equal(np.asarray(gp.log_lengthscale),
                                  np.asarray(state.params.log_lengthscale))
    np.testing.assert_array_equal(np.asarray(gp.Z),
                                  np.asarray(state.params.Z))
    # and the q-leaves ARE shifted (momentum carried from earlier VE steps)
    assert np.abs(np.asarray(gp.q_mu)
                  - np.asarray(state.params.q_mu)).max() > 0


def test_print_callback(capsys):
    """Reference parity: ELBO printed every 50 iterations (svmogp.py:205)."""
    cb = train_mod.print_callback(every=50)
    for i in range(120):
        cb(i, {"elbo": jnp.asarray(-float(i))})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3  # i = 0, 50, 100
    assert out[1] == "svi - iteration 50 elbo -50.000000"

def test_slice_wraparound_with_padded_dataset():
    """Regression (round-2 advice): with a PADDED dataset the wraparound
    copy must sit at index N_t — appended after the padding rows, a slice
    crossing N_t would pick mask-0 padding rows instead of the wrapped
    first rows (boundary under-sampling bias, deflated effective batch)."""
    from hetmogp_tpu.models import elbo as elbo_mod

    N, B = 10, 4
    X = np.arange(N, dtype=np.float64)[:, None]
    Y = np.zeros((N, 1))
    dataset, _ = full_batch([X], [Y], pad_multiple=8)  # padded to 16 rows
    assert int(dataset[0].X.shape[0]) == 16

    ext = train_mod.extend_for_wraparound(dataset, (B,), (N,))
    rows = np.asarray(ext[0].X[:, 0]).astype(int)
    np.testing.assert_array_equal(
        rows, np.concatenate([np.arange(N), np.arange(B)]))
    np.testing.assert_array_equal(np.asarray(ext[0].mask), np.ones(N + B))

    sampler = train_mod.make_batch_sampler(
        TrainConfig(minibatch="slice"), (N,), (B,), pre_extended=True)
    for i in range(120):
        (b,) = sampler(jax.random.PRNGKey(i), ext)
        r = np.asarray(b.X[:, 0]).astype(int)
        # exact circular block over the REAL rows; never a padding row
        np.testing.assert_array_equal(r, (r[0] + np.arange(B)) % N)
        assert float(np.asarray(b.mask).min()) == 1.0


def test_slice_scale_uses_effective_batch():
    """Regression (round-2 advice): slice mode with B_t > N_t returns the
    whole task every step, so its ELBO scale must be 1 (effective batch
    N_t) — N_t/B_t < 1 would under-weight that task's VE term vs the KL."""
    from hetmogp_tpu.models import elbo as elbo_mod

    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.0, minibatch="slice")
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    full_elbo, _ = elbo_mod.elbo_fn(params, data,
                                    jnp.asarray(scales, cfg.np_dtype), cfg)
    task_sizes = tuple(int(td.X.shape[0]) for td in data)
    batch_sizes = tuple(2 * n for n in task_sizes)  # larger than every task
    runner = train_mod.make_scan_trainer(cfg, tc, task_sizes, batch_sizes,
                                         vem=True, steps_per_call=1)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(
        jax.tree_util.tree_map(jnp.array, params), cfg, opt,
        fast_projection=tc.fast_projection)
    state, elbos = runner(state, jax.device_put(data), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(elbos[0]), float(full_elbo), rtol=1e-9)


def test_svi_on_device_zero_steps():
    """num_steps=0 returns the params unchanged and an empty history (the
    old np.concatenate([]) raised ValueError)."""
    cfg, params, X_list, Y_list = _problem(n=32)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    p2, hist = train_mod.svi_fit_on_device(params, cfg, tc, X_list, Y_list,
                                           batch_sizes=16, num_steps=0)
    assert hist.shape == (0,)
    np.testing.assert_array_equal(np.asarray(p2.q_mu), np.asarray(params.q_mu))


def test_checkpoint_rejects_reserved_extra_key(tmp_path):
    import pytest

    from hetmogp_tpu import checkpoint as ckpt

    cfg, params, _, _ = _problem(n=16)
    with pytest.raises(ValueError, match="rng_key"):
        ckpt.save_checkpoint(tmp_path / "c", params,
                             extra={"rng_key": [1, 2]})


def test_checkpoint_resume_equivalence(tmp_path):
    """VERDICT r2 #7: training N steps, checkpointing (params + opt_state +
    step + RNG key), restoring into a fresh state, and training N more must
    reproduce an uninterrupted 2N-step scan-trainer run exactly — proving
    the resume promise end-to-end (step counter drives the VE/VM phase; the
    Luu/iLuu caches are rebuilt from the restored params, which is exact
    because every VM step refreshes the cache at its updated hypers)."""
    from hetmogp_tpu import checkpoint as ckpt

    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.01, minibatch="slice")
    data, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    data = jax.device_put(data)
    ts = tuple(int(td.X.shape[0]) for td in data)
    runner = train_mod.make_scan_trainer(cfg, tc, ts, (32, 32), vem=True,
                                         steps_per_call=10)
    opt = train_mod.make_optimizer(tc)

    def fresh_state(p):
        return train_mod.init_train_state(
            jax.tree_util.tree_map(jnp.array, p), cfg, opt, cache_luu=True,
            fast_projection=tc.fast_projection)

    key = jax.random.PRNGKey(42)

    # uninterrupted 20 steps
    sA = fresh_state(params)
    kA = key
    kA, sub = jax.random.split(kA)
    sA, eA1 = runner(sA, data, sub)
    kA, sub = jax.random.split(kA)
    sA, eA2 = runner(sA, data, sub)

    # interrupted: 10 steps -> checkpoint -> restore -> 10 steps
    sB = fresh_state(params)
    kB = key
    kB, sub = jax.random.split(kB)
    sB, eB1 = runner(sB, data, sub)
    path = tmp_path / "resume"
    ckpt.save_checkpoint(path, sB.params, opt_state=sB.opt_state,
                         step=int(sB.step), rng_key=np.asarray(kB))
    np.testing.assert_array_equal(np.asarray(eB1), np.asarray(eA1))

    tmpl_state = fresh_state(params)  # templates for pytree structure
    p2, opt2, step2, extra = ckpt.load_checkpoint(
        path, tmpl_state.params, opt_state_template=tmpl_state.opt_state)
    sC = fresh_state(p2)._replace(opt_state=opt2,
                                  step=jnp.asarray(step2, sB.step.dtype))
    kC = jnp.asarray(extra["rng_key"], dtype=jnp.uint32)
    kC, sub = jax.random.split(kC)
    sC, eC2 = runner(sC, data, sub)

    np.testing.assert_allclose(np.asarray(eC2), np.asarray(eA2), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sC.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12,
                                   atol=1e-12)


def test_vm_batch_fraction_unbiased_and_runs():
    """vm_batch_fraction < 1: VM hyper grads come from a prefix sub-batch
    with mask-derived rescale.  On a deterministic full batch the fraction
    path must equal the grads of the sub-batch elbo scaled by
    full_rows/sub_rows; end-to-end the scan trainer stays finite/improving."""
    from hetmogp_tpu.models import elbo as elbo_mod

    cfg, params, X_list, Y_list = _problem()
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    tc = TrainConfig(optimizer="adam", step_rate=0.05, vm_batch_fraction=0.5)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    # step counter 4 -> VM step
    state = train_mod.init_train_state(params, cfg, opt)._replace(
        step=jnp.asarray(4))
    s2, m = step(state, data, scales)
    assert np.isfinite(float(m["elbo"]))
    # hypers moved, q frozen
    assert np.abs(np.asarray(s2.params.log_variance)
                  - np.asarray(params.log_variance)).max() > 0
    np.testing.assert_array_equal(np.asarray(s2.params.q_mu),
                                  np.asarray(params.q_mu))

    # direction check: the VM metrics elbo equals the sub-batch elbo with
    # the rescaled scales (deterministic: prefix of the full batch)
    k = [max(1, int(np.ceil(td.X.shape[0] * 0.5))) for td in data]
    sub = tuple(elbo_mod.TaskData(td.X[:kk], td.Y[:kk], td.mask[:kk])
                for td, kk in zip(data, k))
    fac = jnp.asarray([float(np.sum(td.mask)) / float(np.sum(s.mask))
                       for td, s in zip(data, sub)], cfg.np_dtype)
    e_sub, _ = elbo_mod.elbo_fn(params, sub, scales * fac, cfg)
    np.testing.assert_allclose(float(m["elbo"]), float(e_sub), rtol=1e-9)

    # end-to-end scan trainer with the knob on
    tc2 = TrainConfig(optimizer="adam", step_rate=0.01, minibatch="slice",
                      vm_batch_fraction=0.25)
    p2, hist = train_mod.svi_fit_on_device(params, cfg, tc2, X_list, Y_list,
                                           batch_sizes=32, num_steps=60,
                                           steps_per_call=30)
    assert np.isfinite(hist).all()
    assert hist[-20:].mean() > hist[:20].mean()


def test_svi_fit_on_device_prebuilt_dataset_equivalence():
    """dataset= (prepare_dataset_on_device) must reproduce the internal
    rebuild path exactly — same params, same history."""
    import jax

    from hetmogp_tpu import (Bernoulli, Gaussian, ModelConfig, TrainConfig)
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(Gaussian(), Bernoulli()), num_latent=2,
                      num_inducing=8, input_dim=1, dtype="float64")
    X_list = [rng.rand(40, 1), rng.rand(30, 1)]
    Y_list = [rng.randn(40, 1), (rng.rand(30, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 8)[:, None], lengthscale=0.2)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    kw = dict(batch_sizes=16, num_steps=12, steps_per_call=5,
              key=jax.random.PRNGKey(3))
    p1, h1 = train_mod.svi_fit_on_device(params, cfg, tc, X_list, Y_list,
                                         **kw)
    ds = train_mod.prepare_dataset_on_device(cfg, X_list, Y_list)
    p2, h2 = train_mod.svi_fit_on_device(params, cfg, tc, X_list, Y_list,
                                         dataset=ds, **kw)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_skip_nonfinite_steps_guards_state():
    """TrainConfig.skip_nonfinite_steps: a poisoned batch leaves the state
    untouched (counter still advances); a clean step then trains."""
    import jax

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig, TrainConfig
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(Gaussian(), Bernoulli()), num_latent=2,
                      num_inducing=6, input_dim=1, dtype="float64")
    X_list = [rng.rand(20, 1), rng.rand(15, 1)]
    Y_list = [rng.randn(20, 1), (rng.rand(15, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 6)[:, None], lengthscale=0.3)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    bad = tuple(d._replace(X=d.X.at[0, 0].set(np.nan)) for d in data)

    tc = TrainConfig(optimizer="adam", step_rate=0.01,
                     skip_nonfinite_steps=True)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    state0 = train_mod.init_train_state(params, cfg, opt)

    state1, m1 = step(state0, bad, scales)
    assert int(m1["skipped"]) == 1
    assert not np.isfinite(float(m1["elbo"]))
    for a, b in zip(jax.tree_util.tree_leaves(state0.params),
                    jax.tree_util.tree_leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state1.step) == 1  # schedule stays aligned

    state2, m2 = step(state1, data, scales)
    assert int(m2["skipped"]) == 0
    assert np.isfinite(float(m2["elbo"]))
    # the clean step actually updated the parameters
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                       jax.tree_util.tree_leaves(state2.params)))


def test_periodic_checkpoint_and_crash_resume(tmp_path):
    """svi_fit_on_device(checkpoint_dir=, resume=): a run killed mid-way
    (simulated by a shorter num_steps) rerun with resume=True continues the
    exact step/RNG stream — final params equal the uninterrupted run — and
    the directory keeps only the newest ``keep_last`` step_ checkpoints."""
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    key = jax.random.PRNGKey(11)
    kw = dict(batch_sizes=(16, 16), vem=True, steps_per_call=5)

    pA, hA = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, num_steps=20, key=key, **kw)

    ckdir = tmp_path / "ck"
    pB1, hB1 = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, num_steps=15, key=key,
        checkpoint_dir=ckdir, keep_last=2, **kw)  # "crash" after 15
    names = {p.name for p in ckdir.iterdir()}
    assert names == {"step_10", "step_15"}  # keep_last pruned step_5
    pB, hB = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, num_steps=20, key=key,
        checkpoint_dir=ckdir, keep_last=2, resume=True, **kw)
    # resumed call executed only the remaining 5 steps...
    assert hB.shape == (5,)
    np.testing.assert_allclose(hB, hA[15:], rtol=1e-12)
    # ...and lands on the uninterrupted run's params exactly
    for a, b in zip(jax.tree_util.tree_leaves(pA),
                    jax.tree_util.tree_leaves(pB)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12,
                                   atol=1e-12)
    # a fresh run (resume=False) into a directory with existing checkpoints
    # must refuse: rotation would delete the new run's saves while keeping
    # the stale higher-numbered ones
    import pytest

    with pytest.raises(ValueError, match="resume=True"):
        train_mod.svi_fit_on_device(
            params, cfg, tc, X_list, Y_list, num_steps=20, key=key,
            checkpoint_dir=ckdir, **kw)

    # final checkpoint written at num_steps; resume past the end is a no-op
    assert (ckdir / "step_20").is_dir()
    pC, hC = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, num_steps=20, key=key,
        checkpoint_dir=ckdir, resume=True, **kw)
    assert hC.shape == (0,)
    for a, c in zip(jax.tree_util.tree_leaves(pA),
                    jax.tree_util.tree_leaves(pC)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-12,
                                   atol=1e-12)


def test_lr_schedule_in_scan_trainer_and_resume(tmp_path):
    """TrainConfig.lr_schedule: the schedule's step count lives in the
    optimizer state, so it (a) matches a hand-built optax.adam(schedule)
    trajectory through the scan trainer and (b) survives checkpoint/resume
    (a resumed run continues the decayed rate, not the peak)."""
    import optax

    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.05,
                     lr_schedule="exponential",
                     lr_schedule_kwargs=(("transition_steps", 5),
                                         ("decay_rate", 0.5)))
    sched = train_mod.make_lr_schedule(tc)
    assert abs(sched(0) - 0.05) < 1e-12 and abs(sched(5) - 0.025) < 1e-12

    kw = dict(batch_sizes=(16, 16), vem=True, steps_per_call=5)
    key = jax.random.PRNGKey(2)
    pA, hA = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, num_steps=10, key=key, **kw)
    assert np.isfinite(hA).all() and hA.shape == (10,)

    # hand-built reference: make_optimizer's wiring must match an
    # INDEPENDENTLY constructed optax.adam(exponential_decay) update for
    # the same config (catches a mis-mapped kwarg or peak)
    opt_ref = optax.adam(optax.exponential_decay(0.05, transition_steps=5,
                                                 decay_rate=0.5))
    opt_cfg = train_mod.make_optimizer(tc)
    g = jnp.ones_like(params.q_mu)
    s_ref, s_cfg = opt_ref.init(params), opt_cfg.init(params)
    for i in range(3):
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads = grads.replace(q_mu=g)
        u_ref, s_ref = opt_ref.update(grads, s_ref, params)
        u_cfg, s_cfg = opt_cfg.update(grads, s_cfg, params)
        np.testing.assert_allclose(np.asarray(u_cfg.q_mu),
                                   np.asarray(u_ref.q_mu), rtol=1e-12)

    # resume continues the decayed rate: interrupted == uninterrupted
    ckdir = tmp_path / "ck"
    pB1, _ = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, num_steps=5, key=key,
        checkpoint_dir=ckdir, **kw)
    pB, hB = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, num_steps=10, key=key,
        checkpoint_dir=ckdir, resume=True, **kw)
    np.testing.assert_allclose(hB, hA[5:], rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(pA),
                    jax.tree_util.tree_leaves(pB)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12,
                                   atol=1e-12)

    # adadelta is the climin-parity rule: schedules are rejected
    import pytest

    with pytest.raises(ValueError, match="adadelta"):
        train_mod.make_optimizer(TrainConfig(optimizer="adadelta",
                                             lr_schedule="cosine"))
    # misspelled/unknown schedule kwargs are rejected, not silently
    # defaulted
    with pytest.raises(ValueError, match="decay_step"):
        train_mod.make_optimizer(TrainConfig(
            optimizer="adam", lr_schedule="cosine",
            lr_schedule_kwargs=(("decay_step", 500),)))
    # patience < 1 would stop after the first chunk even while improving
    cfg2, params2, X2, Y2 = _problem(n=16)
    with pytest.raises(ValueError, match="patience"):
        train_mod.svi_fit_on_device(
            params2, cfg2, TrainConfig(optimizer="adam"), X2, Y2,
            batch_sizes=(8, 8), num_steps=5, early_stop_tol=1.0,
            early_stop_patience=0)


def test_early_stop_at_chunk_granularity(tmp_path):
    """early_stop_tol: with an unreachable improvement threshold, training
    stops after (1 + patience) chunks, the history is truncated to the
    steps actually run, and a final checkpoint is written."""
    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    ckdir = tmp_path / "ck"
    p1, hist = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=(16, 16), num_steps=50,
        key=jax.random.PRNGKey(1), steps_per_call=5, vem=True,
        checkpoint_dir=ckdir, early_stop_tol=1e12, early_stop_patience=2)
    assert hist.shape == (15,)  # 1 improving chunk + 2 stale = 3 chunks
    assert (ckdir / "step_15").is_dir()
    # sane tolerance: converging problems run to num_steps
    p2, hist2 = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=(16, 16), num_steps=30,
        key=jax.random.PRNGKey(1), steps_per_call=5, vem=True,
        early_stop_tol=1e-9, early_stop_patience=3)
    assert hist2.shape == (30,)


def test_clip_grad_norm_bounds_updates():
    """TrainConfig.clip_grad_norm: updates match optax.chain(clip, adam)
    exactly; adadelta rejects the knob; training runs finite with it on."""
    import optax
    import pytest

    cfg, params, X_list, Y_list = _problem()
    tc = TrainConfig(optimizer="adam", step_rate=0.05, clip_grad_norm=1e-3)
    opt_cfg = train_mod.make_optimizer(tc)
    opt_ref = optax.chain(optax.clip_by_global_norm(1e-3), optax.adam(0.05))
    grads = jax.tree_util.tree_map(
        lambda a: 100.0 * jnp.ones_like(a), params)  # huge gradients
    s_cfg, s_ref = opt_cfg.init(params), opt_ref.init(params)
    u_cfg, _ = opt_cfg.update(grads, s_cfg, params)
    u_ref, _ = opt_ref.update(grads, s_ref, params)
    for a, b in zip(jax.tree_util.tree_leaves(u_ref),
                    jax.tree_util.tree_leaves(u_cfg)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)

    p2, hist = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=(16, 16), num_steps=10,
        key=jax.random.PRNGKey(0), steps_per_call=5)
    assert np.isfinite(hist).all()

    with pytest.raises(ValueError, match="adadelta"):
        train_mod.make_optimizer(TrainConfig(optimizer="adadelta",
                                             clip_grad_norm=1.0))


def test_ard_lengthscales_train_anisotropically():
    """config.ard=True: per-dimension lengthscales (the reference's GPy RBF
    is ARD-capable, SURVEY §2b) train end-to-end and separate in the right
    direction when the data varies fast in x1 and is flat in x2."""
    rng = np.random.RandomState(8)
    n, M, Q = 200, 12, 1
    cfg = ModelConfig(likelihoods=(L.Gaussian(sigma=0.3),), num_latent=Q,
                      num_inducing=M, input_dim=2, ard=True, dtype="float64")
    X = rng.rand(n, 2)
    Y = np.sin(8 * X[:, :1]) + 0.05 * rng.randn(n, 1)  # x2-independent
    Z = rng.rand(M, 2)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.4,
                         q_mu_scale=0.3)
    assert params.log_lengthscale.shape == (Q, 2)
    data, scales = full_batch([X], [Y], dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    tc = TrainConfig(optimizer="adam", step_rate=0.03)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(params, cfg, opt)
    e0 = None
    for _ in range(250):
        state, m = step(state, data, scales)
        e0 = float(m["elbo"]) if e0 is None else e0
    assert float(m["elbo"]) > e0
    ls = np.exp(np.asarray(state.params.log_lengthscale))[0]
    # fast-varying dim learns a (much) shorter lengthscale than the inert one
    assert ls[0] < 0.5 * ls[1], ls


def test_skip_nonfinite_steps_guards_natgrad_state():
    """skip_nonfinite_steps under natgrad_adam: a poisoned batch leaves
    params AND the carried S^{-1} untouched; a clean step then moves both
    (and keeps S^{-1} consistent with the new q_sqrt)."""
    import jax

    from hetmogp_tpu import Bernoulli, Gaussian, ModelConfig, TrainConfig
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models.params import init_params

    rng = np.random.RandomState(0)
    cfg = ModelConfig(likelihoods=(Gaussian(), Bernoulli()), num_latent=2,
                      num_inducing=6, input_dim=1, whiten=True,
                      dtype="float64")
    X_list = [rng.rand(20, 1), rng.rand(15, 1)]
    Y_list = [rng.randn(20, 1), (rng.rand(15, 1) > 0.5).astype(float)]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 6)[:, None], lengthscale=0.3)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)
    bad = tuple(d._replace(X=d.X.at[0, 0].set(np.nan)) for d in data)

    tc = TrainConfig(optimizer="natgrad_adam", step_rate=0.01,
                     natgrad_lr=0.3, skip_nonfinite_steps=True,
                     natgrad_retraction="exact")  # the S^{-1}-carrying path
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    state0 = train_mod.init_train_state(params, cfg, opt, natgrad=True)
    assert state0.S_inv is not None

    state1, m1 = step(state0, bad, scales)
    assert int(m1["skipped"]) == 1
    np.testing.assert_array_equal(np.asarray(state1.S_inv),
                                  np.asarray(state0.S_inv))
    np.testing.assert_array_equal(np.asarray(state1.params.q_mu),
                                  np.asarray(state0.params.q_mu))

    state2, m2 = step(state1, data, scales)
    assert int(m2["skipped"]) == 0
    assert np.isfinite(float(m2["elbo"]))
    assert not np.array_equal(np.asarray(state2.params.q_mu),
                              np.asarray(state1.params.q_mu))
    # carried S^{-1} tracks the updated factor: S_inv (L L^T) == I
    Lq = jnp.tril(state2.params.q_sqrt)
    prod = np.asarray(state2.S_inv) @ np.asarray(Lq @ Lq.mT)
    eye = np.eye(cfg.num_inducing)
    assert np.abs(prod - eye[None]).max() < 1e-6


def test_hbm_envelope_guard_names_the_fallback(monkeypatch):
    """prepare_dataset_on_device fails fast, naming svi_fit, when the parked
    dataset exceeds the per-device HBM envelope (round-4 verdict #7: the
    alternative is an opaque OOM mid-compile)."""
    cfg, params, X_list, Y_list = _problem(n=64)
    data, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    nbytes = sum(np.prod(np.shape(l)) * np.dtype(l.dtype).itemsize
                 for td in data for l in (td.X, td.Y, td.mask))

    # capacity unknowable (CPU test host): guard is a no-op
    train_mod.check_dataset_fits_hbm(data)

    # pretend HBM is smaller than the dataset: must raise, must say svi_fit
    monkeypatch.setenv("HETMOGP_HBM_BYTES",
                       str(int(nbytes / train_mod.DATASET_HBM_FRACTION) - 1))
    with np.testing.assert_raises_regex(ValueError, "svi_fit"):
        train_mod.check_dataset_fits_hbm(data)
    with np.testing.assert_raises_regex(ValueError, "svi_fit"):
        train_mod.prepare_dataset_on_device(cfg, X_list, Y_list)

    # a data-parallel mesh divides the per-device share: 8-way sharding of
    # the same dataset fits the same limit
    from hetmogp_tpu.parallel import sharding as _sh
    mesh = _sh.data_mesh(jax.devices()[:8])
    padded, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype, pad_multiple=8)
    train_mod.check_dataset_fits_hbm(padded, mesh=mesh)

    # just over capacity even sharded: raises again
    monkeypatch.setenv("HETMOGP_HBM_BYTES", str(int(nbytes / 16)))
    with np.testing.assert_raises_regex(ValueError, "svi_fit"):
        train_mod.check_dataset_fits_hbm(padded, mesh=mesh)
