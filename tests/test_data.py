import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.data import (MinibatchStream, batch_scales, full_batch,
                              true_f_functions, true_u_functions)


def _xy(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(n, 1), rng.randn(n, 1)


def test_batch_scales():
    X1, Y1 = _xy(100)
    X2, Y2 = _xy(60)
    s = batch_scales([X1, X2], [X1[:25], X2[:30]])
    assert s == [4.0, 2.0]


def test_sequential_mode_cycles_in_order():
    """shuffle=False reproduces the reference's no-op-shuffle behavior
    (util.py:70): batches cycle sequentially forever."""
    X, Y = _xy(10)
    st = MinibatchStream([X], [Y], 4, shuffle=False)
    rows = []
    for _ in range(3):
        (td,), scales = st.next()
        rows.append(np.asarray(td.X)[np.asarray(td.mask) == 1.0])
    np.testing.assert_array_equal(np.concatenate(rows), X)  # 4+4+2 = epoch
    # next epoch starts over at the beginning
    (td,), _ = st.next()
    np.testing.assert_array_equal(np.asarray(td.X), X[:4])


def test_partial_final_batch_is_masked_and_rescaled():
    X, Y = _xy(10)
    st = MinibatchStream([X], [Y], 4, shuffle=False)
    st.next()
    st.next()
    (td,), scales = st.next()  # final 2 rows, padded to 4
    mask = np.asarray(td.mask)
    assert mask.sum() == 2 and td.X.shape == (4, 1)
    # reference scale uses actual rows: N/n_real = 10/2
    assert scales[0] == 5.0


def test_shuffle_mode_covers_all_rows_per_epoch():
    X, Y = _xy(12, seed=1)
    st = MinibatchStream([X], [Y], 4, shuffle=True, seed=3)
    seen = []
    for _ in range(3):
        (td,), _ = st.next()
        seen.append(np.asarray(td.X))
    seen = np.sort(np.concatenate(seen), axis=0)
    np.testing.assert_array_equal(seen, np.sort(X, axis=0))


def test_pad_multiple_for_sharding():
    X, Y = _xy(10)
    st = MinibatchStream([X], [Y], 6, pad_multiple=8)
    (td,), _ = st.next()
    assert td.X.shape[0] == 8
    assert np.asarray(td.mask).sum() == 6


def test_full_batch_padding():
    X, Y = _xy(10)
    (td,), scales = full_batch([X], [Y], pad_multiple=8)
    assert td.X.shape[0] == 16
    assert np.asarray(td.mask).sum() == 10
    assert scales[0] == 1.0


def test_toy_generators_shapes():
    X_list = [np.linspace(0, 1, 30)[:, None], np.linspace(0, 1, 20)[:, None]]
    U = true_u_functions(X_list, Q=3, seed=0)
    assert U[0].shape == (30, 3) and U[1].shape == (20, 3)
    W = np.random.RandomState(0).randn(3, 4)
    F = true_f_functions(U, W, function_index=[0, 0, 1, 1], d_index=[0, 1, 0, 1])
    assert F[0].shape == (30, 2) and F[1].shape == (20, 2)
    # mixing is exact: F[t][:, j] = U[t] @ W[:, d]
    np.testing.assert_allclose(F[0][:, 0], U[0] @ W[:, 0])
    np.testing.assert_allclose(F[1][:, 1], U[1] @ W[:, 3])


def test_generate_toy_U():
    from hetmogp_tpu.data import generate_toy_U

    X = np.linspace(0, 1, 25)[:, None]
    U = generate_toy_U(X, Q=3, seed=0)
    assert U.shape == (25, 3)
    # replicate the reference arithmetic (util.py:202-206) exactly
    rng = np.random.RandomState(0)
    arg = np.tile(X, (1, 3))
    rnd = np.tile(rng.rand(1, 3), X.shape)
    expect = (2 * rnd * np.sin(10 * rnd * arg + rng.randn(1))
              + 2 * rnd * np.cos(20 * rnd * arg + rng.randn(1)))
    np.testing.assert_allclose(U, expect)


def test_init_z_kmeans():
    from hetmogp_tpu.data import init_z_kmeans

    rng = np.random.RandomState(0)
    # two well-separated clusters; centers should land near both
    X1 = rng.randn(200, 2) * 0.1
    X2 = rng.randn(150, 2) * 0.1 + 5.0
    Z = init_z_kmeans([X1, X2], num_inducing=8, seed=1)
    assert Z.shape == (8, 2)
    near_0 = (np.linalg.norm(Z, axis=1) < 1.0).sum()
    near_5 = (np.linalg.norm(Z - 5.0, axis=1) < 1.0).sum()
    assert near_0 > 0 and near_5 > 0 and near_0 + near_5 == 8


def test_minibatch_stream_1d_y():
    """1-D Y must mean one observation column (N,1), matching full_batch
    (regression: np.atleast_2d produced a (1,N) row and next() crashed)."""
    X, _ = _xy(20)
    y = np.arange(20.0)  # 1-D
    st = MinibatchStream([X], [y], 8, shuffle=False)
    (td,), scales = st.next()
    assert np.asarray(td.Y).shape == (8, 1)
    np.testing.assert_array_equal(np.asarray(td.Y)[:, 0], y[:8])
    # matches the full_batch contract on the same inputs
    (fb,), _ = full_batch([X], [y])
    assert np.asarray(fb.Y).shape == (20, 1)


def test_load_spatial_table_csv_sample():
    """The checked-in sample exercises the real-data ingestion hook
    (examples/spatial.py --data): CSV schema x1,x2,task,y -> ragged
    per-task (X, Y) lists."""
    from pathlib import Path

    from hetmogp_tpu.data import load_spatial_table

    sample = (Path(__file__).resolve().parents[1] / "examples" / "data"
              / "spatial_sample.csv")
    X_list, Y_list = load_spatial_table(sample)
    assert len(X_list) == 2
    assert X_list[0].shape == (24, 2) and Y_list[0].shape == (24, 1)
    assert X_list[1].shape == (16, 2) and Y_list[1].shape == (16, 1)
    # task 0: real-valued; task 1: integer class labels in 1..3
    assert Y_list[0].std() > 0.1
    labels = np.unique(Y_list[1])
    assert set(labels).issubset({1.0, 2.0, 3.0})
    # and the loaded data trains: one SVI step on the real schema
    import jax

    from hetmogp_tpu import (Categorical, HetGaussian, ModelConfig,
                             TrainConfig)
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.models.params import init_params

    cfg = ModelConfig(likelihoods=(HetGaussian(), Categorical(K=3)),
                      num_latent=2, num_inducing=6, input_dim=2,
                      dtype="float64")
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.random.RandomState(0).rand(6, 2),
                         lengthscale=0.3)
    data, scales = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    step = train_mod.make_svi_step(cfg, tc, vem=True)
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(params, cfg, opt)
    state, m = step(state, data, jnp.asarray(scales, cfg.np_dtype))
    assert np.isfinite(float(m["elbo"]))


def test_load_spatial_table_npz_and_errors(tmp_path):
    from hetmogp_tpu.data import load_spatial_table

    rng = np.random.RandomState(1)
    X0, Y0 = rng.rand(9, 3), rng.randn(9)
    X1, Y1 = rng.rand(5, 3), rng.rand(5, 2)  # multi-column Y
    p = tmp_path / "d.npz"
    np.savez(p, X0=X0, Y0=Y0, X1=X1, Y1=Y1)
    X_list, Y_list = load_spatial_table(p)
    np.testing.assert_allclose(X_list[0], X0)
    assert Y_list[0].shape == (9, 1)  # 1-D Y gets a column axis
    np.testing.assert_allclose(Y_list[1], Y1)

    import pytest

    np.savez(tmp_path / "bad1.npz", X0=X0, Y0=Y0, X2=X1, Y2=Y1)  # gap
    with pytest.raises(ValueError, match="contiguous"):
        load_spatial_table(tmp_path / "bad1.npz")
    np.savez(tmp_path / "bad2.npz", X0=X0)
    with pytest.raises(ValueError, match="Y0 missing"):
        load_spatial_table(tmp_path / "bad2.npz")
    (tmp_path / "bad.csv").write_text("a,b,c\n1,2,3\n")
    with pytest.raises(ValueError, match="schema"):
        load_spatial_table(tmp_path / "bad.csv")
