"""Pallas RBF kernel: interpreter-mode forward parity + VJP parity vs XLA.

conftest forces CPU, so the forward runs through the Pallas interpreter;
the same kernel compiles on TPU (exercised by bench/examples).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hetmogp_tpu.ops import kernels, pallas_kernels


def _inputs(seed=0, N=70, M=50, Q=2, Dx=2, iso=False):
    rng = np.random.RandomState(seed)
    X = jnp.asarray(rng.rand(N, Dx), jnp.float32)
    Z = jnp.asarray(rng.rand(Q, M, Dx), jnp.float32)
    ls_dim = 1 if iso else Dx
    ls = jnp.asarray(0.3 + 0.3 * rng.rand(Q, ls_dim), jnp.float32)
    var = jnp.asarray(0.5 + rng.rand(Q), jnp.float32)
    return X, Z, ls, var


@pytest.mark.parametrize("iso", [False, True], ids=["ard", "iso"])
def test_pallas_forward_matches_xla(iso):
    X, Z, ls, var = _inputs(iso=iso)
    got = pallas_kernels.rbf_K_batched_interpret(X, Z, ls, var)
    expect = kernels.K_batched("rbf", X, Z, ls, var, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-6)


def test_pallas_forward_partial_tiles():
    # N, M far from multiples of the 256 tile: padding path must be exact
    X, Z, ls, var = _inputs(N=13, M=7, Q=3, Dx=1)
    got = pallas_kernels.rbf_K_batched_interpret(X, Z, ls, var)
    expect = kernels.K_batched("rbf", X, Z, ls, var, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-6)


@pytest.mark.parametrize("iso", [False, True], ids=["ard", "iso"])
def test_pallas_vjp_matches_xla_vjp(iso):
    """The hand-written backward must equal autodiff of the XLA kernel."""
    X, Z, ls, var = _inputs(seed=1, N=40, M=30, iso=iso)
    g = jnp.asarray(np.random.RandomState(2).randn(2, 40, 30), jnp.float32)

    def xla_f(X, Z, ls, var):
        return kernels.K_batched("rbf", X, Z, ls, var, use_pallas=False)

    _, vjp_ref = jax.vjp(xla_f, X, Z, ls, var)
    ref = vjp_ref(g)

    # monkeypatch the forward to the XLA one so only the bwd formulas are
    # under test on CPU (the pallas fwd itself is covered above)
    res = (X, Z, ls, var, xla_f(X, Z, ls, var))
    got = pallas_kernels._rbf_bwd(res, g)

    names = ["dX", "dZ", "dls", "dvar"]
    for r, gt, name in zip(ref, got, names):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(r), rtol=2e-4,
                                   atol=2e-4, err_msg=name)
