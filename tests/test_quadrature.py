import jax
import jax.numpy as jnp
import numpy as np

from hetmogp_tpu.ops import quadrature


def _gauss_logpdf(f, y):
    # N(y; f, 1) — GH quadrature is exact for this (quadratic in f)
    return -0.5 * jnp.log(2 * jnp.pi) - 0.5 * jnp.square(y[0] - f[0])


def test_var_exp_exact_for_gaussian():
    ve = quadrature.make_var_exp(_gauss_logpdf, J=1, T=20)
    rng = np.random.RandomState(0)
    y = rng.randn(9, 1)
    m = rng.randn(9, 1)
    v = np.abs(rng.randn(9, 1)) + 0.1
    got = np.asarray(ve(jnp.asarray(y), jnp.asarray(m), jnp.asarray(v)))
    expect = (-0.5 * np.log(2 * np.pi)
              - 0.5 * ((y - m) ** 2 + v))[:, 0]
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_var_exp_gradients_reference_form():
    """Backward pass must be E[dlogp], 0.5 E[d2logp] — for the Gaussian
    logpdf these are (y - m) and -1/2 exactly."""
    ve = quadrature.make_var_exp(_gauss_logpdf, J=1, T=20)
    rng = np.random.RandomState(1)
    y = jnp.asarray(rng.randn(5, 1))
    m = jnp.asarray(rng.randn(5, 1))
    v = jnp.asarray(np.abs(rng.randn(5, 1)) + 0.1)
    _, vjp = jax.vjp(lambda mm, vv: ve(y, mm, vv), m, v)
    dm, dv = vjp(jnp.ones(5))
    np.testing.assert_allclose(np.asarray(dm), np.asarray(y - m), atol=1e-12)
    np.testing.assert_allclose(np.asarray(dv), -0.5 * np.ones((5, 1)), atol=1e-12)


def test_tensor_grid_weights_normalized():
    for J in (1, 2, 3):
        nodes, w = quadrature.tensor_grid(5, J)
        assert nodes.shape == (5 ** J, J)
        # E[1] = 1
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
        # E[f_j] = 0, E[f_j^2] = 1/2 in node units -> with sqrt(2v) scaling, v
        np.testing.assert_allclose(nodes.T @ w, np.zeros(J), atol=1e-12)
        np.testing.assert_allclose((nodes ** 2).T @ w, 0.5 * np.ones(J), atol=1e-12)


def test_tensor_var_exp_2d_matches_product():
    """Separable 2-D logpdf: tensor quadrature == product of 1-D results."""

    def logpdf2(f, y):
        return (-0.5 * jnp.square(y[0] - f[0]) - 0.25 * jnp.square(f[1]))

    ve = quadrature.make_var_exp(logpdf2, J=2, T=10)
    rng = np.random.RandomState(2)
    y = rng.randn(4, 1)
    m = rng.randn(4, 2)
    v = np.abs(rng.randn(4, 2)) + 0.1
    got = np.asarray(ve(jnp.asarray(y), jnp.asarray(m), jnp.asarray(v)))
    expect = (-0.5 * ((y[:, 0] - m[:, 0]) ** 2 + v[:, 0])
              - 0.25 * (m[:, 1] ** 2 + v[:, 1]))
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_mc_log_predictive_converges_to_truth():
    """For Gaussian lik + Gaussian posterior the predictive is analytic."""
    key = jax.random.PRNGKey(0)
    n = 6
    rng = np.random.RandomState(3)
    y = rng.randn(n, 1)
    m = rng.randn(n, 1)
    v = np.abs(rng.randn(n, 1)) + 0.2
    S = 200_000
    got = quadrature.mc_log_predictive(
        _gauss_logpdf, key, jnp.asarray(y), jnp.asarray(m), jnp.asarray(v),
        S, reference_scaling=False)
    # true log predictive: N(y; m, 1 + v)
    expect = np.sum(-0.5 * np.log(2 * np.pi * (1 + v))
                    - 0.5 * (y - m) ** 2 / (1 + v))
    np.testing.assert_allclose(float(got), expect, rtol=2e-3)


def test_mc_nodes_moments():
    nodes, w = quadrature.mc_nodes(256, 3)
    assert nodes.shape == (256, 3) and w.shape == (256,)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
    # antithetic pairs: exact zero mean in engine units
    np.testing.assert_allclose(nodes.T @ w, 0.0, atol=1e-12)
    # engine convention E[f^2] target is 0.5 (nodes are eps/sqrt(2))
    np.testing.assert_allclose((nodes ** 2).T @ w, 0.5, atol=0.08)


def test_mc_var_exp_approximates_grid():
    """MC engine converges to the exact (quadrature) value."""

    def logpdf2(f, y):
        return -0.5 * jnp.square(y[0] - f[0]) - 0.25 * jnp.square(f[1])

    ve_grid = quadrature.make_var_exp(logpdf2, J=2, T=10)
    ve_mc = quadrature.make_var_exp(logpdf2, J=2, T=0, mc_samples=4096)
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(6, 1))
    m = jnp.asarray(rng.randn(6, 2))
    v = jnp.asarray(0.4 * rng.rand(6, 2) + 0.1)
    a = np.asarray(ve_grid(y, m, v))
    b = np.asarray(ve_mc(y, m, v))
    np.testing.assert_allclose(b, a, rtol=0.05, atol=0.05)
