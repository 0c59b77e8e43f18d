"""Quadrature-independent oracle for every likelihood's var_exp.

The GH engine (ops/quadrature.py) and the NumPy oracle (tests/oracle_numpy.py)
share node counts by construction, so agreement between them cannot catch a
wrong node table.  Here the expected values come from integrators that never
touch ops/quadrature:

* 1-latent likelihoods: ``scipy.integrate.quad`` (adaptive, abs tol 1e-12)
  of logpdf against the N(m, v) weight.
* multi-latent likelihoods: iterated Gauss-Hermite with
  ``np.polynomial.hermite.hermgauss`` at T=61 and T=81 (ops/quadrature only
  ever builds T=20/T=10/T=5 tables); the two resolutions must agree to 1e-9,
  which certifies convergence, and a ``scipy.integrate.dblquad`` spot check
  pins one point per 2-latent likelihood fully adaptively.

Tolerances assert the engine's T=20 (1-D) / T=10 (tensor-grid) values land
within the reference's own discretization error at tame posterior moments
(SURVEY.md §2b node counts; reference e.g. bernoulli.py:86, beta.py:106-197).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.integrate

from hetmogp_tpu import likelihoods as L

_SQRT2PI = np.sqrt(2.0 * np.pi)


def _adaptive_1d(lik, y, m, v):
    lp = jax.jit(lik.logpdf)
    m, v = float(m[0]), float(v[0])
    s = np.sqrt(v)
    ya = jnp.asarray(y, dtype=jnp.float64)

    def integrand(z):
        f = jnp.asarray([m + s * z], dtype=jnp.float64)
        return float(lp(f, ya)) * np.exp(-0.5 * z * z) / _SQRT2PI

    val, err = scipy.integrate.quad(integrand, -9.0, 9.0, epsabs=1e-12,
                                    limit=200)
    assert err < 1e-8, err
    return val


def _hermgauss_nd(lik, y, m, v, T):
    """Iterated high-order GH over dim_f dimensions (vectorized)."""
    d = len(m)
    z, w = np.polynomial.hermite.hermgauss(T)
    # physicists' weights -> N(0,1) expectation: f = m + sqrt(2 v) z
    grids = np.meshgrid(*[z] * d, indexing="ij")
    F = np.stack([m[j] + np.sqrt(2.0 * v[j]) * grids[j].ravel()
                  for j in range(d)], axis=-1)
    W = np.ones(F.shape[0])
    for j in range(d):
        W *= np.meshgrid(*[w] * d, indexing="ij")[j].ravel()
    W /= np.pi ** (d / 2.0)
    Y = np.broadcast_to(np.asarray(y, dtype=np.float64), (F.shape[0], len(y)))
    lp = jax.jit(lik.logpdf_batch)(jnp.asarray(F), jnp.asarray(Y))
    return float(np.sum(W * np.asarray(lp)))


def _expected_nd(lik, y, m, v, conv=1e-9, Ts=(61, 81)):
    a = _hermgauss_nd(lik, y, m, v, Ts[0])
    b = _hermgauss_nd(lik, y, m, v, Ts[1])
    # converged well below the assertion tolerance (heavy-tailed integrands
    # like StudentT's log1p(r^2/df) close slower than the smooth families
    # and need higher node counts)
    assert abs(a - b) < conv, (a, b)
    return b


def _check(lik, cases, tol, expected_fn):
    Y = np.asarray([c[0] for c in cases], dtype=np.float64)
    M = np.asarray([c[1] for c in cases], dtype=np.float64)
    V = np.asarray([c[2] for c in cases], dtype=np.float64)
    got = np.asarray(lik.var_exp(jnp.asarray(Y), jnp.asarray(M),
                                 jnp.asarray(V)))
    want = np.asarray([expected_fn(lik, *c) for c in cases])
    np.testing.assert_allclose(got, want, atol=tol, rtol=tol,
                               err_msg=f"{type(lik).__name__}")


def _grid_1d(ys):
    ms = [-1.2, -0.3, 0.4, 1.5]
    vs = [0.05, 0.4, 1.0]
    return [([y], [m], [v]) for y in ys for m in ms for v in vs]


def test_bernoulli_var_exp_vs_adaptive():
    _check(L.Bernoulli(), _grid_1d([0.0, 1.0]), 1e-7, _adaptive_1d)


def test_poisson_var_exp_vs_adaptive():
    _check(L.Poisson(), _grid_1d([0.0, 2.0, 5.0]), 1e-7, _adaptive_1d)


def test_exponential_var_exp_vs_adaptive():
    _check(L.Exponential(), _grid_1d([0.3, 1.0, 2.5]), 1e-7, _adaptive_1d)


def test_ordinal_var_exp_vs_adaptive():
    _check(L.Ordinal(K=3), _grid_1d([1.0, 2.0, 3.0]), 1e-7, _adaptive_1d)


def test_gaussian_analytic_var_exp_vs_adaptive():
    # sigma=1: the reference's logpdf ignores sigma (gaussian.py:32-34
    # quirk), so the integral of logpdf equals the analytic var_exp only at
    # sigma=1 — which still fully pins the analytic formula's moments
    _check(L.Gaussian(sigma=1.0), _grid_1d([-0.7, 0.8]), 1e-9, _adaptive_1d)


def _grid_2d(ys, m_range=(-0.8, 0.6), v_range=(0.05, 0.35)):
    out = []
    for y in ys:
        for m1 in m_range:
            for m2 in (-0.5, 0.3):
                for v in v_range:
                    out.append((y, [m1, m2], [v, 0.8 * v]))
    return out


def test_hetgaussian_analytic_var_exp_vs_hermgauss():
    _check(L.HetGaussian(), _grid_2d([[-0.5], [1.2]]), 1e-8, _expected_nd)


def test_studentt_var_exp_vs_hermgauss():
    # StudentT's heavy-tailed integrand converges slowest under GH: the
    # engine's own T=20 rule carries ~2e-4 discretization error at the
    # v=0.35 grid points (measured against the T=201/301-converged truth),
    # so the bound here is wider than the smooth families'.
    _check(L.StudentT(), _grid_2d([[-0.5], [1.0]]), 5e-4,
           lambda lik, y, m, v: _expected_nd(lik, y, m, v, conv=5e-7,
                                             Ts=(201, 301)))


def test_gamma_var_exp_vs_hermgauss():
    _check(L.Gamma(), _grid_2d([[0.5], [2.0]]), 2e-5, _expected_nd)


def test_beta_var_exp_vs_hermgauss():
    _check(L.Beta(), _grid_2d([[0.2], [0.7]]), 2e-5, _expected_nd)


def test_categorical_var_exp_vs_hermgauss():
    _check(L.Categorical(K=3), _grid_2d([[1.0], [2.0], [3.0]]), 2e-5,
           _expected_nd)


def test_dirichlet_var_exp_vs_hermgauss():
    lik = L.Dirichlet(K=2)
    cases = [([0.3, 0.7], [m1, m2], [v, 0.8 * v])
             for m1 in (-0.5, 0.4) for m2 in (-0.3, 0.5)
             for v in (0.05, 0.3)]
    _check(lik, cases, 2e-5, _expected_nd)


def test_dblquad_spot_checks_2d():
    """Fully-adaptive 2-D integrals (scipy.integrate.dblquad) at one point
    per 2-latent likelihood — independent of ANY fixed-node rule."""
    cases = [
        (L.HetGaussian(), [-0.5], [0.3, -0.4], [0.2, 0.15], 1e-7),
        (L.Gamma(), [1.5], [0.2, -0.3], [0.15, 0.1], 1e-5),
        (L.Beta(), [0.4], [0.1, 0.2], [0.15, 0.1], 1e-5),
        (L.Categorical(K=3), [2.0], [0.3, -0.2], [0.2, 0.15], 1e-5),
        (L.StudentT(), [0.8], [0.1, -0.2], [0.2, 0.1], 1e-5),
    ]
    for lik, y, m, v, tol in cases:
        lp = jax.jit(lik.logpdf)
        s = np.sqrt(v)
        ya = jnp.asarray(y, dtype=jnp.float64)

        def integrand(z2, z1):
            f = jnp.asarray([m[0] + s[0] * z1, m[1] + s[1] * z2],
                            dtype=jnp.float64)
            w = np.exp(-0.5 * (z1 * z1 + z2 * z2)) / (2.0 * np.pi)
            return float(lp(f, ya)) * w

        want, err = scipy.integrate.dblquad(
            integrand, -6.5, 6.5, -6.5, 6.5, epsabs=1e-9, epsrel=1e-9)
        got = float(lik.var_exp(jnp.asarray([y], dtype=jnp.float64),
                                jnp.asarray([m], dtype=jnp.float64),
                                jnp.asarray([v], dtype=jnp.float64))[0])
        assert abs(got - want) < tol, (type(lik).__name__, got, want)
