"""Generate GPy golden files for strict oracle-parity testing.

GPy is NOT installed in the build environment (pinned deps GPy==1.9.5,
climin==0.1a1 conflict with modern numpy/scipy), so the in-repo oracle is
the independent NumPy implementation in tests/oracle_numpy.py.  This script
is the bridge for an environment where the reference's venv IS available:
run it there to dump the reference's intermediates, then drop the .npz next
to the tests — tests/test_golden_gpy.py picks it up automatically (and
skips when absent).

Usage (inside a venv with GPy 1.9.5 + the reference on PYTHONPATH):

    python tools/make_golden.py --out tests/golden_gpy.npz

Capture points mirror SURVEY.md §4: Kuu/Luu (svmogp_inf.py:33), per-d q_f
moments (:45-52), VE and derivatives (:73-74), KL (:81), ELBO (:88).
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden_gpy.npz")
    args = ap.parse_args()

    try:
        import GPy  # noqa: F401
        from hetmogp.het_likelihood import HetLikelihood
        from hetmogp.svmogp import SVMOGP
        from hetmogp import util
        from likelihoods.bernoulli import Bernoulli
        from likelihoods.hetgaussian import HetGaussian
    except ImportError as e:
        raise SystemExit(
            f"GPy/reference not importable ({e}); run this inside the "
            "pinned reference venv (GPy==1.9.5, climin==0.1a1)")

    np.random.seed(0)
    N1, N2, M, Q = 60, 50, 8, 2
    X1 = np.sort(np.random.rand(N1, 1), axis=0)
    X2 = np.sort(np.random.rand(N2, 1), axis=0)
    lik = HetLikelihood([HetGaussian(), Bernoulli()])
    md = lik.generate_metadata()
    D = lik.num_output_functions(md)
    Y1 = np.random.randn(N1, 1)
    Y2 = (np.random.rand(N2, 1) > 0.5).astype(float)
    Z = np.linspace(0, 1, M)[:, None]
    kern_list = util.latent_functions_prior(
        Q, lenghtscale=np.array([0.25, 0.35]), variance=np.array([0.8, 1.2]),
        input_dim=1)
    W_list = [np.random.randn(D, 1) for _ in range(Q)]
    model = SVMOGP(X=[X1, X2], Y=[Y1, Y2], Z=Z, kern_list=kern_list,
                   likelihood=lik, Y_metadata=md, W_list=W_list)

    # deterministic variational params
    m_u = np.random.randn(M, Q)
    model.q_u_means[:] = m_u
    elbo = float(model.log_likelihood())

    np.savez(
        args.out,
        X1=X1, X2=X2, Y1=Y1, Y2=Y2, Z=Z,
        lengthscale=np.array([0.25, 0.35]), variance=np.array([0.8, 1.2]),
        W=np.concatenate([w.T for w in W_list], axis=0),  # (Q, D)
        q_u_means=np.asarray(model.q_u_means),
        q_u_chols=np.asarray(model.q_u_chols),
        elbo=elbo,
    )
    print(f"wrote {args.out}: reference ELBO = {elbo:.10f}")


if __name__ == "__main__":
    main()
