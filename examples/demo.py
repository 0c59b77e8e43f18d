"""Heterogeneous multi-output GP demo — missing-gap prediction.

Reproduction of the reference's only executable example
(/root/reference/notebooks/demo.ipynb): two heterogeneous outputs
(real-valued + binary) share two latent GPs; a contiguous chunk of the
binary task's inputs is deleted, and the model reconstructs it through the
shared latent structure.

Run:  python examples/demo.py [--plot]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from hetmogp_tpu import (Bernoulli, HetGaussian, HetLikelihood, ModelConfig,
                         SVMOGP, TrainConfig)
from hetmogp_tpu.data import true_f_functions, true_u_functions
from hetmogp_tpu.models.params import random_W


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--stochastic", action="store_true",
                    help="minibatch SVI instead of batch VEM")
    args = ap.parse_args()

    # ---- toy data (demo.ipynb cells 1-5) --------------------------------
    rng = np.random.RandomState(0)
    N1, N2, Q, M = 600, 500, 2, 8
    X1 = np.sort(rng.rand(N1, 1), axis=0)
    X2 = np.sort(rng.rand(N2, 1), axis=0)

    likelihood = HetLikelihood([HetGaussian(), Bernoulli()])
    md = likelihood.generate_metadata()
    D = likelihood.num_output_functions()

    W = np.asarray(random_W(jax.random.PRNGKey(11), Q, D))
    U = true_u_functions([X1, X2], Q, seed=3)
    F = true_f_functions(U, 0.4 * W, md["function_index"], md["d_index"])
    Y = likelihood.samples(jax.random.PRNGKey(5), F)
    Y1, Y2 = np.asarray(Y[0]), np.asarray(Y[1])

    # delete a gap from the binary task (demo.ipynb cell 5: idx 351:450)
    keep = np.r_[0:351, 450:N2]
    X2g, Y2g = X2[keep], Y2[keep]

    # ---- model (demo.ipynb cells 7-8) -----------------------------------
    cfg = ModelConfig(likelihoods=tuple(likelihood.likelihoods_list),
                      num_latent=Q, num_inducing=M, input_dim=1,
                      dtype="float32")
    model = SVMOGP(cfg, [X1, X2g], [Y1, Y2g],
                   Z=np.linspace(0, 1, M)[:, None],
                   key=jax.random.PRNGKey(0), W=W, lengthscale=0.1,
                   variance=0.5)
    print(f"initial ELBO: {model.log_likelihood():.2f}")

    if args.stochastic:
        model.fit_svi(batch_size=128, num_steps=args.steps,
                      train_config=TrainConfig(optimizer="adam",
                                               step_rate=0.01))
    else:
        model.fit_vem(TrainConfig(vem_iters=3, batch_inner_iters=40),
                      verbose=True)
    print(f"final ELBO:   {model.log_likelihood():.2f}")

    # ---- prediction over the gap (demo.ipynb cells 9-10) ----------------
    Xtest = X2[351:450]
    Ytest = Y2[351:450]
    nlpd = model.negative_log_predictive([Xtest], [Ytest],
                                         num_samples=500, tasks=[1])
    print(f"NLPD over the missing gap: {nlpd:.4f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, figsize=(10, 8), sharex=True)
        Xd = np.linspace(0, 1, 300)[:, None]
        mp, vp = model.predictive([Xd, Xd])
        axes[0].plot(X1, Y1, "b+", alpha=0.3)
        axes[0].plot(Xd, mp[0], "k-")
        s = np.sqrt(np.asarray(vp[0]))
        axes[0].fill_between(Xd[:, 0], (mp[0] - 2 * s)[:, 0],
                             (mp[0] + 2 * s)[:, 0], alpha=0.2)
        axes[0].set_title("task 1: HetGaussian")
        axes[1].plot(X2g, Y2g, "b+", alpha=0.3)
        axes[1].plot(Xtest, Ytest, "r+", alpha=0.5, label="held-out gap")
        axes[1].plot(Xd, mp[1], "k-")
        axes[1].axvspan(float(X2[351, 0]), float(X2[449, 0]), alpha=0.1, color="r")
        axes[1].set_title("task 2: Bernoulli p(y=1)")
        axes[1].legend()
        fig.savefig("demo_gap.png", dpi=120)
        print("wrote demo_gap.png")


if __name__ == "__main__":
    main()
