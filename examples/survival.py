"""Survival / reliability workload with the framework's duration families.

Two correlated failure signals over a 1-D covariate (normalized operating
stress), sharing Q latent GPs through the LMC mixing the reference uses for
every task pair (reference hetmogp/util.py:92-200):

  task 1  time-to-failure   Weibull(k, learn_k=True) — non-constant hazard;
                            the true shape k*=1.8 (wear-out) is NOT given to
                            the model, which starts at the Exponential k=1
                            and learns log k through the theta machinery
  task 2  incident counts   ZeroInflatedPoisson — two latent parameter
                            functions (rate + inflation), excess zeros from
                            units that are offline

The reference cannot express either observation model (Exponential is its
only duration family, reference likelihoods/exponential.py); this example
shows the extension families running through the standard SVMOGP lifecycle:
construct -> fit_svi(learn_lik_params=True) -> learned-shape readout ->
held-out NLPD.

Run:  python examples/survival.py [--steps 400]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from hetmogp_tpu import (HetLikelihood, ModelConfig, SVMOGP, TrainConfig,
                         Weibull, ZeroInflatedPoisson)
from hetmogp_tpu.data import true_f_functions, true_u_functions
from hetmogp_tpu.models.params import random_W

TRUE_K = 1.8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--n", type=int, default=800)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    Q = 2
    n = args.n
    X1 = np.sort(rng.rand(n, 1), 0)
    X2 = np.sort(rng.rand(n, 1), 0)

    # ground truth: shared smooth latents mixed into 3 output functions
    # (Weibull uses 1, ZIP uses 2: rate + inflation)
    truth = HetLikelihood([Weibull(k=TRUE_K), ZeroInflatedPoisson()])
    md = truth.generate_metadata()
    W = np.asarray(random_W(jax.random.PRNGKey(3), Q,
                            truth.num_output_functions()))
    U = true_u_functions([X1, X2], Q, seed=1)
    F = true_f_functions(U, W, md["function_index"], md["d_index"])
    Y = truth.samples(jax.random.PRNGKey(7),
                      [0.6 * np.asarray(f) for f in F])
    Y1, Y2 = np.asarray(Y[0]), np.asarray(Y[1])
    print(f"time-to-failure: median {np.median(Y1):.3f}; "
          f"counts: {np.mean(Y2 == 0):.0%} zeros, max {Y2.max():.0f}")

    # hold out the top stress quartile of the duration task
    cut = int(0.75 * n)
    cfg = ModelConfig(
        likelihoods=(Weibull(k=1.0, learn_k=True), ZeroInflatedPoisson()),
        num_latent=Q, num_inducing=16, input_dim=1, dtype="float32")
    model = SVMOGP(cfg, [X1[:cut], X2], [Y1[:cut], Y2],
                   np.linspace(0, 1, 16)[:, None],
                   key=jax.random.PRNGKey(0), lengthscale=0.2, variance=0.5)
    e0 = model.log_likelihood()
    model.fit_svi(batch_size=256, num_steps=args.steps,
                  train_config=TrainConfig(optimizer="adam", step_rate=0.02,
                                           learn_lik_params=True))
    e1 = model.log_likelihood()
    print(f"ELBO: {e0:.0f} -> {e1:.0f} over {args.steps} steps")

    k_learned = float(np.exp(np.asarray(model.params.lik_theta[0])[0]))
    print(f"Weibull shape: init 1.0, learned {k_learned:.2f}, "
          f"true {TRUE_K}")

    nlpd = model.negative_log_predictive(
        [X1[cut:]], [Y1[cut:]], num_samples=500, tasks=[0])
    print(f"held-out duration NLPD (top stress quartile): {nlpd:.3f}")

    mp, vp = model.predictive([X1, X2])
    assert all(np.isfinite(np.asarray(m)).all() for m in mp)
    assert all((np.asarray(v) >= -1e-9).all() for v in vp)
    print("predictive means/variances finite on both tasks")


if __name__ == "__main__":
    main()
