"""Spatial heterogeneous model (BASELINE config 3 shape).

2-D spatial inputs; output 1 is a heteroscedastic Gaussian (e.g. log-price)
and output 2 a 3-way categorical (e.g. property type), sharing Q latent
spatial GPs.  By default data is synthetic with known latent structure
(N ~ 50k, M = 256); pass ``--data FILE`` to run the SAME model on a real
dataset instead — e.g. the reference's London house-prices workload
(reference README.md:54-57, dataset not shipped there either) the moment a
file exists.  Accepted schemas (hetmogp_tpu.data.load_spatial_table):

  CSV   header x1,x2,task,y — task 0 rows are the real-valued output
        (log-price), task 1 rows the categorical label (1..K)
  NPZ   per-task arrays X0,Y0,X1,Y1

A tiny checked-in sample exercises the path end-to-end:
  python examples/spatial.py --data examples/data/spatial_sample.csv

Run:  python examples/spatial.py [--steps 500] [--data FILE]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from hetmogp_tpu import (Categorical, HetGaussian, HetLikelihood, ModelConfig,
                         TrainConfig)
from hetmogp_tpu import train as train_mod
from hetmogp_tpu.models.params import init_params, random_W


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--data", type=str, default=None,
                    help="real dataset (CSV: x1,x2,task,y / NPZ: X0,Y0,X1,"
                         "Y1) — see hetmogp_tpu.data.load_spatial_table")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    Q, Dx = 3, 2

    if args.data is not None:
        from hetmogp_tpu.data import load_spatial_table

        X_list, Y_list = load_spatial_table(args.data)
        if len(X_list) != 2 or X_list[0].shape[1] != Dx:
            raise SystemExit(
                f"--data expects 2 tasks with {Dx}-D inputs (HetGaussian + "
                f"Categorical); got {len(X_list)} tasks, "
                f"Dx={X_list[0].shape[1]}")
        K = int(Y_list[1].max())
        het = HetLikelihood([HetGaussian(), Categorical(K=max(K, 2))])
        X1, X2 = X_list
        Y1, Y2 = Y_list
        # standardize the real-valued output (log-price scale varies)
        Y1 = (Y1 - Y1.mean()) / max(Y1.std(), 1e-9)
        n_real = len(X1) + len(X2)
        print(f"loaded {args.data}: task sizes {len(X1)}/{len(X2)}, "
              f"K={max(K, 2)}")
        args.m = min(args.m, max(8, n_real // 4))
        W = None
    else:
        het = HetLikelihood([HetGaussian(), Categorical(K=3)])
        D = het.num_output_functions()

        # synthetic spatial latents: smooth random Fourier features
        def latent(X, seed):
            r = np.random.RandomState(seed)
            w = r.randn(8, Dx) * 3.0
            a = r.randn(8)
            return np.cos(X @ w.T + r.rand(8) * 2 * np.pi) @ a / np.sqrt(8)

        n_per = args.n // 2
        X1 = rng.rand(n_per, Dx)
        X2 = rng.rand(n_per, Dx)
        W = np.asarray(random_W(jax.random.PRNGKey(2), Q, D))
        U1 = np.stack([latent(X1, q) for q in range(Q)], axis=1)
        U2 = np.stack([latent(X2, q) for q in range(Q)], axis=1)
        F1 = U1 @ W[:, 0:2]
        F2 = U2 @ W[:, 2:4]
        Y = het.samples(jax.random.PRNGKey(3), [F1, F2])
        Y1, Y2 = np.asarray(Y[0]), np.asarray(Y[1])

    cfg = ModelConfig(likelihoods=tuple(het.likelihoods_list), num_latent=Q,
                      num_inducing=args.m, input_dim=Dx, dtype="float32",
                      jitter=1e-6)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    Z = rng.rand(args.m, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, W=W, lengthscale=0.3,
                         variance=0.5, q_mu_scale=0.1)

    batch = min(512, min(len(X1), len(X2)))
    params, hist = train_mod.svi_fit_on_device(
        params, cfg, tc, [X1, X2], [Y1, Y2], batch_sizes=batch,
        num_steps=args.steps, key=jax.random.PRNGKey(1))
    print(f"ELBO: {hist[0]:.0f} -> {hist[-1]:.0f} over {args.steps} steps")

    if args.data is not None:
        # real data: report in-sample NLPD per task and stop (no ground
        # truth latents to score against)
        from hetmogp_tpu.models import predict as predict_mod

        nlpd = predict_mod.negative_log_predictive(
            params, cfg, jax.random.PRNGKey(4), [X1, X2], [Y1, Y2],
            num_samples=200)
        print(f"in-sample NLPD: {float(nlpd):.3f}")
        return

    # held-out class agreement via the latent posterior means (the
    # reference-quirk predictive renormalizes over K-1 classes, which makes
    # the implied class-K probability uninformative — see MIGRATION.md)
    from hetmogp_tpu.models import predict as predict_mod

    Xtest = rng.rand(2000, Dx)
    Utest = np.stack([latent(Xtest, q) for q in range(Q)], axis=1)
    true_logits = np.concatenate([Utest @ W[:, 2:4], np.zeros((2000, 1))], 1)
    moments = predict_mod.predict_f_all(params, cfg, [Xtest, Xtest])
    m_F2 = np.asarray(moments[1][0])  # (N, 2) latent means for the 2 logits
    pred_logits = np.concatenate([m_F2, np.zeros((2000, 1))], axis=1)
    acc = float((np.argmax(pred_logits, 1) == np.argmax(true_logits, 1)).mean())
    print(f"categorical argmax agreement with true latent field: {acc:.3f}")


if __name__ == "__main__":
    main()
