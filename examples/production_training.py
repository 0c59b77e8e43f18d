"""End-to-end production training workflow.

The whole lifecycle a deployed training job needs, on one page:

1. build the dataset once and keep it device-resident
   (``train.prepare_dataset_on_device``)
2. train with the on-device scan loop, periodic Orbax checkpoints and
   keep-last rotation (``fit_svi_on_device(checkpoint_dir=...)``)
3. crash-resume: rerunning the same call with ``resume=True`` restores the
   newest checkpoint and continues the exact step/RNG stream
4. per-step metrics as JSONL (``metrics.MetricsLogger``) for dashboards
5. persist the whole model (``SVMOGP.save`` / ``SVMOGP.load``)
6. compile-and-export the serving predictive as a StableHLO blob
   (``export.export_predictive``) loadable without the training code

Runs on any host (CPU ok):  python examples/production_training.py
"""

import argparse
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200,
                    help="total optimizer steps (floored at 100 so the "
                         "crash-at-half + resume demo stays meaningful)")
    ap.add_argument("--workdir", default=None,
                    help="checkpoint/artifact directory (default: tmp)")
    args = ap.parse_args()
    workdir = pathlib.Path(args.workdir or tempfile.mkdtemp(prefix="hetmogp_"))

    from hetmogp_tpu import (Bernoulli, HetGaussian, ModelConfig, Poisson,
                             SVMOGP, TrainConfig, export)

    # ---- data + model ----------------------------------------------------
    rng = np.random.RandomState(0)
    N = 2000
    X = [np.sort(rng.rand(N, 1), 0) for _ in range(3)]
    Y = [rng.randn(N, 1), (rng.rand(N, 1) > 0.5).astype(float),
         rng.poisson(2.0, (N, 1)).astype(float)]
    cfg = ModelConfig(likelihoods=(HetGaussian(), Bernoulli(), Poisson()),
                      num_latent=3, num_inducing=32, input_dim=1,
                      dtype="float32", jitter=1e-5, adaptive_jitter=False,
                      fuse_task_rows=True)  # docs/DESIGN.md §7g
    model = SVMOGP(cfg, X, Y, np.linspace(0, 1, 32)[:, None],
                   key=jax.random.PRNGKey(0), lengthscale=0.15)
    print(f"initial ELBO: {model.log_likelihood():.1f}")

    # ---- train with periodic checkpoints + exact resume ------------------
    # A killed job rerun with the same arguments restores the newest
    # step_<n> checkpoint and continues the exact step/RNG stream.
    # production knobs absent upstream: warmup-cosine LR schedule (the
    # schedule count lives in the optimizer state, so it resumes exactly)
    # and global-norm gradient clipping
    args.steps = max(args.steps, 100)
    tc = TrainConfig(optimizer="adam", step_rate=0.01, minibatch="slice",
                     lr_schedule="warmup_cosine",
                     lr_schedule_kwargs=(("warmup_steps", 20),
                                         ("decay_steps", args.steps)),
                     clip_grad_norm=100.0)
    ckdir = workdir / "ckpts"
    half = (args.steps // 2) // 50 * 50
    model.fit_svi_on_device(batch_size=256, num_steps=half, steps_per_call=50,
                            train_config=tc, checkpoint_dir=ckdir,
                            keep_last=2)          # "the job dies here"
    model2 = SVMOGP(cfg, X, Y, np.linspace(0, 1, 32)[:, None],
                    key=jax.random.PRNGKey(0), lengthscale=0.15)
    model2.fit_svi_on_device(batch_size=256, num_steps=args.steps,
                             steps_per_call=50, train_config=tc,
                             checkpoint_dir=ckdir, keep_last=2, resume=True)
    kept = sorted(p.name for p in ckdir.iterdir())
    print(f"trained {args.steps} steps (resumed at {half}); "
          f"ELBO: {model2.log_likelihood():.1f}; checkpoints kept: {kept}")

    # ---- whole-model persistence -----------------------------------------
    model2.save(workdir / "model")
    served = SVMOGP.load(workdir / "model", X, Y)
    assert abs(served.log_likelihood() - model2.log_likelihood()) < 1e-3

    # ---- AOT serving export ----------------------------------------------
    Xnew = [np.linspace(0, 1, 256)[:, None].astype(np.float32)] * 3
    blob = export.export_predictive(served.params, served.pred_config, Xnew)
    (workdir / "predictive.stablehlo").write_bytes(blob)
    fn = export.load_predictive(blob)
    out = fn(*export.params_args(served.params), *Xnew)
    mp1 = np.asarray(out[2])  # flat (m0, v0, m1, v1, ...): Bernoulli mean
    assert 0.0 < mp1.min() and mp1.max() < 1.0
    print(f"exported serving predictive: {len(blob)} bytes; "
          f"mean p(y=1) = {float(mp1.mean()):.3f}")
    print(f"artifacts in {workdir}")


if __name__ == "__main__":
    main()
