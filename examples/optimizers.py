"""Optimizer convergence comparison (reproduces the README numbers).

Adam vs Adadelta (the reference's default) vs natural-gradient+Adam on a
demo-style HetGaussian+Bernoulli workload, 200 SVI steps each.

Run:  python examples/optimizers.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# float64 workload: run on CPU (f64 is emulated/slow on TPU)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from hetmogp_tpu import Bernoulli, HetGaussian, ModelConfig, TrainConfig
from hetmogp_tpu import train as train_mod
from hetmogp_tpu.data import MinibatchStream, full_batch
from hetmogp_tpu.models import elbo as elbo_mod
from hetmogp_tpu.models.params import init_params


def main():
    rng = np.random.RandomState(0)
    n = 400
    X = [np.sort(rng.rand(n, 1), 0), np.sort(rng.rand(n, 1), 0)]
    Y = [np.sin(6 * X[0]) + 0.3 * rng.randn(n, 1),
         (rng.rand(n, 1) < 1 / (1 + np.exp(-3 * np.sin(8 * X[1])))).astype(float)]
    cfg = ModelConfig(likelihoods=(HetGaussian(), Bernoulli()), num_latent=2,
                      num_inducing=16, input_dim=1, dtype="float64")
    params0 = init_params(jax.random.PRNGKey(0),
                          cfg, np.linspace(0, 1, 16)[:, None],
                          lengthscale=0.15, variance=0.5, q_mu_scale=0.3)
    data, scales = full_batch(X, Y, dtype=cfg.np_dtype)
    scales = jnp.asarray(scales, cfg.np_dtype)

    configs = [
        ("adam", TrainConfig(optimizer="adam", step_rate=0.01)),
        ("adadelta (reference default)",
         TrainConfig(optimizer="adadelta", step_rate=0.05)),
        ("natgrad_adam",
         TrainConfig(optimizer="natgrad_adam", step_rate=0.01,
                     natgrad_lr=0.3)),
    ]
    print(f"{'optimizer':32s} {'ELBO@50':>10s} {'ELBO@200':>10s} {'full-data':>10s}")
    for name, tc in configs:
        stream = MinibatchStream(X, Y, 100, shuffle=True, seed=1,
                                 dtype=cfg.np_dtype)
        p, hist = train_mod.svi_fit(params0, cfg, tc, stream, 200, vem=True)
        full = float(elbo_mod.elbo_fn(p, data, scales, cfg)[0])
        print(f"{name:32s} {np.mean(hist[45:55]):10.1f} "
              f"{np.mean(hist[-10:]):10.1f} {full:10.1f}")


if __name__ == "__main__":
    main()
