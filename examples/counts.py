"""Count/positive-valued outputs (BASELINE config 4).

Poisson + Gamma + Beta outputs, N = 200k, M = 512, minibatch SVI via the
on-device scan trainer.

Run:  python examples/counts.py [--steps 1000]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import jax
import numpy as np

from hetmogp_tpu import Beta, Gamma, ModelConfig, Poisson, TrainConfig
from hetmogp_tpu import train as train_mod
from hetmogp_tpu.models.params import init_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--m", type=int, default=512)
    args = ap.parse_args()

    liks = (Poisson(), Gamma(), Beta())
    T = len(liks)
    n_per = args.n // T
    rng = np.random.RandomState(0)
    Dx, Q = 2, 3
    X_list = [rng.rand(n_per, Dx).astype(np.float32) for _ in range(T)]
    Y_list = [rng.poisson(3.0, (n_per, 1)).astype(float),
              rng.gamma(2.0, 1.0, (n_per, 1)) + 1e-3,
              np.clip(rng.beta(2.0, 2.0, (n_per, 1)), 1e-3, 1 - 1e-3)]

    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=args.m,
                      input_dim=Dx, dtype="float32", jitter=1e-6)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    params = init_params(jax.random.PRNGKey(0), cfg,
                         rng.rand(args.m, Dx).astype(np.float32),
                         lengthscale=0.3, variance=0.5, q_mu_scale=0.1)

    # warmup chunk so the reported rate is steady-state, not compile time
    params, _ = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=512, num_steps=100,
        key=jax.random.PRNGKey(9))
    t0 = time.perf_counter()
    params, hist = train_mod.svi_fit_on_device(
        params, cfg, tc, X_list, Y_list, batch_sizes=512,
        num_steps=args.steps, key=jax.random.PRNGKey(1))
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.1f}s = {args.steps / dt:.1f} steps/s")
    print(f"ELBO: {hist[0]:.0f} -> {hist[-1]:.0f}")


if __name__ == "__main__":
    main()
