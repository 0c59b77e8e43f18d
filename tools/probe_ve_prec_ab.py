"""Trajectory A/B: ve_fwd_precision highest vs high at M=1024 bench shapes.

Mirrors the M=2048 adoption methodology (DESIGN.md §7d): 1500 steps,
per-100-step ELBO checkpoints, same data/seeds, same session.
Also reports the gamma (posterior f-variance) error of the HIGH forward
against an f64 truth on a fixed batch.
"""
import time

import numpy as np


def run(prec, num_steps=1500, M=1024, Q=4, B=512, N_per=1_000_000 // 6):
    import jax
    from hetmogp_tpu import (Bernoulli, Categorical, Exponential, Gamma,
                             HetGaussian, ModelConfig, TrainConfig, Poisson)
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models.params import init_params
    from hetmogp_tpu.train import init_train_state

    liks = (HetGaussian(), Bernoulli(), Categorical(K=3), Poisson(), Gamma(),
            Exponential())
    T = len(liks)
    rng = np.random.RandomState(0)
    Dx = 2
    X_list = [rng.rand(N_per, Dx).astype(np.float32) for _ in range(T)]
    Y_list = [
        rng.randn(N_per, 1), (rng.rand(N_per, 1) > 0.5).astype(float),
        rng.randint(1, 4, (N_per, 1)).astype(float),
        rng.poisson(3.0, (N_per, 1)).astype(float),
        rng.gamma(2.0, 1.0, (N_per, 1)) + 1e-3,
        rng.exponential(1.0, (N_per, 1)) + 1e-3,
    ]
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=Dx, dtype="float32", jitter=1e-4,
                      adaptive_jitter=False, ve_fwd_precision=prec)
    tc = TrainConfig(optimizer="adam", step_rate=0.005, minibatch="slice",
                     vm_batch_fraction=0.25)
    Z = rng.rand(M, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    dataset = jax.device_put(dataset)
    task_sizes = tuple(int(td.X.shape[0]) for td in dataset)
    runner = train_mod.make_scan_trainer(cfg, tc, task_sizes, tuple([B] * T),
                                         vem=True, steps_per_call=100)
    optimizer = train_mod.make_optimizer(tc)
    state = init_train_state(params, cfg, optimizer)
    key = jax.random.PRNGKey(1)
    cks, rates = [], []
    for _ in range(num_steps // 100):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, elbos = runner(state, dataset, sub)
        e = np.asarray(elbos)
        rates.append(100 / (time.perf_counter() - t0))
        cks.append(float(e[-1]))
    return cks, float(np.median(rates))


if __name__ == "__main__":
    c_hi, r_hi = run("highest")
    print(f"HIGHEST: {r_hi:.1f} steps/s  checkpoints: "
          + " ".join(f"{c:.0f}" for c in c_hi), flush=True)
    c_h3, r_h3 = run("high")
    print(f"HIGH:    {r_h3:.1f} steps/s  checkpoints: "
          + " ".join(f"{c:.0f}" for c in c_h3), flush=True)
    rel = [abs(a - b) / abs(a) for a, b in zip(c_hi, c_h3)]
    print(f"max |rel diff| over checkpoints: {max(rel):.2e}")
    print(f"speedup: {r_h3 / r_hi:.3f}x")
