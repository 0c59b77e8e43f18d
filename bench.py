"""Flagship benchmark: SVI steps/sec on the large-scale LMC config.

Workload (BASELINE.md config 5): N=1e6 data points across 6 mixed
likelihoods, M=1024 inducing points, Q=4 latent GPs, minibatch SVI.
Target: >100 steps/sec (v5e-8 target; this runs on however many chips are
visible).  The training loop is the fully on-device scan trainer
(hetmogp_tpu.train.make_scan_trainer): dataset in HBM, minibatch gather,
grad, and optimizer update all inside one XLA program.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N/100}
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    quick = os.environ.get("HETMOGP_BENCH_QUICK", "") not in ("", "0")

    import jax.numpy as jnp

    from hetmogp_tpu import (Bernoulli, Categorical, Exponential, Gamma,
                             HetGaussian, ModelConfig, Poisson, TrainConfig)
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models.params import init_params
    from hetmogp_tpu.train import init_train_state

    liks = (HetGaussian(), Bernoulli(), Categorical(K=3), Poisson(), Gamma(),
            Exponential())
    T = len(liks)
    if quick:
        N_per, M, Q, B, steps_per_call, calls = 10_000, 128, 2, 256, 20, 2
    else:
        N_per, M, Q, B, steps_per_call, calls = 1_000_000 // T, 1024, 4, 512, 100, 3

    rng = np.random.RandomState(0)
    # 2-D inputs: with M=1024 a 1-D linspace Z makes Kuu numerically singular
    # in float32 (NaNs by step 1); spatial inputs match BASELINE config 3's
    # setting and keep cond(Kuu) sane with a 1e-6 jitter floor.
    Dx = 2
    X_list = [rng.rand(N_per, Dx).astype(np.float32) for _ in range(T)]
    # plausible observations per likelihood family
    Y_list = [
        rng.randn(N_per, 1),                                   # HetGaussian
        (rng.rand(N_per, 1) > 0.5).astype(float),              # Bernoulli
        rng.randint(1, 4, (N_per, 1)).astype(float),           # Categorical
        rng.poisson(3.0, (N_per, 1)).astype(float),            # Poisson
        rng.gamma(2.0, 1.0, (N_per, 1)) + 1e-3,                # Gamma
        rng.exponential(1.0, (N_per, 1)) + 1e-3,               # Exponential
    ]

    # fixed 1e-4 jitter, adaptive escalation off: the reactive while_loop
    # in adaptive jitchol serializes the scan pipeline (178 -> 258 steps/s
    # measured); the fixed floor is stable over 3000-step runs (no NaNs)
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=Dx, dtype="float32", jitter=1e-4,
                      adaptive_jitter=False)
    tc = TrainConfig(optimizer="adam", step_rate=0.005)
    Z = rng.rand(M, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)

    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    dataset = jax.device_put(dataset)
    task_sizes = tuple(int(td.X.shape[0]) for td in dataset)
    runner = train_mod.make_scan_trainer(
        cfg, tc, task_sizes, tuple([B] * T), vem=True,
        steps_per_call=steps_per_call)

    optimizer = train_mod.make_optimizer(tc)
    state = init_train_state(params, cfg, optimizer, cache_luu=True,
                             fast_projection=tc.fast_projection)
    key = jax.random.PRNGKey(1)

    # warmup / compile
    key, sub = jax.random.split(key)
    state, elbos = runner(state, dataset, sub)
    jax.block_until_ready(elbos)

    t0 = time.perf_counter()
    total_steps = 0
    last = None
    for _ in range(calls):
        key, sub = jax.random.split(key)
        state, elbos = runner(state, dataset, sub)
        last = elbos
        total_steps += steps_per_call
    jax.block_until_ready(last)
    dt = time.perf_counter() - t0

    steps_per_sec = total_steps / dt
    final_elbo = float(np.asarray(last)[-1])
    result = {
        "metric": "svi_steps_per_sec_N1e6_M1024_Q4_6lik",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / 100.0, 4),
    }
    print(json.dumps(result))
    print(f"# devices={jax.device_count()} backend={jax.default_backend()} "
          f"final_elbo={final_elbo:.1f} quick={quick}", file=sys.stderr)


if __name__ == "__main__":
    main()
