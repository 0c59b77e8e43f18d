"""ELBO-vs-wallclock frontier: natgrad retractions vs adam (VERDICT r4 #5).

Two natural-gradient retractions exist for the whitened q(u)
(train.natgrad_ve_step):
  - "exact": natural-parameter step, CAVI-exact at lr=1 on conjugate
    tasks, carries S^{-1} (measured ~415-438 steps/s on the flagship);
  - "cholesky": triangular-group local-coordinate NGD, factorization-free
    (measured ~528 steps/s), first-order-equal inside the trust ball.
Plus the first-order baseline (adam on everything).

This probe runs each on the bench workload shapes (6 mixed likelihoods,
M=1024, Q=4, B=512, 4:1 VE:VM with adam on hypers in all cases) from the
SAME init, and reports ELBO reached vs wall-clock at call boundaries —
the number that decides the TrainConfig default.  Output: one table +
one JSON line per config.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python \
            tools/probe_natgrad_frontier.py [--quick]
"""
import json
import sys
import time

import numpy as np


def build(optimizer, retraction, lr, M=1024, Q=4, B=512, N_per=20000,
          steps_per_call=250, ve_fwd_precision="high"):
    import jax
    from hetmogp_tpu import (Bernoulli, Categorical, Exponential, Gamma,
                             HetGaussian, ModelConfig, Poisson, TrainConfig)
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models.params import init_params

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
                      adaptive_jitter=False, fuse_task_rows=True,
                      ve_fwd_precision=ve_fwd_precision)
    kw = (dict(natgrad_lr=lr, natgrad_retraction=retraction)
          if optimizer == "natgrad_adam" else {})
    tc = TrainConfig(optimizer=optimizer, step_rate=0.005, minibatch="slice",
                     ve_steps_per_vm=4, **kw)
    Z = rng.rand(M, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    dataset = jax.device_put(dataset)
    task_sizes = tuple(int(td.X.shape[0]) for td in dataset)
    runner = train_mod.make_scan_trainer(cfg, tc, task_sizes, tuple([B] * T),
                                         vem=True,
                                         steps_per_call=steps_per_call)
    natgrad = (optimizer == "natgrad_adam" and retraction == "exact")
    opt = train_mod.make_optimizer(tc)
    state = train_mod.init_train_state(params, cfg, opt, natgrad=natgrad)
    return runner, state, dataset


def run_config(name, optimizer, retraction, lr, calls, steps_per_call):
    import jax

    runner, state, dataset = build(optimizer, retraction, lr,
                                   steps_per_call=steps_per_call)
    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    # compile (not timed) — then REBUILD state so every config starts its
    # timed trajectory from the identical init
    s_warm, e_warm = runner(state, dataset, sub)
    jax.block_until_ready(e_warm)
    runner2, state, dataset = build(optimizer, retraction, lr,
                                    steps_per_call=steps_per_call)
    traj = []  # (cumulative seconds, minibatch ELBO at call end)
    t_cum = 0.0
    key = jax.random.PRNGKey(1)
    for _ in range(calls):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, elbos = runner(state, dataset, sub)
        last = float(np.asarray(elbos)[-1])
        t_cum += time.perf_counter() - t0
        traj.append((t_cum, last))
    steps = calls * steps_per_call
    rec = {"config": name, "optimizer": optimizer,
           "retraction": retraction if optimizer == "natgrad_adam" else None,
           "lr": lr if optimizer == "natgrad_adam" else None,
           "steps": steps, "steps_per_sec": round(steps / t_cum, 1),
           "elbo_final": round(traj[-1][1], 1),
           "trajectory": [(round(t, 3), round(e, 1)) for t, e in traj]}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    quick = "--quick" in sys.argv
    calls, spc = (4, 50) if quick else (12, 250)
    configs = [
        ("adam", "adam", None, None),
        ("natgrad exact lr=0.5", "natgrad_adam", "exact", 0.5),
        ("natgrad exact lr=1.0", "natgrad_adam", "exact", 1.0),
        ("natgrad cholesky lr=0.5", "natgrad_adam", "cholesky", 0.5),
        ("natgrad cholesky lr=1.0", "natgrad_adam", "cholesky", 1.0),
    ]
    recs = [run_config(n, o, r, lr, calls, spc) for n, o, r, lr in configs]

    # ELBO reached at common wall-clock marks (linear interp on call ends)
    t_max = min(r["trajectory"][-1][0] for r in recs)
    marks = [t_max * f for f in (0.25, 0.5, 1.0)]
    print(f"\n{'config':26s} steps/s   " +
          "".join(f"ELBO@{m:4.1f}s   " for m in marks))
    for r in recs:
        ts = [t for t, _ in r["trajectory"]]
        es = [e for _, e in r["trajectory"]]
        vals = [float(np.interp(m, ts, es)) for m in marks]
        print(f"{r['config']:26s} {r['steps_per_sec']:7.1f}   " +
              "".join(f"{v:10.1f}   " for v in vals))


if __name__ == "__main__":
    main()
