"""In-situ step anatomy at bench shapes: where does the ~2 ms go now?

Measures, with the bench's own scan trainer on the real chip:
  - pure-VE steps (ve_steps_per_vm huge: no VM, no refresh)
  - alternating steps (ve_steps_per_vm=1: per-pair VE + VM + refresh)
  - the bench's 4:1 mix
All timings are value-fetched (block_until_ready does not wait over the
tunnel for small programs) and median-of-calls like bench.py.
"""
import sys
import time

import numpy as np


def run(ve_steps_per_vm, steps_per_call=100, calls=5, M=1024, Q=4, B=512,
        N_per=4096, vm_batch_fraction=0.25, optimizer="adam",
        ve_fwd_precision="highest", fuse_task_rows=False,
        natgrad_retraction="exact"):
    import jax
    from hetmogp_tpu import (Bernoulli, Categorical, Exponential, Gamma,
                             HetGaussian, ModelConfig, Poisson, TrainConfig)
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
                      adaptive_jitter=False,
                      ve_fwd_precision=ve_fwd_precision,
                      fuse_task_rows=fuse_task_rows)
    kw = (dict(natgrad_lr=0.1, natgrad_retraction=natgrad_retraction)
          if optimizer.startswith("natgrad") else {})
    tc = TrainConfig(optimizer=optimizer, step_rate=0.005, minibatch="slice",
                     vm_batch_fraction=vm_batch_fraction,
                     ve_steps_per_vm=ve_steps_per_vm, **kw)
    Z = rng.rand(M, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    dataset = jax.device_put(dataset)
    task_sizes = tuple(int(td.X.shape[0]) for td in dataset)
    runner = train_mod.make_scan_trainer(cfg, tc, task_sizes, tuple([B] * T),
                                         vem=True,
                                         steps_per_call=steps_per_call)
    natgrad = (tc.optimizer == "natgrad_adam"
               and tc.natgrad_retraction == "exact")
    optimizer = train_mod.make_optimizer(tc)
    state = init_train_state(params, cfg, optimizer, natgrad=natgrad)
    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    state, elbos = runner(state, dataset, sub)
    _ = float(np.asarray(elbos)[-1])
    rates = []
    for _ in range(calls):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, elbos = runner(state, dataset, sub)
        _ = float(np.asarray(elbos)[-1])
        rates.append(steps_per_call / (time.perf_counter() - t0))
    r = float(np.median(rates))
    return r, 1000.0 / r


if __name__ == "__main__":
    scenarios = [("bench 4:1 mix", dict(ve_steps_per_vm=4)),
                 ("pure VE", dict(ve_steps_per_vm=10 ** 6)),
                 ("alternating 1:1", dict(ve_steps_per_vm=1)),
                 ("4:1, vm full batch", dict(ve_steps_per_vm=4,
                                             vm_batch_fraction=1.0))]
    if "--fuse" in sys.argv:
        scenarios = [
            ("per-task rows (HIGH)", dict(ve_steps_per_vm=4,
                                          ve_fwd_precision="high")),
            ("fused rows (HIGH)", dict(ve_steps_per_vm=4,
                                       ve_fwd_precision="high",
                                       fuse_task_rows=True)),
            ("per-task pure VE (HIGH)", dict(ve_steps_per_vm=10 ** 6,
                                             ve_fwd_precision="high")),
            ("fused pure VE (HIGH)", dict(ve_steps_per_vm=10 ** 6,
                                          ve_fwd_precision="high",
                                          fuse_task_rows=True))]
    if "--natgrad" in sys.argv:
        scenarios = [("natgrad 4:1 mix", dict(ve_steps_per_vm=4,
                                              optimizer="natgrad_adam")),
                     ("natgrad chol-retr 4:1",
                      dict(ve_steps_per_vm=4, optimizer="natgrad_adam",
                           natgrad_retraction="cholesky")),
                     ("natgrad chol-retr pure VE",
                      dict(ve_steps_per_vm=10 ** 6,
                           optimizer="natgrad_adam",
                           natgrad_retraction="cholesky"))]
    if "--high" in sys.argv:
        scenarios = [(f"{n} (HIGH fwd)", {**kw, "ve_fwd_precision": "high"})
                     for n, kw in scenarios]
    if "--m2048" in sys.argv:
        scenarios = [(f"M=2048 {n}", {**kw, "M": 2048, "steps_per_call": 50})
                     for n, kw in scenarios[:3]]
    if "--m4096" in sys.argv:
        # the M=4096 cliff (round-4 verdict weak #3): sweep precision to
        # match the bench sweep (HIGH) and isolate VE vs VM+refresh
        scenarios = [(f"M=4096 {n}", {**kw, "M": 4096, "steps_per_call": 20,
                                      "ve_fwd_precision": "high",
                                      "fuse_task_rows": True})
                     for n, kw in scenarios[:3]]
    out = {}
    for name, kw in scenarios:
        r, ms = run(**kw)
        out[name] = (r, ms)
        print(f"{name:24s} {r:7.1f} steps/s  {ms:6.3f} ms/step", flush=True)
    if "bench 4:1 mix" in out and "pure VE" in out:
        ve = out["pure VE"][1]
        mix = out["bench 4:1 mix"][1]
        vmref = 5 * mix - 4 * ve
        print(f"implied VE step: {ve:.3f} ms; implied VM+refresh: {vmref:.3f} ms")
