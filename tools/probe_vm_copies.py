"""Attribute the residual per-step layout-copy traffic (DESIGN §7k follow-up).

After the round-4 logdet fix, the weighted copy audit still shows ~25.6 MB
per step — attributed loosely to the VM hyper-backward and the cache
refresh (both 1-in-5-step cond branches).  This probe compiles the
flagship scan trainer exactly as bench.py does, runs
hlo_cost.scan_body_copy_bytes, and then attributes every copy >= min_mb
to its originating source line via the HLO metadata, grouped by the
computation it lives in (which identifies the cond branch).

Usage:  python tools/probe_vm_copies.py [min_mb=1.0]
"""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_runner(M=1024, Q=4, B=512, N_per=4096, steps_per_call=1000):
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
                      adaptive_jitter=False, fuse_task_rows=True)
    tc = TrainConfig(optimizer="adam", step_rate=0.005, minibatch="slice",
                     vm_batch_fraction=0.25)
    Z = rng.rand(M, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    dataset = jax.device_put(dataset)
    runner = train_mod.make_scan_trainer(
        cfg, tc, tuple([N_per] * T), tuple([B] * T), vem=True,
        steps_per_call=steps_per_call)
    optimizer = train_mod.make_optimizer(tc)
    state = init_train_state(params, cfg, optimizer, cache_luu=True,
                             fast_projection=tc.fast_projection)
    key = jax.random.PRNGKey(1)
    return runner, state, dataset, key


_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w\.\-]+)\s*\(")
_COPY_RE = re.compile(
    r"=\s*(\w+)\[([\d,]*)\](?:\{[^}]*\})?\s+copy(?:-start)?\(")
_META_RE = re.compile(r'op_name="([^"]*)"')
_SRC_RE = re.compile(r'source_file="([^"]*)"\s+source_line=(\d+)')

_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
          "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1, "s16": 2,
          "u16": 2}


def attribute_copies(text, min_bytes):
    comp = "?"
    rows = []
    for line in text.splitlines():
        s = line.strip()
        if s.startswith(("ENTRY", "%")) and s.endswith("{"):
            m = _COMP_RE.match(s.lstrip("%"))
            if m:
                comp = m.group(1)
        m = _COPY_RE.search(s)
        if not m:
            continue
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = n * _BYTES.get(dt, 4)
        if nbytes < min_bytes:
            continue
        meta = _META_RE.search(s)
        src = _SRC_RE.search(s)
        rows.append((nbytes, f"{dt}[{dims}]", comp,
                     meta.group(1) if meta else "?",
                     f"{src.group(1).split('/')[-1]}:{src.group(2)}"
                     if src else "?"))
    rows.sort(key=lambda r: -r[0])
    return rows


def main():
    min_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hetmogp_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from hetmogp_tpu import hlo_cost

    runner, state, dataset, key = build_runner()
    compiled = runner.lower(state, dataset, key).compile()
    txt = compiled.as_text()
    audit = hlo_cost.scan_body_copy_bytes(txt, p_true=0.8)
    print(f"weighted copy bytes/step: {audit['bytes']/1e6:.1f} MB "
          f"(n={audit['n_copies']})")
    for shape, b in list(audit["by_shape"].items())[:8]:
        print(f"  {shape:28s} {b/1e6:8.2f} MB weighted")
    print(f"\ncopies >= {min_mb} MB (unweighted), largest first:")
    for nbytes, shape, comp, op, src in attribute_copies(
            txt, min_mb * 1e6)[:40]:
        print(f"  {nbytes/1e6:7.2f} MB  {shape:22s} in {comp[:46]:46s} "
              f"{src:26s} {op[-90:]}")


if __name__ == "__main__":
    main()
