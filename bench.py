"""Flagship benchmark: SVI steps/sec on the large-scale LMC config.

Workload (BASELINE.md config 5): N=1e6 data points across 6 mixed
likelihoods, M=1024 inducing points, Q=4 latent GPs, minibatch SVI.
Target: >100 steps/sec (v5e-8 target; this runs on however many chips are
visible).  The training loop is the fully on-device scan trainer
(hetmogp_tpu.train.make_scan_trainer): dataset in HBM, minibatch gather,
grad, and optimizer update all inside one XLA program.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N/100,
   "tflops_per_sec": ..., "mfu_logical": ..., "mfu_physical": ...,
   "matmul_by_passes": ..., "attempts": k}
(flop fields per the parsed-HLO accounting, DESIGN.md "MFU accounting")

Resilience: the workload always runs in a fresh subprocess supervised by
this script.  Transient TPU backend failures (libtpu client/runtime version
skew surfacing as FAILED_PRECONDITION — this killed the round-1 multichip
and round-2 bench driver artifacts despite the code being healthy) are
retried up to HETMOGP_BENCH_ATTEMPTS (default 3) times; retries bypass the
persistent XLA compile cache (stale AOT executables from a newer libtpu are
the prime suspect) by pointing JAX_COMPILATION_CACHE_DIR at a fresh temp
dir.  On final failure a VALID JSON line with "value": null and an "error"
field is still printed, so the recorded artifact always parses.

Modes:
  python bench.py              flagship N=1e6/M=1024/Q=4 workload
  python bench.py --sweep-m    M-scaling sweep (M=512/1024/2048/4096), one
                               JSON line per point (secondary artifact)
  python bench.py --serve      serving throughput: observation-space
                               predictive over N=1e6 rows (rows/sec)
  python bench.py --serve-mesh virtual-CPU serving-scaling evidence
                               (per-device flop split at 8 devices)
  python bench.py --mesh       virtual-CPU mesh plumbing check
  HETMOGP_BENCH_QUICK=1        small workload, under its OWN metric name
  HETMOGP_BENCH_TINY=1         minutes-scale CPU workload (chaos test)
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

# v5e peak is the bf16 MXU peak; the train step's hot matmuls run in f32
# with HIGHEST precision (multiple bf16 passes), so MFU vs this peak is a
# conservative, honest utilization number.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _workload_params():
    """(metric_name, shapes) for the selected workload tier."""
    if os.environ.get("HETMOGP_BENCH_TINY", "") not in ("", "0"):
        # chaos-test tier: small enough to run on the CPU test host
        return ("svi_steps_per_sec_tiny", dict(
            N_per=2_000, M=32, Q=2, B=64, steps_per_call=5, calls=2))
    if os.environ.get("HETMOGP_BENCH_QUICK", "") not in ("", "0"):
        # NOTE: deliberately a different metric name — quick mode is a
        # different workload and must never masquerade as the flagship
        return ("svi_steps_per_sec_quick_N6e4_M128_Q2_6lik", dict(
            N_per=10_000, M=128, Q=2, B=256, steps_per_call=20, calls=2))
    # steps_per_call=1000: fixed per-call dispatch overhead over the
    # tunnel (measured ~26 ms per call at this session's RTT, constant in
    # the step count) stays under 2% of a call — at 100-step calls it
    # shaved ~9% off the reported rate once the step dropped toward 2 ms
    # (494 at 100-step vs 543 at 250-step calls in the same session)
    # ve_fwd_precision="high": the VE projection P = Kfu @ iLuu^T as a
    # 3-pass instead of 6-pass bf16 matmul.  Adopted at M=1024 after the
    # same diligence as the M=2048 sweep point (DESIGN.md §7d/§7e): 1500-
    # step trajectory A/B matches HIGHEST to <2e-3 relative at every
    # per-100 checkpoint (final checkpoints within minibatch noise), and a
    # 10k-step run is finite and stable (+10.6% steps/s).  The ModelConfig
    # default remains "highest" (safe default for unknown conditioning).
    return ("svi_steps_per_sec_N1e6_M1024_Q4_6lik", dict(
        N_per=1_000_000 // 6, M=1024, Q=4, B=512, steps_per_call=1000,
        calls=5, ve_fwd_precision="high"))


def _flops_of(runner, p_true, *args):
    """FLOP accounting of ONE scan-trainer step, branch- and pass-aware.

    HLO cost analysis counts a while/scan body ONCE regardless of trip
    count (verified: identical flops for steps_per_call 5 vs 10), so the
    program's reported flops ARE the per-step flops.  Round-4 accounting
    fixes (round-3 verdict weak #1):

    * cost_analysis counts each lax.cond as its LARGER branch (measured
      on TPU: a cond with dots in both branches reports only the bigger
      one — so the round-3 "both branches counted" note was wrong in the
      other direction), and reports logical f32 flops although the TPU
      runs an f32 matmul as 1/3/6 bfloat16 MXU passes at
      DEFAULT/HIGH/HIGHEST precision.
    * hetmogp_tpu.hlo_cost parses the compiled HLO (no extra compile) to
      weight each conditional's branches by ``p_true`` (the VE-step
      fraction) and each matmul by its precision's pass multiplier; the
      non-matmul remainder (elementwise/quadrature/reductions) is
      ``cost_analysis - branch_max matmul flops`` and is added unweighted.

    Returns a dict:
      flops_logical    branch-weighted logical flops per step
                       (weighted matmuls + non-matmul remainder)
      flops_xla_raw    raw cost_analysis flops (max-branch semantics —
                       the number rounds 1-3 reported as flops_per_step)
      matmul_logical   branch-weighted logical matmul flops
      matmul_physical  bf16 MXU passes: matmul flops x pass multiplier
      matmul_by_passes {passes: logical flops} breakdown
    """
    try:
        compiled = runner.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        total_raw = float(ca.get("flops", 0.0))
        if total_raw <= 0:
            return None
        out = {"flops_xla_raw": total_raw}
        from hetmogp_tpu import hlo_cost

        txt = compiled.as_text()
        mm_max = hlo_cost.matmul_flops(txt, branch_max=True)
        if mm_max["n_dots"] > 0:
            w = hlo_cost.matmul_flops(txt, p_true=p_true)
            nonmm = max(0.0, total_raw - mm_max["logical"])
            out["flops_logical"] = w["logical"] + nonmm
            out["matmul_logical"] = w["logical"]
            out["matmul_physical"] = w["physical"]
            out["matmul_by_passes"] = {
                str(k): round(v) for k, v in w["by_passes"].items()}
        else:
            out["flops_logical"] = total_raw
        return out
    except Exception as e:  # noqa: BLE001 - accounting must never kill a run
        print(f"# cost_analysis unavailable: {e!r}", file=sys.stderr)
        return None


def run_workload(metric, N_per, M, Q, B, steps_per_call, calls,
                 ve_fwd_precision="highest"):
    """Run the scan-trainer workload; returns the result dict."""
    import jax
    import jax.numpy as jnp  # noqa: F401 - ensures full jax init

    # persistent compile cache: TPU programs at bench shapes take 5-10 min
    # to compile cold; repeat runs (and retry attempts that DON'T bypass)
    # reuse the compiled executables.  The supervisor's retry path points
    # HETMOGP_JAX_CACHE at a fresh dir to bypass a possibly-poisoned cache.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("HETMOGP_JAX_CACHE", "/tmp/hetmogp_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax: cold-compile every run

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
    # fuse_task_rows: one concatenated-rows projection for all 6 tasks
    # (one Kfu / one triangular matmul / one quad_diag; ONE Lq-cotangent
    # in the VE backward instead of six) — measured +4.9% on the 4:1 mix,
    # +6.4% pure-VE at these shapes (DESIGN.md §7g); ELBO value matches
    # the per-task path to 1e-13 (tests/test_elbo_oracle.py).
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=Dx, dtype="float32", jitter=1e-4,
                      adaptive_jitter=False,
                      ve_fwd_precision=ve_fwd_precision,
                      fuse_task_rows=True)
    # fast_projection (default): cached triangular inverse + HIGHEST-prec
    # matmuls for VE projections and VM cached adjoints; minibatch="slice"
    # draws contiguous random blocks (the reference's own sequential-slice
    # semantics, util.py:52-72 — and ~5% faster than row gathers on TPU).
    # vm_batch_fraction=0.25: VM hyper grads from a quarter sub-batch —
    # still an unbiased estimator (prefix of a uniform random block), ELBO
    # trajectory measured indistinguishable from 1.0 over 1500 steps while
    # the O(B) VM chain shrinks 4x (+17% steps/s; DESIGN.md §7d).
    tc = TrainConfig(optimizer="adam", step_rate=0.005, minibatch="slice",
                     vm_batch_fraction=0.25)
    Z = rng.rand(M, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)

    # multi-chip: when more than one device is visible (e.g. a real
    # v5e-8), shard the dataset/batch rows over a 1-D ('data',) mesh —
    # the same code path the virtual-CPU sharding tests and the driver's
    # dryrun_multichip exercise.  task_sizes stay the REAL row counts
    # (padding rows added for even sharding are never sampled).
    n_dev = jax.device_count()
    mesh = None
    if n_dev > 1:
        from hetmogp_tpu.parallel import sharding as _sh

        mesh = _sh.data_mesh(jax.devices())
    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype,
                            pad_multiple=(n_dev if mesh is not None else 1))
    task_sizes = tuple([N_per] * T)
    runner = train_mod.make_scan_trainer(
        cfg, tc, task_sizes, tuple([B] * T), vem=True,
        steps_per_call=steps_per_call, mesh=mesh)

    optimizer = train_mod.make_optimizer(tc)
    state = init_train_state(params, cfg, optimizer, cache_luu=True,
                             fast_projection=tc.fast_projection)
    if mesh is not None:
        dataset = _sh.shard_batch(mesh, dataset)
        state = _sh.shard_state(mesh, state)
    else:
        dataset = jax.device_put(dataset)
    key = jax.random.PRNGKey(1)

    # FLOP accounting must lower BEFORE the first call donates the state
    p_ve = tc.ve_steps_per_vm / (tc.ve_steps_per_vm + 1)
    flops = _flops_of(runner, p_ve, state, dataset, key)

    # warmup / compile
    key, sub = jax.random.split(key)
    state, elbos = runner(state, dataset, sub)
    jax.block_until_ready(elbos)

    # median of per-call rates: run-to-run spread over the remote tunnel is
    # ~5%, and the median of independent calls is a far tighter estimate of
    # the steady-state rate than one total-time average
    rates = []
    last = None
    for _ in range(calls):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, elbos = runner(state, dataset, sub)
        jax.block_until_ready(elbos)
        rates.append(steps_per_call / (time.perf_counter() - t0))
        last = elbos

    steps_per_sec = float(np.median(rates))
    final_elbo = float(np.asarray(last)[-1])
    if not np.isfinite(final_elbo):
        raise RuntimeError(f"non-finite ELBO at bench end: {final_elbo}")
    result = {
        "metric": metric,
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / 100.0, 4),
        "devices": n_dev,
        # measured-configuration disclosure (round-3 advisor): the flagship
        # runs the documented tuned settings, not the ModelConfig defaults
        "ve_fwd_precision": ve_fwd_precision,
        "vm_fwd_precision": os.environ.get("HETMOGP_VM_FWD_PRECISION",
                                           "highest") or "highest",
        "steps_per_call": steps_per_call,
    }
    if flops is not None:
        # scan body counted once, VE/VM cond branches weighted 4:1, see
        # _flops_of; docs/DESIGN.md "MFU accounting" for the method
        flops_per_step = flops["flops_logical"]
        tflops = flops_per_step * steps_per_sec / 1e12
        result["flops_per_step"] = round(flops_per_step)
        result["flops_xla_raw"] = round(flops["flops_xla_raw"])
        result["tflops_per_sec"] = round(tflops, 2)
        result["flops_note"] = (
            "logical f32 flops of one scan step, lax.cond branches weighted "
            "by the VE:VM schedule (matmul flops parsed from the compiled "
            "HLO; non-matmul remainder from cost_analysis, whose raw number "
            "counts each cond as its larger branch).  mfu_logical = these "
            "flops / bf16 peak; mfu_physical = bf16 MXU passes (1x/3x/6x "
            "per DEFAULT/HIGH/HIGHEST-precision matmul) / peak — the "
            "matmul-pipeline hardware utilization.  Method: DESIGN.md "
            "'MFU accounting'")
        kind = jax.devices()[0].device_kind
        peak = _PEAK_FLOPS.get(kind)
        if peak is not None:
            result["mfu_logical"] = round(
                flops_per_step * steps_per_sec / peak, 4)
            if "matmul_physical" in flops:
                result["mfu_physical"] = round(
                    flops["matmul_physical"] * steps_per_sec / peak, 4)
                result["matmul_by_passes"] = flops["matmul_by_passes"]
            result["mfu_peak"] = f"{kind} bf16 {peak / 1e12:.0f} TFLOP/s"
    print(f"# devices={jax.device_count()} backend={jax.default_backend()} "
          f"final_elbo={final_elbo:.1f} "
          f"per_call={[round(r, 1) for r in rates]}", file=sys.stderr)
    return result




def run_serve(metric, N_total=1_000_000, M=1024, Q=4, chunk=65536,
              ve_fwd_precision="highest"):
    # ve_fwd_precision: measurement knob only — HIGH measured SLOWER for
    # serving (2.24M vs 2.56M rows/s; the chunk path is not projection-
    # pass-bound) and HIGHEST is the safer predictive-variance accuracy.
    """Serving throughput: observation-space predictive moments, rows/sec.

    The production serving shape (prompt: large-scale deployment): the
    bench model's 6 mixed likelihoods, N=1e6 prediction rows total,
    processed in fixed row chunks (bounds the (Q, chunk, M) intermediates;
    chunk=65536 also puts N*M over the fused-Pallas-RBF dispatch gate, so
    the serving path exercises the Pallas kernel on TPU).  Multi-device
    hosts shard rows over a ('data',) mesh (predict.predictive_sharded).
    """
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("HETMOGP_JAX_CACHE", "/tmp/hetmogp_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from hetmogp_tpu import (Bernoulli, Categorical, Exponential, Gamma,
                             HetGaussian, ModelConfig, Poisson)
    from hetmogp_tpu.models import predict as predict_mod
    from hetmogp_tpu.models.params import init_params

    liks = (HetGaussian(), Bernoulli(), Categorical(K=3), Poisson(), Gamma(),
            Exponential())
    T = len(liks)
    rng = np.random.RandomState(0)
    Dx = 2
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=Dx, dtype="float32", jitter=1e-4,
                      adaptive_jitter=False,
                      ve_fwd_precision=ve_fwd_precision)
    Z = rng.rand(M, Dx).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    n_per = N_total // T
    n_chunks = max(1, n_per // chunk)
    rows_per_task = n_chunks * chunk
    X = jax.device_put(rng.rand(rows_per_task, Dx).astype(np.float32))

    n_dev = jax.device_count()
    mesh = None
    if n_dev > 1:
        from hetmogp_tpu.parallel import sharding as _sh

        mesh = _sh.data_mesh(jax.devices())

    # serving fast path: one (Luu, iLuu) factorization for the whole
    # model, cached-inverse matmul projections per request chunk
    serve_fns = [predict_mod.make_serving_predictive(params, cfg, t)
                 for t in range(T)]

    def serve_all():
        out = 0.0
        for t in range(T):
            for c in range(n_chunks):
                Xc = jax.lax.dynamic_slice_in_dim(X, c * chunk, chunk)
                if mesh is not None:
                    m, v = predict_mod._sharded_predictive_task(
                        cfg, mesh, t)(params, Xc)
                else:
                    m, v = serve_fns[t](Xc)
                out = out + jnp.sum(m[-1]) + jnp.sum(v[-1])
        return out

    float(serve_all())  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(serve_all())
        times.append(time.perf_counter() - t0)
    dt = min(times)
    total_rows = rows_per_task * T
    rows_per_sec = total_rows / dt
    return {
        "metric": metric,
        "value": round(rows_per_sec),
        "unit": "rows/sec",
        "vs_baseline": None,
        "devices": n_dev,
        "note": (f"observation-space predictive moments, {T} mixed "
                 f"likelihoods, M={M}, Q={Q}, chunk={chunk}, "
                 f"{total_rows} rows/pass"),
    }

def run_serve_mesh(n_devices: int = 8, Ns: int = 8192, M: int = 256,
                   Q: int = 4):
    """Serving scaling evidence on a virtual CPU mesh (``--serve-mesh``).

    Virtual devices share one host's cores, so wall-clock speedup is NOT
    the signal; what this records is the property that produces
    near-linear real-chip scaling: XLA cost_analysis of an SPMD
    executable reports PER-DEVICE flops, so the 8-device sharded
    predictive must cost ~1/8 per device of the 1-device program, with
    values equal and per-call times bounded.  (The compiled-HLO guard —
    no row-sized gathers — lives in tests/test_sharding.py.)
    """
    from hetmogp_tpu.parallel.sharding import force_virtual_cpu

    force_virtual_cpu(n_devices)

    import jax

    from hetmogp_tpu import Bernoulli, HetGaussian, ModelConfig
    from hetmogp_tpu.models.params import init_params
    from hetmogp_tpu.parallel import sharding as _sh

    rng = np.random.RandomState(0)
    # jitter 1e-4 (the bench floor): 1e-5 NaNs the f32 factorization at
    # this M/lengthscale (cond(Kuu) too high) on CPU and TPU alike
    cfg = ModelConfig(likelihoods=(HetGaussian(), Bernoulli()), num_latent=Q,
                      num_inducing=M, input_dim=2, dtype="float32",
                      jitter=1e-4, adaptive_jitter=False)
    params = init_params(jax.random.PRNGKey(0), cfg,
                         rng.rand(M, 2).astype(np.float32), lengthscale=0.3,
                         variance=0.5, q_mu_scale=0.1)
    X = np.asarray(rng.rand(Ns, 2), np.float32)

    def flops_of(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))

    out = {"metric": f"serve_mesh_per_device_flops_ratio_{n_devices}dev",
           "unit": "x (1dev flops / per-device flops at 8dev; virtual-CPU "
                   "evidence of compute splitting, not a wall-time speedup)",
           "vs_baseline": None}
    vals = {}
    for nd in (1, n_devices):
        mesh = _sh.data_mesh(jax.devices("cpu")[:nd])
        f = _sh.make_sharded_predictive_task(cfg, mesh, 0)
        import jax.numpy as jnp

        Xd = jnp.asarray(X)
        compiled = f.lower(params, Xd).compile()
        m, v = f(params, Xd)  # noqa: F841 - warm + value fetch
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        m, v = f(params, Xd)
        jax.block_until_ready(v)
        vals[nd] = {"flops_per_device": flops_of(compiled),
                    "rows_per_sec": round(Ns / (time.perf_counter() - t0)),
                    "mean0": float(np.asarray(m)[0, 0])}
    ratio = vals[1]["flops_per_device"] / max(vals[n_devices]
                                              ["flops_per_device"], 1.0)
    out["value"] = round(ratio, 2)
    out["per_device"] = {str(k): {kk: vv for kk, vv in d.items()
                                  if kk != "mean0"}
                         for k, d in vals.items()}
    out["values_match"] = bool(abs(vals[1]["mean0"]
                                   - vals[n_devices]["mean0"]) < 1e-5)
    return out


def worker(argv):
    if "--inject-fail" in argv:
        # chaos-test hook: simulate the transient backend failure class
        raise RuntimeError("injected failure (bench chaos test)")
    # VM-forward solve at HIGH (3-pass): measured +3.6% (r3, DESIGN §7d)
    # / +0.9% (r4 session) with 1500-step trajectory parity; read by
    # hetmogp_tpu.ops.linalg at import, so set before any import.  An
    # explicit env value (incl. "") wins over this default.
    os.environ.setdefault("HETMOGP_VM_FWD_PRECISION", "high")
    if os.environ.get("HETMOGP_BENCH_TINY", "") not in ("", "0"):
        # the chaos test runs on the CI host — force CPU before backend init
        from hetmogp_tpu.parallel.sharding import force_virtual_cpu
        force_virtual_cpu(1)
    if "--mesh" in argv:
        main_mesh()
        return
    if "--serve-mesh" in argv:
        print(json.dumps(run_serve_mesh()))
        return
    if "--serve" in argv:
        print(json.dumps(run_serve("serve_rows_per_sec_M1024_Q4_6lik")))
        return
    if "--sweep-m" in argv:
        # M-scaling sweep (VERDICT r2 #6): quick-sized call counts, one
        # JSON line per point under per-M metric names
        for M in (512, 1024, 2048, 4096):
            # M>=1024: VE-forward projections dominate the step; HIGH
            # precision is the measured adoption for both regimes —
            # M=2048: +18% with trajectory parity (DESIGN.md §7d);
            # M=1024: +10.6%, 1500-step A/B <2e-3 per-checkpoint plus a
            # 10k-step stability run (DESIGN.md §7e / _workload_params)
            prec = "high" if M >= 1024 else "highest"
            # steps_per_call large enough that fixed per-call dispatch
            # overhead (measured ~26 ms per call at this session's tunnel
            # RTT, constant in the step count) stays <2% of a call:
            # 50-step calls were measured ~15% under the long-run rate.
            # M=4096 steps are tens of ms, so 50-step calls suffice there
            # (and keep the sweep's wall time bounded).
            spc = 50 if M >= 4096 else (250 if M >= 2048 else 1000)
            res = run_workload(f"svi_steps_per_sec_sweep_M{M}",
                               N_per=1_000_000 // 6, M=M, Q=4, B=512,
                               steps_per_call=spc, calls=3,
                               ve_fwd_precision=prec)
            res["ve_fwd_precision"] = prec
            print(json.dumps(res))
        return
    metric, shapes = _workload_params()
    res = run_workload(metric, **shapes)
    quick = any(os.environ.get(k, "") not in ("", "0")
                for k in ("HETMOGP_BENCH_QUICK", "HETMOGP_BENCH_TINY"))
    if not quick and os.environ.get("HETMOGP_BENCH_SERVE", "1") \
            not in ("", "0"):
        # round-4 verdict #6: record serving alongside the train metric so
        # serving regressions are visible round-over-round in BENCH_r{N}
        try:
            s = run_serve("serve_rows_per_sec_M1024_Q4_6lik")
            res["serve"] = {k: s[k] for k in
                            ("value", "unit", "devices", "note")}
        except Exception as e:  # serving must never kill the train metric
            res["serve"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        try:
            # virtual-mesh serving evidence needs a CPU backend from
            # process start — run it as a nested worker subprocess
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--serve-mesh"], capture_output=True, text=True,
                timeout=600)
            rec = next(json.loads(ln) for ln in
                       reversed(proc.stdout.strip().splitlines())
                       if ln.lstrip().startswith("{"))
            res["serve_mesh"] = {k: rec[k] for k in
                                 ("value", "unit", "per_device",
                                  "values_match") if k in rec}
        except Exception as e:
            res["serve_mesh"] = {"error": f"{type(e).__name__}: {e}"[:300]}
    print(json.dumps(res))


def supervise(argv) -> int:
    """Run the workload in a fresh subprocess with bounded retries.

    Returns the exit code: 0 if any attempt succeeded, 1 otherwise (the
    final-failure JSON line is printed either way so the artifact parses).
    """
    attempts = int(os.environ.get("HETMOGP_BENCH_ATTEMPTS", "3"))
    inject = int(os.environ.get("HETMOGP_BENCH_INJECT_FAIL", "0"))
    timeout_s = float(os.environ.get("HETMOGP_BENCH_TIMEOUT", "2400"))
    errors = []
    for i in range(attempts):
        env = os.environ.copy()
        cmd = [sys.executable, os.path.abspath(__file__), "--worker"] + argv
        if i < inject:
            cmd.append("--inject-fail")
        if i > 0:
            # bypass the persistent compile cache: stale AOT executables
            # compiled under an older libtpu are the prime suspect for the
            # FAILED_PRECONDITION failures that ate two driver artifacts
            fresh = tempfile.mkdtemp(prefix="hetmogp_bench_cache_")
            env["JAX_COMPILATION_CACHE_DIR"] = fresh
            env["HETMOGP_JAX_CACHE"] = fresh
            print(f"# bench attempt {i + 1}/{attempts}: retrying in a fresh "
                  f"process with a fresh compile cache ({fresh})",
                  file=sys.stderr)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=timeout_s, env=env)
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {i + 1}: timeout after {timeout_s:.0f}s")
            continue
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0:
            emitted = False
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    rec["attempts"] = i + 1
                    print(json.dumps(rec))
                    emitted = True
                elif line:
                    print(line)
            if emitted:
                return 0
            errors.append(f"attempt {i + 1}: rc=0 but no JSON on stdout")
        else:
            tail = [ln for ln in proc.stderr.strip().splitlines() if ln]
            errors.append(f"attempt {i + 1}: rc={proc.returncode}: "
                          + (tail[-1][-300:] if tail else "<no stderr>"))
    if "--mesh" in argv:
        metric = "mesh_scaling_overhead_virtual_cpu"
    elif "--serve-mesh" in argv:
        metric = "serve_mesh_per_device_flops_ratio_8dev"
    elif "--serve" in argv:
        metric = "serve_rows_per_sec_M1024_Q4_6lik"
    elif "--sweep-m" in argv:
        metric = "svi_steps_per_sec_sweep"
    else:
        metric = _workload_params()[0]
    print(json.dumps({
        "metric": metric, "value": None, "unit": "steps/sec",
        "vs_baseline": None, "attempts": attempts,
        "error": " | ".join(errors),
    }))
    return 1


def main_mesh(n_devices: int = 8):
    """Multi-device scaling check on a virtual CPU mesh (``bench.py --mesh``).

    Runs the sharded scan trainer (small shapes) on 1 device and on an
    n-device ('data',) mesh and reports the per-step times + parallel
    overhead.  This is a correctness/plumbing signal — virtual CPU devices
    share one host's cores, so speedup is NOT expected; the signal is that
    the sharded program compiles, executes, stays finite, and its overhead
    vs 1 device is bounded.  Real-chip scaling uses the same code path.
    """
    # must run before jax initializes a backend — never inherit the TPU pin
    from hetmogp_tpu.parallel.sharding import force_virtual_cpu

    force_virtual_cpu(n_devices)

    import jax
    import jax.numpy as jnp

    from hetmogp_tpu import (Bernoulli, Categorical, Gamma, HetGaussian,
                             ModelConfig, TrainConfig)
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models.params import init_params
    from hetmogp_tpu.parallel import sharding

    liks = (HetGaussian(), Bernoulli(), Categorical(K=3), Gamma())
    T = len(liks)
    N_per, M, Q, B, steps = 8192, 64, 2, 256, 50
    rng = np.random.RandomState(0)
    X_list = [rng.rand(N_per, 1).astype(np.float32) for _ in range(T)]
    Y_list = [rng.randn(N_per, 1),
              (rng.rand(N_per, 1) > 0.5).astype(float),
              rng.randint(1, 4, (N_per, 1)).astype(float),
              rng.gamma(2.0, 1.0, (N_per, 1)) + 1e-3]
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float32")
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    Z = np.linspace(0, 1, M)[:, None].astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg, Z, lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    task_sizes = tuple(int(td.X.shape[0]) for td in dataset)
    optimizer = train_mod.make_optimizer(tc)

    per_dev = {}
    finite = True
    for nd in (1, n_devices):
        mesh = sharding.data_mesh(jax.devices("cpu")[:nd])
        runner = train_mod.make_scan_trainer(
            cfg, tc, task_sizes, tuple([B] * T), vem=True,
            steps_per_call=steps, mesh=mesh)
        ds = sharding.shard_batch(mesh, dataset)
        state = train_mod.init_train_state(
            jax.tree_util.tree_map(jnp.array, params), cfg, optimizer,
            cache_luu=True, fast_projection=tc.fast_projection)
        state, elbos = runner(state, ds, jax.random.PRNGKey(1))  # compile
        jax.block_until_ready(elbos)
        t0 = time.perf_counter()
        state, elbos = runner(state, ds, jax.random.PRNGKey(2))
        jax.block_until_ready(elbos)
        per_dev[nd] = (time.perf_counter() - t0) / steps * 1e3
        finite = finite and bool(np.isfinite(np.asarray(elbos)).all())

    overhead = per_dev[n_devices] / per_dev[1]
    result = {
        "metric": f"mesh_scaling_overhead_{n_devices}dev_virtual_cpu",
        "value": round(overhead, 3),
        "unit": f"x (ms/step {n_devices}dev / 1dev; virtual-CPU plumbing "
                "check, not a speedup measurement)",
        "per_device_ms": {str(k): round(v, 3) for k, v in per_dev.items()},
        "finite": finite,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--worker" in argv:
        worker([a for a in argv if a != "--worker"])
    else:
        sys.exit(supervise(argv))
