"""Chaos tests for the bench supervisor (VERDICT r2 #1).

Two of the first four driver artifacts were lost to transient TPU backend
failures (libtpu client/runtime skew -> FAILED_PRECONDITION) even though
the workload itself was healthy.  bench.py now supervises the workload in
fresh subprocesses with bounded retries and cache bypass; these tests
inject failures and assert (a) the retry path recovers and (b) the final-
failure artifact still parses.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

BENCH = str(Path(__file__).resolve().parent.parent / "bench.py")


def _run(env_extra, timeout=600):
    env = os.environ.copy()
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, env=env)


def _json_lines(stdout):
    return [json.loads(l) for l in stdout.splitlines()
            if l.strip().startswith("{")]


def test_bench_retries_past_injected_failures():
    """Two injected failures, third attempt runs the tiny CPU workload:
    the supervisor must recover and report attempts=3."""
    proc = _run({"HETMOGP_BENCH_TINY": "1",
                 "HETMOGP_BENCH_INJECT_FAIL": "2",
                 "HETMOGP_BENCH_ATTEMPTS": "3"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    (rec,) = _json_lines(proc.stdout)
    assert rec["metric"] == "svi_steps_per_sec_tiny"
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["attempts"] == 3
    # the retries announced the fresh-cache path
    assert "fresh compile cache" in proc.stderr


def test_bench_final_failure_still_emits_parseable_json():
    """All attempts fail: rc=1 but stdout carries one valid JSON line with
    value null and a populated error field (the round-2 artifact was a bare
    crash traceback)."""
    proc = _run({"HETMOGP_BENCH_TINY": "1",
                 "HETMOGP_BENCH_INJECT_FAIL": "3",
                 "HETMOGP_BENCH_ATTEMPTS": "3"}, timeout=300)
    assert proc.returncode == 1
    (rec,) = _json_lines(proc.stdout)
    assert rec["value"] is None
    assert rec["attempts"] == 3
    assert "injected failure" in rec["error"]


def test_quick_mode_has_its_own_metric_name():
    """Quick mode must never masquerade as the flagship metric (round-2
    weak #6) — checked without running the workload."""
    sys.path.insert(0, str(Path(BENCH).parent))
    try:
        import importlib

        bench = importlib.import_module("bench")
        env0 = {k: os.environ.pop(k, None)
                for k in ("HETMOGP_BENCH_QUICK", "HETMOGP_BENCH_TINY")}
        try:
            full_name = bench._workload_params()[0]
            os.environ["HETMOGP_BENCH_QUICK"] = "1"
            quick_name = bench._workload_params()[0]
        finally:
            for k, v in env0.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        assert quick_name != full_name
        assert "quick" in quick_name
    finally:
        sys.path.pop(0)


def test_hlo_cost_cond_orientation_and_passes():
    """hlo_cost.matmul_flops: dots are attributed to the correct lax.cond
    branch (p_true=1 must see the True-branch dot, p_true=0 must not) with
    exact flop counts and precision-dependent pass multipliers — the
    branch-index convention this encodes (index 1 == True) is what the
    bench's 4:1 VE:VM weighting relies on."""
    import jax
    import jax.numpy as jnp

    from hetmogp_tpu import hlo_cost

    A = jnp.ones((8, 64, 64), jnp.float32)

    def make(prec):
        def big(x):
            return jnp.matmul(x, x, precision=prec).sum()

        def small(x):
            return x.sum()

        def f(pred, x):
            return jax.lax.cond(pred, big, small, x)

        return jax.jit(f).lower(jnp.asarray(True), A).compile().as_text()

    dot_flops = 2 * 8 * 64 * 64 * 64
    for prec, passes in ((jax.lax.Precision.HIGHEST, 6),
                         (jax.lax.Precision.HIGH, 3),
                         (jax.lax.Precision.DEFAULT, 1)):
        txt = make(prec)
        t = hlo_cost.matmul_flops(txt, p_true=1.0)
        f_ = hlo_cost.matmul_flops(txt, p_true=0.0)
        both = hlo_cost.matmul_flops(txt)
        assert t["n_dots"] >= 1
        assert t["logical"] == dot_flops, prec
        assert f_["logical"] == 0.0, prec
        assert both["logical"] == dot_flops
        assert t["physical"] == dot_flops * passes, prec
        assert t["by_passes"] == {passes: dot_flops}
        # weighted value interpolates; branch_max picks the bigger branch
        w = hlo_cost.matmul_flops(txt, p_true=0.8)
        assert abs(w["logical"] - 0.8 * dot_flops) < 1e-6
        mx = hlo_cost.matmul_flops(txt, branch_max=True)
        assert mx["logical"] == dot_flops


def test_workload_flop_accounting_is_branch_weighted():
    """run_workload's flop fields: the branch-weighted per-step flops must
    sit strictly below the raw XLA count (round-3 verdict weak #1 — the
    raw number uses max-branch semantics, the weighted one averages the
    VE/VM branches 4:1) and the matmul pass breakdown must be present."""
    import bench

    r = bench.run_workload("tiny_flops_check", N_per=1000, M=32, Q=2, B=64,
                           steps_per_call=4, calls=1)
    assert "flops_per_step" in r and "flops_xla_raw" in r
    assert 0 < r["flops_per_step"] < r["flops_xla_raw"]
    assert "matmul_by_passes" in r or "mfu_physical" not in r


def test_workload_auto_shards_on_multidevice_host():
    """With >1 visible device, run_workload runs the sharded scan-trainer
    path over a ('data',) mesh (the v5e-8 target) and records the device
    count; the conftest's 8 virtual CPU devices stand in for real chips."""
    import jax

    import bench

    assert jax.device_count() == 8
    r = bench.run_workload("tiny_mesh_check", N_per=1000, M=32, Q=2, B=64,
                           steps_per_call=4, calls=2)
    assert r["devices"] == 8
    assert r["value"] is not None and r["value"] > 0


def test_serve_mode_runs_and_reports_rows_per_sec():
    """--serve workload (observation-space predictive throughput) executes
    on the test host's virtual devices and reports a positive rate."""
    import bench

    r = bench.run_serve("serve_tiny", N_total=2048, M=32, Q=2, chunk=256)
    assert r["unit"] == "rows/sec"
    assert r["value"] > 0
    assert r["devices"] == 8  # sharded path on the virtual mesh


def test_hlo_cost_counts_scan_body_once():
    """A lax.scan's body dots must be counted ONCE (per-step semantics,
    matching cost_analysis), regardless of trip count."""
    import jax
    import jax.numpy as jnp

    from hetmogp_tpu import hlo_cost

    A = jnp.ones((64, 64), jnp.float32)

    def make(n):
        def f(x):
            def body(c, _):
                return jnp.matmul(c, x, precision=jax.lax.Precision.HIGH), ()
            c, _ = jax.lax.scan(body, x, None, length=n)
            return c.sum()

        txt = jax.jit(f).lower(A).compile().as_text()
        return hlo_cost.matmul_flops(txt)

    dot = 2 * 64 ** 3
    r3, r7 = make(3), make(7)
    assert r3["n_dots"] >= 1
    assert r3["logical"] == r7["logical"] == dot
    assert r3["physical"] == 3 * dot  # HIGH = 3 passes


def test_scan_body_copy_bytes_scopes_and_weights():
    """scan_body_copy_bytes counts layout-copy bytes ONLY inside while
    bodies, weights lax.cond branches by p_true, prices bf16 at 2
    bytes/element, and ignores bitcasts and copies outside the loop."""
    from hetmogp_tpu import hlo_cost

    txt = """
HloModule m

%ve_branch (p0: f32[8,8]) -> f32[8,8] {
  %p0 = f32[8,8]{1,0} parameter(0)
  ROOT %cp_ve = f32[8,8]{1,0} copy(%p0)
}

%vm_branch (p1: f32[8,8]) -> f32[8,8] {
  %p1 = f32[8,8]{1,0} parameter(0)
  %cp_vm1 = f32[4,4]{1,0} copy(%p1)
  ROOT %cp_vm2 = f32[4,4]{1,0} copy(%p1)
}

%loop_cond (c0: f32[8,8]) -> pred[] {
  %c0 = f32[8,8]{1,0} parameter(0)
  ROOT %lt = pred[] constant(true)
}

%loop_body (c1: f32[8,8]) -> f32[8,8] {
  %c1 = f32[8,8]{1,0} parameter(0)
  %cp_body = bf16[8,8]{1,0} copy(%c1)
  %bc = f32[8,8]{1,0} bitcast(%c1)
  %idx = s32[] constant(1)
  ROOT %cond = f32[8,8]{1,0} conditional(%idx, %c1, %c1), true_computation=%ve_branch, false_computation=%vm_branch
}

ENTRY %main (a: f32[8,8]) -> f32[8,8] {
  %a = f32[8,8]{1,0} parameter(0)
  %cp_outside = f32[100]{0} copy(%a)
  ROOT %w = f32[8,8]{1,0} while(%a), condition=%loop_cond, body=%loop_body
}
"""
    ve = 8 * 8 * 4            # one f32[8,8] copy in the True branch
    vm = 2 * 4 * 4 * 4        # two f32[4,4] copies in the False branch
    body = 8 * 8 * 2          # one bf16[8,8] copy in the body proper

    both = hlo_cost.scan_body_copy_bytes(txt)
    assert both["bytes"] == body + ve + vm
    assert both["n_copies"] == 4  # %cp_outside and %bc excluded
    assert "f32[100]" not in both["by_shape"]

    w = hlo_cost.scan_body_copy_bytes(txt, p_true=0.8)
    assert abs(w["bytes"] - (body + 0.8 * ve + 0.2 * vm)) < 1e-9
    assert abs(w["by_shape"]["f32[8,8]"] - 0.8 * ve) < 1e-9

    ve_only = hlo_cost.scan_body_copy_bytes(txt, p_true=1.0)
    assert ve_only["bytes"] == body + ve


def test_scan_body_copy_bytes_async_fusion_and_shared_branches():
    """Round-4 advisor items: (1) async copy-start transfers are counted by
    their destination buffer, once; (2) a computation shared by BOTH
    branches of a conditional is priced at the sum of the branch weights,
    not first-visit-wins; (3) copies fused into a loop fusion are free
    unless they are the fusion root; (4) f8/s4 dtype tags get real widths
    instead of the 4-byte default."""
    from hetmogp_tpu import hlo_cost

    txt = """
HloModule m

%shared (s0: f32[8,8]) -> f32[8,8] {
  %s0 = f32[8,8]{1,0} parameter(0)
  ROOT %cp_sh = f32[8,8]{1,0} copy(%s0)
}

%ve_branch (p0: f32[8,8]) -> f32[8,8] {
  %p0 = f32[8,8]{1,0} parameter(0)
  ROOT %cv = f32[8,8]{1,0} call(%p0), to_apply=%shared
}

%vm_branch (p1: f32[8,8]) -> f32[8,8] {
  %p1 = f32[8,8]{1,0} parameter(0)
  ROOT %cm = f32[8,8]{1,0} call(%p1), to_apply=%shared
}

%fused_free (f0: f32[16]) -> f32[16] {
  %f0 = f32[16]{0} parameter(0)
  %cp_mid = f32[16]{0} copy(%f0)
  ROOT %ad = f32[16]{0} add(%cp_mid, %f0)
}

%fused_rootcopy (g0: f8e4m3fn[32]) -> f8e4m3fn[32] {
  %g0 = f8e4m3fn[32]{0} parameter(0)
  ROOT %cp_root = f8e4m3fn[32]{0} copy(%g0)
}

%loop_cond (c0: f32[8,8]) -> pred[] {
  %c0 = f32[8,8]{1,0} parameter(0)
  ROOT %lt = pred[] constant(true)
}

%loop_body (c1: f32[8,8]) -> f32[8,8] {
  %c1 = f32[8,8]{1,0} parameter(0)
  %cs = (s4[64]{0}, s4[64]{0}, u32[]) copy-start(%c1)
  %cd = s4[64]{0} copy-done(%cs)
  %fu1 = f32[16]{0} fusion(%c1), kind=kLoop, calls=%fused_free
  %fu2 = f8e4m3fn[32]{0} fusion(%c1), kind=kLoop, calls=%fused_rootcopy
  %idx = s32[] constant(1)
  ROOT %cond = f32[8,8]{1,0} conditional(%idx, %c1, %c1), true_computation=%ve_branch, false_computation=%vm_branch
}

ENTRY %main (a: f32[8,8]) -> f32[8,8] {
  %a = f32[8,8]{1,0} parameter(0)
  ROOT %w = f32[8,8]{1,0} while(%a), condition=%loop_cond, body=%loop_body
}
"""
    async_bytes = 64 * 0.5          # s4[64] copy-start destination
    root_fused = 32 * 1             # f8e4m3fn[32] fusion-root copy
    shared = 8 * 8 * 4              # f32[8,8] copy in %shared

    # p_true=None sums both branches: %shared executes twice per step
    both = hlo_cost.scan_body_copy_bytes(txt)
    assert both["bytes"] == async_bytes + root_fused + 2 * shared
    # %cp_mid (fused identity) and %cd (copy-done) excluded; n is the
    # static instruction count: copy-start, fusion-root copy, shared copy
    assert both["n_copies"] == 3

    # weighted: shared gets p_true + (1 - p_true) = 1.0, NOT
    # first-visit-wins 0.8
    w = hlo_cost.scan_body_copy_bytes(txt, p_true=0.8)
    assert abs(w["bytes"] - (async_bytes + root_fused + shared)) < 1e-9
    assert abs(w["by_shape"]["f32[8,8]"] - shared) < 1e-9
