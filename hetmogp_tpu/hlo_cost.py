"""Matmul FLOP accounting from compiled-HLO text.

XLA's ``cost_analysis()`` reports one aggregate flop count per program
with two blind spots that made the benchmark's MFU headline
uninterpretable (round-3 verdict):

* **both ``lax.cond`` branches are counted** although exactly one
  executes per step (the trainer's VE/VM alternation), over-counting the
  numerator; and
* the count is **logical f32 flops**, while the TPU executes an f32
  matmul as multiple bfloat16 MXU passes (1 at DEFAULT, 3 at HIGH, 6 at
  HIGHEST precision — the measured pass model behind docs/DESIGN.md §7b),
  so logical flops against the bf16 peak is neither a logical nor a
  physical utilization number.

This module parses the **optimized HLO text** of an already-compiled
program (``jit(f).lower(...).compile().as_text()`` — no extra compile) and
walks its call graph to produce branch-weighted logical and pass-weighted
physical matmul flops:

* every ``dot`` instruction contributes ``2 * prod(out_shape) *
  prod(contracting_dims)`` logical flops, attributed to the computation
  it lives in (fusion bodies included);
* ``fusion``/``call``/``while``/custom-call subcomputations are folded
  into their caller once (a while body is counted once — per-iteration
  cost, matching ``cost_analysis`` semantics);
* ``conditional`` instructions weight their branch computations by
  ``p_true`` (the VE-step fraction) instead of summing both;
* ``operand_precision={...}`` on each dot selects the bf16 pass
  multiplier; bf16/f16 operand dots are 1 pass at any precision.

The orientation convention (which HLO branch is ``lax.cond``'s ``True``)
is covered by tests/test_bench.py against a CPU-compiled cond program.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

# bf16 MXU passes per logical flop for f32-operand dots, by XLA operand
# precision (TPU v5e measured model, docs/DESIGN.md §7b/§7e): DEFAULT
# rounds each operand to bf16 (1 pass), HIGH splits both operands
# (3 passes), HIGHEST adds the low-low term and a second split (6 passes).
PASSES = {"default": 1, "high": 3, "highest": 6}

# computation header: "%name (params...) -> type {" — params may nest
# parens (tuple types), so match greedily and anchor on the trailing "{"
_COMP_RE = re.compile(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*->.*\{\s*$")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\w+)\[([\d,]*)\]")
# dot operands are usually bare references (%name); tolerate an inline type
_DOT_OPS_RE = re.compile(r"\bdot\(\s*(?:\w+\[[\d,]*\][^%]*)?%?([\w.\-]+)")
_LHS_CONTRACT_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")
# TPU canonicalization rewrites batched dots as one-spatial-dim
# convolutions (batch rides the spatial dim via lhs_dilate/stride tricks;
# metadata still names the originating dot_general).  The dilation zeros
# do no real work: logical flops = 2 * prod(out) * rhs input-feature size.
_CONV_OPS_RE = re.compile(
    r"\bconvolution\(\s*(?:\w+\[[\d,]*\][^%]*)?%?([\w.\-]+),"
    r"\s*(?:\w+\[[\d,]*\][^%]*)?%?([\w.\-]+)")
_DIM_LABELS_RE = re.compile(r"dim_labels=\w+_(\w+)->")
_PRECISION_RE = re.compile(r"operand_precision=\{(\w+),\s*(\w+)\}")
_CALL_ATTR_RE = re.compile(
    r"(?:calls|to_apply|condition)=%?([\w.\-]+)")
_BODY_ATTR_RE = re.compile(r"\bbody=%?([\w.\-]+)")
_COLL_RE = re.compile(
    r"=\s*(\(?[^=]*?)"
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")
_SHAPE_RE = re.compile(r"\w+\[([\d,]*)\]")
_TRUE_COMP_RE = re.compile(r"true_computation=%?([\w.\-]+)")
_FALSE_COMP_RE = re.compile(r"false_computation=%?([\w.\-]+)")
_BRANCHES_RE = re.compile(r"branch_computations=\{([^}]*)\}")


def _prod(dims: str) -> int:
    out = 1
    for d in dims.split(","):
        d = d.strip()
        if d:
            out *= int(d)
    return out


class _Computation:
    __slots__ = ("dots", "calls", "fusion_calls", "conds", "bodies",
                 "colls", "copies")

    def __init__(self):
        self.dots: List[Tuple[float, int]] = []  # (logical flops, passes)
        self.calls: List[str] = []
        # computations called BY a fusion instruction (fused bodies) —
        # copies inside these are free element-wise identities unless they
        # are the fusion root (a materialized relayout at the output)
        self.fusion_calls: List[str] = []
        # (true_comp, false_comp) per conditional instruction
        self.conds: List[Tuple[str, str]] = []
        self.bodies: List[str] = []  # while-loop body computations
        # (kind, output elements) per collective instruction
        self.colls: List[Tuple[str, int]] = []
        # (bytes, "dtype[dims]", is_root) per copy instruction
        self.copies: List[Tuple[int, str, bool]] = []


# bytes per element by HLO dtype tag
_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16,
                "f32": 4, "s32": 4, "u32": 4,
                "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}


def _dtype_bytes(tag: str) -> float:
    """Bytes per element for an HLO dtype tag.  f8 variants
    (f8e4m3fn/f8e5m2/...) are 1 byte; s4/u4 are half a byte; unknown tags
    default to 4."""
    if tag in _DTYPE_BYTES:
        return _DTYPE_BYTES[tag]
    if tag.startswith("f8"):
        return 1
    if tag in ("s4", "u4"):
        return 0.5
    return 4


# async copy: "%cs = (f32[...]{...}, f32[...]{...}, u32[]) copy-start(%op)"
# — tuple-shaped output, so _INSTR_RE does not match; grab the first tuple
# element (the destination buffer).  copy-done is the completion token of
# the same transfer and is not counted again.
_COPY_START_RE = re.compile(r"=\s*\(\s*(\w+)\[([\d,]*)\]")


def _parse_module(text: str) -> Dict[str, _Computation]:
    comps: Dict[str, _Computation] = {}
    current: Optional[_Computation] = None
    symbols: Dict[str, Tuple[str, str]] = {}  # %name -> (dtype, dims)
    for line in text.splitlines():
        m = _COMP_RE.match(line)
        if m:
            current = comps.setdefault(m.group(1), _Computation())
            symbols = {}
            continue
        if current is None:
            continue
        if line.strip() == "}":
            current = None
            continue
        im = _INSTR_RE.match(line)
        if im:
            symbols[im.group(1)] = (im.group(2), im.group(3))
            # layout copies are real HBM read+write traffic (bitcasts are
            # free reinterpretations and are NOT counted)
            if " copy(" in line:
                nbytes = _prod(im.group(3)) * _dtype_bytes(im.group(2))
                current.copies.append(
                    (nbytes, f"{im.group(2)}[{im.group(3)}]",
                     line.lstrip().startswith("ROOT")))
        elif " copy-start(" in line:
            # async cross-stream relayout: tuple-shaped output, first
            # element is the destination buffer (copy-done not re-counted)
            cs = _COPY_START_RE.search(line)
            if cs:
                nbytes = _prod(cs.group(2)) * _dtype_bytes(cs.group(1))
                current.copies.append(
                    (nbytes, f"{cs.group(1)}[{cs.group(2)}]", True))
        if " convolution(" in line and im:
            om = _CONV_OPS_RE.search(line)
            dm = _DIM_LABELS_RE.search(line)
            if om and dm:
                lhs_dtype, _ = symbols.get(om.group(1), ("f32", ""))
                _, rhs_dims = symbols.get(om.group(2), ("f32", ""))
                rhs_spec = dm.group(1)
                if rhs_dims and "i" in rhs_spec:
                    rhs_shape = [int(d) for d in rhs_dims.split(",") if d]
                    contract = rhs_shape[rhs_spec.index("i")]
                    flops = 2.0 * _prod(im.group(3)) * contract
                    pm = _PRECISION_RE.search(line)
                    prec = pm.group(1).lower() if pm else "default"
                    passes = (1 if lhs_dtype in ("bf16", "f16", "s8", "u8")
                              else PASSES.get(prec, 1))
                    current.dots.append((flops, passes))
            continue
        if " dot(" in line and im:
            out_dtype, out_dims = im.group(2), im.group(3)
            om = _DOT_OPS_RE.search(line)
            lhs_dtype, lhs_dims = symbols.get(om.group(1), ("f32", "")) \
                if om else ("f32", "")
            cm = _LHS_CONTRACT_RE.search(line)
            contract = 1
            if cm and cm.group(1) and lhs_dims:
                lhs_shape = [int(d) for d in lhs_dims.split(",") if d]
                for i in cm.group(1).split(","):
                    contract *= lhs_shape[int(i)]
            flops = 2.0 * _prod(out_dims) * contract
            pm = _PRECISION_RE.search(line)
            prec = pm.group(1).lower() if pm else "default"
            # sub-f32 operand dots are single-pass at any precision
            passes = (1 if lhs_dtype in ("bf16", "f16", "s8", "u8")
                      else PASSES.get(prec, 1))
            current.dots.append((flops, passes))
        # conditional branches: weighted, not summed
        tm = _TRUE_COMP_RE.search(line)
        fm = _FALSE_COMP_RE.search(line)
        if tm and fm:
            current.conds.append((tm.group(1), fm.group(1)))
            continue
        bm = _BRANCHES_RE.search(line)
        if bm:
            names = [n.strip().lstrip("%")
                     for n in bm.group(1).split(",") if n.strip()]
            if len(names) == 2:
                # lax.cond lowers pred to a {0, 1} branch index with
                # index 1 == True (validated by tests/test_bench.py)
                current.conds.append((names[1], names[0]))
            else:
                # lax.switch: no true/false semantics — average uniformly
                # by chaining pairwise (rare; not used by the trainer)
                current.calls.extend(names)
            continue
        is_fusion = " fusion(" in line
        for cm in _CALL_ATTR_RE.finditer(line):
            (current.fusion_calls if is_fusion else
             current.calls).append(cm.group(1))
        bm2 = _BODY_ATTR_RE.search(line)
        if bm2:
            current.bodies.append(bm2.group(1))
        km = _COLL_RE.search(line)
        if km:
            # tuple-typed collectives (multi-operand all-reduce, async
            # -start forms): record the LARGEST element of the tuple
            elems = max((_prod(s) for s in
                         _SHAPE_RE.findall(km.group(1))), default=1)
            current.colls.append((km.group(2), elems))
    return comps


def scan_body_collectives(text: str) -> List[Tuple[str, int]]:
    """Collectives executed PER STEP: every (kind, output elements) inside
    a while-loop body (the scan trainer's step), fusion/cond/nested-call
    bodies included.  Collectives outside any while body (one-time dataset
    distribution, final output gathers) are excluded — they amortize over
    steps_per_call and do not bound scaling.

    The communication-structure regression test (tests/test_sharding.py)
    asserts on this: per-step reductions must stay scalar/batch-sized and
    nothing may all-gather (Q, M, M)-sized state on the data axis.
    """
    comps = _parse_module(text)
    bodies = [b for c in comps.values() for b in c.bodies]
    seen: set = set()
    out: List[Tuple[str, int]] = []

    def walk(name: str):
        if name in seen or name not in comps:
            return
        seen.add(name)
        c = comps[name]
        out.extend(c.colls)
        for x in c.calls + c.fusion_calls + c.bodies:
            walk(x)
        for t_comp, f_comp in c.conds:
            walk(t_comp)
            walk(f_comp)

    for b in bodies:
        walk(b)
    return out


def scan_body_copy_bytes(text: str, p_true: Optional[float] = None) -> dict:
    """Per-step layout-copy HBM traffic: total bytes of every ``copy``
    instruction inside a while-loop body (the scan trainer's step),
    fusion/cond/nested-call bodies included.

    A ``copy`` in optimized TPU HLO is a physical relayout (e.g. the
    ``{1,2,0}`` <-> ``{2,1,0}`` transposes XLA inserts when the same
    (Q, M, M) buffer is consumed under two matmul layouts, or at a scan
    carry whose fixed layout differs from the compute's preference).  Each
    copy reads and writes its buffer once, so its wall cost is
    ``2 * bytes / HBM_bandwidth``.  ``bitcast`` is a free reinterpretation
    and is not counted.  Async relayouts (``copy-start``/``copy-done``
    pairs) are counted once, at the start op, by their destination buffer.
    A copy fused into a loop fusion is a free element-wise identity inside
    the fusion's existing traffic and is NOT counted — unless it is the
    fusion's root, where it materializes a relayout at the output.

    A computation reachable along several paths (e.g. shared by both
    branches of a ``conditional``) is priced at the SUM of the path
    weights, matching what actually executes.

    Args:
      text: ``compiled.as_text()`` of an XLA executable.
      p_true: probability weight of each ``conditional``'s True branch
        (0.8 for the trainer's 4:1 VE:VM alternation); None sums both.

    Returns ``{"bytes": weighted total, "n_copies": unweighted count,
    "by_shape": {"dtype[dims]": weighted bytes}}`` — ``by_shape`` is
    sorted largest-first for direct use in perf reports.
    """
    comps = _parse_module(text)
    bodies = list(dict.fromkeys(
        b for c in comps.values() for b in c.bodies))

    def _reach(start: str) -> set:
        seen: set = set()
        stack = [start]
        while stack:
            nm = stack.pop()
            if nm in seen or nm not in comps:
                continue
            seen.add(nm)
            c = comps[nm]
            stack.extend(c.calls + c.fusion_calls + c.bodies)
            for t_comp, f_comp in c.conds:
                stack.extend((t_comp, f_comp))
        return seen

    # start only from ROOT bodies (not reachable from another body):
    # nested while bodies are then counted exactly once, through their
    # parent's call edge, with the parent's weight
    reach = {b: _reach(b) for b in bodies}
    roots = [b for b in bodies
             if not any(b in reach[a] for a in bodies if a != b)]

    total = 0.0
    n = 0
    by: Dict[str, float] = {}
    counted: set = set()  # computations whose copies entered n already

    def walk(name: str, weight: float, in_fusion: bool):
        nonlocal total, n
        if name not in comps:
            return
        first = name not in counted
        counted.add(name)
        c = comps[name]
        for nbytes, shape, is_root in c.copies:
            if in_fusion and not is_root:
                continue  # fused identity — free
            total += weight * nbytes
            if first:
                n += 1
            by[shape] = by.get(shape, 0.0) + weight * nbytes
        for callee in c.calls + c.bodies:
            walk(callee, weight, in_fusion)
        for callee in c.fusion_calls:
            walk(callee, weight, True)
        for t_comp, f_comp in c.conds:
            wt, wf = (1.0, 1.0) if p_true is None else (p_true, 1.0 - p_true)
            walk(t_comp, weight * wt, in_fusion)
            walk(f_comp, weight * wf, in_fusion)

    for b in roots:
        walk(b, 1.0, False)
    return {"bytes": total, "n_copies": n,
            "by_shape": dict(sorted(by.items(), key=lambda kv: -kv[1]))}


def _entry_name(text: str) -> Optional[str]:
    for line in text.splitlines():
        if line.lstrip().startswith("ENTRY"):
            m = _COMP_RE.match(line)
            if m:
                return m.group(1)
    return None


def matmul_flops(text: str, p_true: Optional[float] = None,
                 branch_max: bool = False) -> dict:
    """Walk a compiled-HLO module's call graph and total its dot flops.

    Args:
      text: ``compiled.as_text()`` of an XLA executable.
      p_true: probability weight of each ``conditional``'s True branch
        (e.g. 0.8 for the trainer's 4:1 VE:VM alternation).  None sums
        both branches.
      branch_max: count each conditional as its LARGER branch by logical
        flops — mirrors XLA ``cost_analysis`` semantics on TPU (measured:
        a cond with dots in both branches reports only the bigger one), so
        ``cost_analysis_flops - matmul_flops(txt, branch_max=True)
        ['logical']`` isolates the program's non-matmul flop remainder.
        Mutually exclusive with ``p_true``.

    Returns a dict:
      ``logical``: branch-weighted logical matmul flops,
      ``physical``: the same weighted by bf16 MXU passes per dot,
      ``by_passes``: {pass multiplier: logical flops} breakdown,
      ``n_dots``: number of dot instructions seen (0 => parse found none
        and the caller should fall back to cost_analysis).
    """
    comps = _parse_module(text)
    entry = _entry_name(text)
    if entry is None or entry not in comps:
        return {"logical": 0.0, "physical": 0.0, "by_passes": {}, "n_dots": 0}

    memo: Dict[str, Tuple[float, float, Dict[int, float], int]] = {}

    def walk(name: str, stack=()):  # (logical, physical, by_passes, n)
        if name in memo:
            return memo[name]
        if name not in comps or name in stack:
            return (0.0, 0.0, {}, 0)
        c = comps[name]
        lg = ph = 0.0
        byp: Dict[int, float] = {}
        n = 0
        for flops, passes in c.dots:
            lg += flops
            ph += flops * passes
            byp[passes] = byp.get(passes, 0.0) + flops
            n += 1
        stack = stack + (name,)
        for callee in c.calls + c.fusion_calls + c.bodies:
            clg, cph, cbyp, cn = walk(callee, stack)
            lg += clg
            ph += cph
            n += cn
            for k, v in cbyp.items():
                byp[k] = byp.get(k, 0.0) + v
        for t_comp, f_comp in c.conds:
            tlg, tph, tbyp, tn = walk(t_comp, stack)
            flg, fph, fbyp, fn = walk(f_comp, stack)
            if branch_max:
                wt, wf = (1.0, 0.0) if tlg >= flg else (0.0, 1.0)
            elif p_true is None:
                wt, wf = 1.0, 1.0
            else:
                wt, wf = p_true, 1.0 - p_true
            lg += wt * tlg + wf * flg
            ph += wt * tph + wf * fph
            n += tn + fn
            for k, v in tbyp.items():
                byp[k] = byp.get(k, 0.0) + wt * v
            for k, v in fbyp.items():
                byp[k] = byp.get(k, 0.0) + wf * v
        memo[name] = (lg, ph, byp, n)
        return memo[name]

    lg, ph, byp, n = walk(entry)
    return {"logical": lg, "physical": ph,
            "by_passes": {int(k): float(v) for k, v in sorted(byp.items())},
            "n_dots": n}
