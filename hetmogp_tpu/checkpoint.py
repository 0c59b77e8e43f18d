"""Checkpoint / resume.

The reference has no persistence at all (SURVEY.md §5).  Here: a plain
``.npz`` save/restore of the parameter pytree, optimizer state, RNG key and
step counter — dependency-free and enough for single-host training.  (Orbax
is available in the environment for multi-host use; the npz format keeps
checkpoints portable and inspectable.)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np

from hetmogp_tpu.models.params import SVMOGPParams


def _normalize(path) -> Path:
    """np.savez always appends '.npz' to suffix-less names; pin the suffix on
    both save and load so save('ckpt') + load('ckpt') round-trips."""
    path = Path(path)
    return path if path.suffix == ".npz" else path.with_suffix(path.suffix + ".npz")


def save_checkpoint(path, params: SVMOGPParams, opt_state: Any = None,
                    step: int = 0, extra: Optional[dict] = None,
                    rng_key=None):
    """Save (params, opt_state, step, extra, rng_key) as one .npz.

    extra must be JSON-serializable (no arrays); the training RNG key goes
    through ``rng_key`` (stored as an array) so mid-training resume can
    continue the minibatch/MC sampling stream.
    """
    if extra and "rng_key" in extra:
        raise ValueError(
            "extra['rng_key'] is reserved: pass the training key via the "
            "rng_key kwarg (load_checkpoint returns it as extra['rng_key'])")
    path = _normalize(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    p_leaves, _ = jax.tree_util.tree_flatten(params)
    for i, leaf in enumerate(p_leaves):
        arrays[f"param_{i}"] = np.asarray(leaf)
    n_opt = 0
    if opt_state is not None:
        o_leaves, _ = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(o_leaves):
            arrays[f"opt_{i}"] = np.asarray(leaf)
        n_opt = len(o_leaves)
    if rng_key is not None:
        arrays["_rng_key"] = np.asarray(rng_key)
    meta = {"step": int(step), "n_opt": n_opt, "extra": extra or {}}
    arrays["_meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path, params_template: SVMOGPParams,
                    opt_state_template: Any = None
                    ) -> Tuple[SVMOGPParams, Any, int, dict]:
    """Restore (params, opt_state, step, extra) using pytree templates for
    structure (shapes are validated against the saved arrays)."""
    with np.load(_normalize(path), allow_pickle=False) as z:
        meta = json.loads(bytes(z["_meta"]).decode())
        p_leaves, p_def = jax.tree_util.tree_flatten(params_template)
        new_p = []
        for i, leaf in enumerate(p_leaves):
            arr = z[f"param_{i}"]
            if arr.shape != tuple(np.shape(leaf)):
                raise ValueError(
                    f"checkpoint param {i} shape {arr.shape} != template "
                    f"{np.shape(leaf)}")
            new_p.append(arr.astype(np.asarray(leaf).dtype))
        params = jax.tree_util.tree_unflatten(p_def, new_p)
        opt_state = None
        if opt_state_template is not None and meta["n_opt"]:
            o_leaves, o_def = jax.tree_util.tree_flatten(opt_state_template)
            new_o = []
            for i, leaf in enumerate(o_leaves):
                arr = z[f"opt_{i}"]
                tmpl = np.asarray(leaf)
                if arr.shape != tmpl.shape:
                    raise ValueError(
                        f"checkpoint opt_state leaf {i} shape {arr.shape} != "
                        f"template {tmpl.shape}")
                new_o.append(arr.astype(tmpl.dtype))
            opt_state = jax.tree_util.tree_unflatten(o_def, new_o)
        extra = dict(meta["extra"])
        if "_rng_key" in z.files:
            extra["rng_key"] = np.array(z["_rng_key"])
        return params, opt_state, meta["step"], extra
