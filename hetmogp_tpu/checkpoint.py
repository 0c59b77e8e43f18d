"""Checkpoint / resume.

The reference has no persistence at all (SURVEY.md §5).  Two formats:

* ``save_checkpoint``/``load_checkpoint`` — a plain ``.npz`` of the
  parameter pytree, optimizer state, RNG key and step counter:
  dependency-free, portable, inspectable; enough for single-host training.
* ``save_checkpoint_sharded``/``load_checkpoint_sharded`` — Orbax-backed,
  for mesh-sharded training state: saving gathers sharded jax.Arrays
  through Orbax's array serialization (multi-host safe), and restoring
  with ``mesh=`` places every leaf DIRECTLY at its mesh sharding (the
  latent-axis layout from ``parallel.sharding.state_shardings``) with no
  host-side replication round-trip — each device reads only its shard.
"""

from __future__ import annotations

import json
import shutil
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


def peek_meta(path) -> dict:
    """Read an npz checkpoint's metadata (step/n_opt/extra) without touching
    the arrays — lets a caller build the right templates before
    ``load_checkpoint`` (e.g. ``SVMOGP.load`` reconstructing the config)."""
    with np.load(_normalize(path), allow_pickle=False) as z:
        return json.loads(bytes(z["_meta"]).decode())


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


# ---------------------------------------------------------------------------
# Orbax-backed sharded checkpointing (multi-chip training state)
# ---------------------------------------------------------------------------

def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    return ocp, ocp.Checkpointer(ocp.StandardCheckpointHandler())


def save_checkpoint_sharded(path, params: SVMOGPParams, opt_state: Any = None,
                            step: int = 0, extra: Optional[dict] = None,
                            rng_key=None):
    """Orbax checkpoint of a (possibly mesh-sharded) training state.

    Accepts the same payload as ``save_checkpoint`` but writes an Orbax
    directory instead of an npz: sharded jax.Arrays are serialized shard by
    shard (no host gather of the full array is required on multi-host
    setups).  Overwriting an existing checkpoint at ``path`` is crash-safe:
    the new checkpoint is written to a sibling ``<name>.tmp`` directory
    first and only swapped in once complete, so a crash mid-save always
    leaves either the old or the new checkpoint intact at ``path`` (plus
    possibly a ``.tmp``/``.old`` leftover, which the next save reclaims).
    The swap is a host-side rename on this process's filesystem view.
    extra must be JSON-serializable; the RNG key goes through ``rng_key``
    (returned by the loader as ``extra['rng_key']``).
    """
    if extra and "rng_key" in extra:
        raise ValueError(
            "extra['rng_key'] is reserved: pass the training key via the "
            "rng_key kwarg (load_checkpoint_sharded returns it as "
            "extra['rng_key'])")
    ocp, ckptr = _orbax_checkpointer()
    tree = {"params": params,
            "step": np.asarray(int(step)),
            "extra": np.frombuffer(json.dumps(extra or {}).encode(),
                                   dtype=np.uint8)}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if rng_key is not None:
        tree["rng_key"] = np.asarray(rng_key)
    path = Path(path).resolve()
    tmp = path.with_name(path.name + ".tmp")
    ckptr.save(tmp, args=ocp.args.StandardSave(tree), force=True)
    # the sync Checkpointer blocks; tolerate an async drop-in
    getattr(ckptr, "wait_until_finished", lambda: None)()
    # swap: the old checkpoint survives until the new one is fully on disk
    old = path.with_name(path.name + ".old")
    if old.exists():
        shutil.rmtree(old)
    if path.exists():
        path.rename(old)
    tmp.rename(path)
    shutil.rmtree(old, ignore_errors=True)


def _leaf_dtype(leaf):
    return getattr(leaf, "dtype", None) or np.asarray(leaf).dtype


def load_checkpoint_sharded(path, params_template: SVMOGPParams,
                            opt_state_template: Any = None, mesh=None
                            ) -> Tuple[SVMOGPParams, Any, int, dict]:
    """Restore an Orbax checkpoint written by ``save_checkpoint_sharded``.

    With ``mesh=`` the restored leaves are placed directly at the mesh's
    shardings — params and params-shaped optimizer moments on the latent
    axis per ``parallel.sharding.state_shardings``, everything else
    replicated — so resuming a 2-D ('data','latent') run never materializes
    a replicated copy.  Without a mesh, leaves restore to the default
    device.  Returns ``(params, opt_state, step, extra)`` like
    ``load_checkpoint``; shapes are validated by Orbax against the saved
    arrays.
    """
    import jax.numpy as jnp  # noqa: F401  (kept light: only sharding below)
    from jax.sharding import NamedSharding, PartitionSpec, SingleDeviceSharding

    ocp, ckptr = _orbax_checkpointer()
    path = Path(path).resolve()
    saved = ckptr.metadata(path).item_metadata.tree
    if "opt_state" in saved and opt_state_template is None:
        raise ValueError(
            "checkpoint contains opt_state: pass opt_state_template")
    if "opt_state" not in saved and opt_state_template is not None:
        raise ValueError("checkpoint has no opt_state but a template was "
                         "passed")

    if mesh is not None:
        from hetmogp_tpu.parallel import sharding as sharding_mod
        from hetmogp_tpu.train import TrainState

        st = TrainState(params=params_template, opt_state=opt_state_template,
                        step=np.asarray(0))
        st_sh = sharding_mod.state_shardings(mesh, st)
        params_sh, opt_sh = st_sh.params, st_sh.opt_state
        rep = NamedSharding(mesh, PartitionSpec())
    else:
        rep = SingleDeviceSharding(jax.devices()[0])
        params_sh = jax.tree_util.tree_map(lambda _: rep, params_template)
        opt_sh = jax.tree_util.tree_map(lambda _: rep, opt_state_template)

    def abstract(leaf, sh):
        return jax.ShapeDtypeStruct(np.shape(leaf), _leaf_dtype(leaf),
                                    sharding=sh)

    def meta_abstract(m):
        return jax.ShapeDtypeStruct(tuple(m.shape), np.dtype(m.dtype),
                                    sharding=rep)

    tree = {"params": jax.tree_util.tree_map(abstract, params_template,
                                             params_sh),
            "step": meta_abstract(saved["step"]),
            "extra": meta_abstract(saved["extra"])}
    if "opt_state" in saved:
        tree["opt_state"] = jax.tree_util.tree_map(abstract,
                                                   opt_state_template, opt_sh)
    if "rng_key" in saved:
        tree["rng_key"] = meta_abstract(saved["rng_key"])

    out = ckptr.restore(path, args=ocp.args.StandardRestore(tree))
    extra = json.loads(bytes(np.asarray(out["extra"]).tobytes()).decode())
    if "rng_key" in out:
        extra["rng_key"] = np.asarray(out["rng_key"])
    return (out["params"], out.get("opt_state"), int(out["step"]), extra)
