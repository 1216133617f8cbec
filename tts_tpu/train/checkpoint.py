"""Checkpoint save/restore with partial-init support.

Capability parity with the reference checkpoint IO
(/root/reference/TTS/tts/utils/io.py:10-57 save/load with step/epoch/r and
optimizer state; /root/reference/TTS/utils/generic_utils.py:69-97
``set_init_dict`` partial restore with shape filtering + reinit_layers).
Serialized with flax msgpack (host-invariant pytrees); the training loop
restores ``r`` into the decoder config exactly as the reference does on load.
"""

from __future__ import annotations

import glob
import json
import os
import re
from datetime import datetime
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from flax import serialization
from flax.core import unfreeze


def _fetch_leaf(x):
    """Device array -> host numpy, including replicated multi-process global
    arrays (each process's local shard holds the full value)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        sharding = x.sharding
        if not sharding.is_fully_replicated:
            raise ValueError(
                "checkpointing a non-replicated multi-process array; gather "
                "it first (trainer states are replicated by design)")
        x = x.addressable_data(0)
    return np.asarray(x)


def _to_numpy_tree(tree):
    # start ALL device->host copies before materializing any: per-leaf
    # np.asarray is a serial ~25 ms tunnel round trip each — hundreds of
    # leaves made every checkpoint/best-model save cost minutes on the axon
    # tunnel (measured 2026-08-21, glow real-LJSpeech run); the async
    # prefetch pipelines the transfers
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.is_fully_addressable:
            try:
                leaf.copy_to_host_async()
            except (AttributeError, RuntimeError):
                break
    return jax.tree_util.tree_map(_fetch_leaf, tree)


def save_checkpoint(
    output_dir: str,
    *,
    params: Any,
    opt_state: Any = None,
    batch_stats: Any = None,
    step: int = 0,
    epoch: int = 0,
    r: int = 1,
    model_loss: Optional[float] = None,
    config: Optional[Dict] = None,
    prefix: str = "checkpoint",
) -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{prefix}_{step}.ckpt")
    payload = {
        "params": _to_numpy_tree(unfreeze(params)),
        # optax states are NamedTuple pytrees; convert to plain dicts for
        # msgpack; restore with flax.serialization.from_state_dict(tx.init(p), ...)
        "opt_state": _to_numpy_tree(serialization.to_state_dict(opt_state))
        if opt_state is not None else None,
        "batch_stats": _to_numpy_tree(unfreeze(batch_stats)) if batch_stats else {},
        "meta": {
            "step": step,
            "epoch": epoch,
            "r": r,
            "model_loss": model_loss,
            "date": datetime.now().isoformat(),
        },
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    if config is not None:
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump(dict(config), f, indent=2, default=str)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_checkpoint_multihost(output_dir: str, **kwargs) -> Optional[str]:
    """Pod-run checkpoint discipline (TPU equivalent of the reference's
    rank-0-only saves, train_tts.py:254-300): every host participates in the
    device fetch (replicated global arrays are addressable everywhere), but
    only process 0 touches the filesystem; all hosts barrier afterwards so
    nobody races ahead into a restore of a half-written file."""
    path = None
    if jax.process_index() == 0:
        path = save_checkpoint(output_dir, **kwargs)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("tts_tpu_checkpoint_save")
    return path


def restore_for_mesh(path: str, mesh=None) -> Dict[str, Any]:
    """Load a checkpoint and (optionally) place params/batch_stats replicated
    over ``mesh`` — works across host- and device-count changes because the
    on-disk format is host-invariant numpy (every host loads the same file
    and forms the same global arrays). ≙ the restore half of
    /root/reference/TTS/tts/utils/io.py:10-24, generalized to pods."""
    ckpt = load_checkpoint(path)
    if mesh is not None:
        from tts_tpu.parallel.mesh import replicate_global
        for key in ("params", "batch_stats"):
            if ckpt.get(key):
                ckpt[key] = replicate_global(ckpt[key], mesh)
    return ckpt


def save_best_model(
    current_loss: float,
    best_loss: float,
    output_dir: str,
    **kwargs,
) -> float:
    """Keep best_model.ckpt updated on eval-loss improvement
    (≙ save_best_model, tts/utils/io.py:51-57)."""
    if current_loss < best_loss:
        kwargs.pop("prefix", None)
        path = save_checkpoint(output_dir, model_loss=current_loss,
                               prefix="best_model_tmp", **kwargs)
        final = os.path.join(output_dir, "best_model.ckpt")
        os.replace(path, final)
        return current_loss
    return best_loss


def latest_checkpoint(output_dir: str, prefix: str = "checkpoint") -> Optional[str]:
    """Newest checkpoint by step number (≙ --continue_path glob,
    train_tts.py:673-679)."""
    paths = glob.glob(os.path.join(output_dir, f"{prefix}_*.ckpt"))
    if not paths:
        return None

    def step_of(p):
        m = re.search(r"_(\d+)\.ckpt$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=step_of)


def partial_restore(
    init_params: Any,
    restored_params: Any,
    reinit_layers: Optional[Sequence[str]] = None,
) -> Any:
    """Merge a restored param tree into a freshly-initialized one, keeping the
    fresh value when a leaf is missing, shape-mismatched, or matches a
    ``reinit_layers`` pattern (≙ set_init_dict, TTS/utils/generic_utils.py:69-97)."""
    reinit_layers = list(reinit_layers or [])

    flat_init = _flatten(unfreeze(init_params))
    flat_restored = _flatten(unfreeze(restored_params))

    merged = {}
    restored_count = 0
    for key, init_val in flat_init.items():
        use_init = True
        if key in flat_restored and not any(pat in key for pat in reinit_layers):
            r_val = np.asarray(flat_restored[key])
            if r_val.shape == np.asarray(init_val).shape:
                merged[key] = r_val
                restored_count += 1
                use_init = False
        if use_init:
            merged[key] = init_val
    out = _unflatten(merged)
    return out


def _flatten(tree, prefix: str = "") -> Dict[str, Any]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        flat[prefix] = tree
    return flat


def _unflatten(flat: Dict[str, Any]):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree
