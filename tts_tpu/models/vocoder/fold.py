"""Weight-norm folding for inference/export.

≙ the reference's ``remove_weight_norm`` (melgan_generator.py:90-97 et al.):
re-parameterizes w = scale * v / ||v|| into a plain kernel once, so the
serving path runs bare convs (no per-call norm computation). Use with the
same module built with ``use_weight_norm=False``.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def fold_weight_norm(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every flax WeightNorm scale into its sibling kernel and drop the
    WeightNorm_* entries. Returns a tree loadable by the
    ``use_weight_norm=False`` twin of the module."""
    from flax.core import unfreeze

    params = unfreeze(params)
    return _fold(params)


def _fold(node: Dict[str, Any]) -> Dict[str, Any]:
    if not isinstance(node, dict):
        return node
    out = {}
    scales = {}
    for key, child in node.items():
        if key.startswith("WeightNorm_") and isinstance(child, dict):
            # entries look like {"conv/kernel/scale": array}
            for skey, sval in child.items():
                parts = skey.split("/")
                assert parts[-1] == "scale" and parts[-2] == "kernel", skey
                scales["/".join(parts[:-2])] = sval
        else:
            out[key] = _fold(child)
    for target, scale in scales.items():
        path = target.split("/")
        sub = out
        for p in path[:-1]:
            sub = sub[p]
        leaf = sub[path[-1]]
        # pure numpy on the HOST: at checkpoint load this runs once per
        # conv; as jnp eager ops each tiny op costs a dispatch (and through
        # the axon tunnel, a ~25 ms RTT or a per-op CPU jit) — measured
        # ~10 s of a cold CLI boot (probe_cold_start 2026-08-21)
        kernel = np.asarray(leaf["kernel"], np.float32)
        axes = tuple(range(kernel.ndim - 1))
        norm = np.sqrt(np.sum(kernel**2, axis=axes, keepdims=True))
        leaf["kernel"] = kernel * (np.asarray(scale, np.float32)
                                   / np.maximum(norm, 1e-12))
    return out
