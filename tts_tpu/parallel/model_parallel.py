"""Model-parallel sharding for wide vocoder generators.

BASELINE north star: "vocoder generators sharded where they exceed a chip".
TPU-native approach: a 2-D ``(data, model)`` mesh; wide conv kernels are
sharded on their output-channel dim over the model axis, activations shard
on batch over the data axis, and XLA's SPMD partitioner inserts the
ICI collectives (all-gathers at channel-narrowing boundaries) — no manual
NCCL-style plumbing (contrast: the reference has no model parallelism at all).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def channel_shardings(params: Any, mesh: Mesh, axis: str = "model",
                      min_channels: int = 128) -> Any:
    """NamedSharding tree: kernels with a wide, divisible output-channel dim
    shard over ``axis``; everything else replicates.

    min_channels avoids sharding narrow layers where the collective would
    cost more than the compute saved.
    """
    n = mesh.shape[axis]

    def spec_for(x):
        if (hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[-1] >= min_channels and x.shape[-1] % n == 0):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def shard_params(params: Any, mesh: Mesh, axis: str = "model",
                 min_channels: int = 128) -> Any:
    """Place params according to channel_shardings."""
    shardings = channel_shardings(params, mesh, axis, min_channels)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def make_sharded_generator_forward(gen, mesh: Mesh,
                                   data_axis: str = "data") -> Callable:
    """Jitted generator forward with batch sharded over the data axis and
    channel-sharded params; XLA partitions the convs over the model axis."""

    @jax.jit
    def forward(params, mel):
        mel = jax.lax.with_sharding_constraint(
            mel, NamedSharding(mesh, P(data_axis)))
        out = gen.apply({"params": params}, mel)
        if hasattr(gen, "pqmf"):
            out = gen.pqmf.synthesis(out)
        return out

    return forward
