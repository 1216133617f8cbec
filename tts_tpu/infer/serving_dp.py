"""Data-parallel serving: one SPMD program, utterance batch sharded over a
device mesh.

The reference scales only training across devices (one process per GPU +
NCCL, /root/reference/TTS/bin/distribute.py:13-67); serving is
single-device. Here serving scales the same way training does
(parallel/data_parallel.py): `shard_map` over a 1-D `data` mesh — params
replicated, each device synthesizing its local batch shard, Pallas kernels
included (they run per-device under shard_map, so the whole flagship
pipeline shards unchanged). This is the harness for the BASELINE.json
north-star measurement: synthesized audio-seconds/s at 1 chip / 1 host /
N hosts with >=0.8 linear scaling from 1 to 4 hosts (multi-host = the same
program after jax.distributed.initialize, parallel/mesh.py).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_dp_serving(fn: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """SPMD-wrap ``fn(params, *batch_arrays) -> outputs``.

    ``params`` is replicated; every positional batch array is sharded on its
    leading axis over ``axis``; every output leaf likewise (so outputs with
    a leading batch dimension shard, e.g. the (B, T_wav, 1) waveform).
    Batch size must divide by the mesh's ``axis`` size.
    """

    def wrapper(params, *batch):
        in_specs = (P(),) + tuple(P(axis) for _ in batch)
        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # annotation, so shard_map's replication checker must be off for
        # pipelines containing Pallas kernels
        try:
            inner = shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=P(axis), check_vma=False)
        except TypeError:  # older jax spells it check_rep
            inner = shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=P(axis), check_rep=False)
        return inner(params, *batch)

    return jax.jit(wrapper)
