"""Per-host data sharding (≙ the reference's non-shuffling DistributedSampler,
/root/reference/TTS/tts/utils/distribute.py:11-50).

On TPU the SPMD program is one process per host; each host loads only its
stride-slice of the (length-sorted) index list, preserving bucket order.
"""

from __future__ import annotations

from typing import List, Sequence


def shard_indices(indices: Sequence[int], num_shards: int, shard_id: int) -> List[int]:
    """Pad to a multiple of ``num_shards`` (wrapping) then stride-slice.

    Preserves sorted order within a shard, matching the reference sampler's
    ``indices[rank::num_replicas]`` behavior.
    """
    assert 0 <= shard_id < num_shards
    indices = list(indices)
    total = ((len(indices) + num_shards - 1) // num_shards) * num_shards
    indices = indices + indices[: total - len(indices)]
    return indices[shard_id::num_shards]
