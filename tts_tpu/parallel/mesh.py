"""Device-mesh construction + multi-host helpers.

TPU-native replacement for the reference's process-per-GPU NCCL stack
(/root/reference/TTS/bin/distribute.py:13-67 launcher,
/root/reference/TTS/tts/utils/distribute.py:60-73 init_process_group):
one SPMD program over a `jax.sharding.Mesh`; the launcher/rank plumbing is
`jax.distributed.initialize`, rank-0 logging is `jax.process_index() == 0`,
and gradient all-reduce is a mesh `psum` riding ICI (SURVEY.md §2.2, §3.5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Form the multi-host runtime (≙ init_distributed; no-op single-host).

    TTS_TPU_FORCE_CPU=1 pins the CPU backend before initialization — needed
    for local multi-process testing because the installed TPU plugin
    overrides the JAX_PLATFORMS env var (see CLAUDE.md).
    """
    import os
    if os.environ.get("TTS_TPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(axes: Sequence[Tuple[str, int]] = (("data", -1),),
              devices=None) -> Mesh:
    """Build a Mesh from (axis_name, size) pairs; -1 infers the remainder.

    Default is a 1-D data axis over all devices (DP baseline); pass
    (("data", N), ("model", M)) to reserve a model axis for sharded vocoder
    convs (SURVEY.md §7 "Distribution").
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    sizes = [s for _, s in axes]
    n_infer = sum(1 for s in sizes if s == -1)
    assert n_infer <= 1, "at most one inferred axis"
    known = int(np.prod([s for s in sizes if s != -1])) if any(
        s != -1 for s in sizes) else 1
    if n_infer:
        assert n % known == 0, f"{n} devices not divisible by {known}"
        sizes = [n // known if s == -1 else s for s in sizes]
    assert int(np.prod(sizes)) == n, f"mesh {sizes} != {n} devices"
    return Mesh(devices.reshape(sizes), tuple(name for name, _ in axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_primary() -> bool:
    """≙ rank-0 checks (args.rank == 0 throughout the reference trainers)."""
    return jax.process_index() == 0


def host_local_to_global(tree, mesh: Mesh, axis: str = "data"):
    """Assemble per-process local batch shards into global arrays sharded on
    ``axis`` (multi-process equivalent of data_parallel.shard_batch; ≙ the
    reference's DistributedSampler handing each rank its slice,
    /root/reference/TTS/tts/utils/distribute.py:11-50)."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            return x
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.tree_util.tree_map(put, tree)


def replicate_global(tree, mesh: Mesh):
    """Replicate host-identical values over a (possibly multi-process) mesh.

    Unlike ``data_parallel.replicate`` (single-process device_put), this works
    when the mesh spans non-addressable devices: every process must hold the
    same value (e.g. same-seed init or a restored checkpoint)."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(put, tree)


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(per-host batch, host offset) for host-local data loading
    (≙ DistributedSampler sharding by rank)."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0
    per = global_batch // n_proc
    return per, per * jax.process_index()
