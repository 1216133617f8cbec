"""Multi-process distributed smoke check (run via bin/distribute.py).

Forms a real ``jax.distributed`` process group on CPU, builds a global mesh
spanning both processes, and checks:

1. a mesh psum sees every process's contribution;
2. a data-parallel Tacotron2 train step over process-local batch shards
   (host_local_to_global + shard_map/pmean) EQUALS the single-device step on
   the reassembled global batch, computed independently by each process.

This covers the launcher + process-group + cross-host collective surface the
reference left untested (SURVEY.md §4 "distributed code is untested";
≙ /root/reference/TTS/tts/utils/distribute.py:60-116 init + all-reduce).

Usage: python -m tts_tpu.bin.distribute --script _dist_smoke
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator_address", required=True)
    parser.add_argument("--num_processes", type=int, required=True)
    parser.add_argument("--process_id", type=int, required=True)
    args = parser.parse_args(argv)

    from tts_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(args.coordinator_address, args.num_processes,
                         args.process_id)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == args.num_processes, (
        jax.process_count(), args.num_processes)

    from tts_tpu.parallel.mesh import (host_local_to_global, make_mesh,
                                       replicate_global)
    mesh = make_mesh((("data", -1),))
    n_dev = len(jax.devices())

    # --- 1. cross-process psum: every process contributes process_index+1
    local = np.full((jax.local_device_count(), 1),
                    float(jax.process_index() + 1), np.float32)
    contrib = host_local_to_global({"x": local}, mesh)["x"]
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(contrib)
    expect = sum((p + 1) * jax.local_device_count()
                 for p in range(args.num_processes))
    total = float(total.addressable_data(0))
    np.testing.assert_allclose(total, expect)

    # --- 2. DP train step across processes == single-device step
    from tts_tpu.models.tacotron2 import Tacotron2
    from tts_tpu.parallel import make_dp_train_step
    from tts_tpu.train.optim import make_optimizer
    from tts_tpu.train.state import create_train_state, make_train_step

    model = Tacotron2(num_chars=32, r=2, encoder_dim=32, embedding_dim=32,
                      attn_dim=16)
    rng = jax.random.PRNGKey(0)
    B, T_text, T_mel = 2 * n_dev, 8, 8
    k1, k2 = jax.random.split(rng)
    batch = {
        "text": np.asarray(jax.random.randint(k1, (B, T_text), 0, 32)),
        "text_lengths": np.full((B,), T_text, np.int32),
        "mel": np.asarray(jax.random.normal(k2, (B, T_mel, 80))),
        "mel_lengths": np.full((B,), T_mel, np.int32),
        "stop_targets": np.zeros((B, T_mel // 2), np.float32),
    }
    batch["stop_targets"][:, -1] = 1.0

    tx = make_optimizer(lr=1e-3, grad_clip=5.0)
    state = create_train_state(model, rng, batch, tx)  # same seed every proc

    per = B // args.num_processes
    lo = per * jax.process_index()
    local_batch = {k: v[lo:lo + per] for k, v in batch.items()}

    dp_step = make_dp_train_step(model, mesh, train=False)
    s_dp, losses = dp_step(replicate_global(state, mesh),
                           host_local_to_global(local_batch, mesh), rng)

    single = make_train_step(model, jit=True, train=False)
    s_1, losses_1 = single(state, batch, rng)

    # losses/params come back replicated (P()) — each process's device 0
    # holds the full value
    np.testing.assert_allclose(float(losses["loss"].addressable_data(0)),
                               float(losses_1["loss"]), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_1.params),
            jax.tree_util.tree_leaves_with_path(s_dp.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b.addressable_data(0)),
            atol=1e-6, rtol=1e-4,
            err_msg=f"diverged at {jax.tree_util.keystr(path)}")

    # --- 3. multi-host checkpoint: process-0-only write + barrier, every
    # host restores the same values (≙ rank-0 saves, train_tts.py:254-300)
    import tempfile

    from tts_tpu.train.checkpoint import (restore_for_mesh,
                                          save_checkpoint_multihost)
    ckpt_dir = os.environ.get("TTS_TPU_SMOKE_CKPT_DIR",
                              os.path.join(tempfile.gettempdir(),
                                           "tts_tpu_dist_smoke_ckpt"))
    path = save_checkpoint_multihost(ckpt_dir, params=s_dp.params, step=7)
    assert (path is not None) == (jax.process_index() == 0)
    restored = restore_for_mesh(os.path.join(ckpt_dir, "checkpoint_7.ckpt"),
                                mesh)
    for (rp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(restored["params"]),
            jax.tree_util.tree_leaves_with_path(s_dp.params)):
        np.testing.assert_array_equal(
            np.asarray(a.addressable_data(0)),
            np.asarray(b.addressable_data(0)),
            err_msg=f"restore mismatch at {jax.tree_util.keystr(rp)}")

    if jax.process_index() == 0:
        print(f"dist_smoke OK: {args.num_processes} processes, "
              f"{n_dev} devices, psum={total}, "
              f"loss={float(losses['loss'].addressable_data(0)):.4f}")


if __name__ == "__main__":
    main()
