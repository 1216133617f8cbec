"""Data-parallel training via shard_map + psum over a device mesh.

TPU-native equivalent of the reference's hand-rolled DDP
(/root/reference/TTS/tts/utils/distribute.py:75-116
``apply_gradient_allreduce``: per-param backward hooks bucketing + NCCL
all-reduce + divide by world size): here the per-shard gradients are
``lax.pmean``-reduced over the mesh's data axis *inside* the compiled
program — XLA buckets and schedules the collective over ICI, overlapping it
with remaining backward compute. Loss logging aggregation (≙ ``reduce_tensor``,
distribute.py:53-57) is the same pmean.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tts_tpu.losses.tts_losses import tacotron_loss
from tts_tpu.train.state import TrainState, _model_kwargs, optax_global_norm


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def unreplicate(tree):
    """Fetch one copy of a replicated pytree to host."""
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place batch arrays with leading dim sharded over the data axis."""
    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return x
    return {k: put(v) if k != "item_idxs" else v for k, v in batch.items()}


def make_dp_train_step(
    model,
    mesh: Mesh,
    loss_kwargs: Optional[Dict] = None,
    axis: str = "data",
    mixed_precision: bool = False,
    train: bool = True,
) -> Callable:
    """Jitted SPMD train step: per-device forward/backward on its batch shard,
    pmean(grads) over ICI, replicated optimizer update.

    Returns step(state, batch, rng) -> (state, losses); state replicated,
    batch sharded on leading axis.

    train=False disables dropout/batch-norm updates so the step is a
    deterministic function of (params, batch): with equal-size shards the
    pmean'd step must then EQUAL the single-device step on the global batch
    (tests/test_distributed.py::test_dp_matches_single_device).
    """
    loss_kwargs = dict(loss_kwargs or {})
    loss_kwargs.setdefault("r", model.r)

    def per_shard(state: TrainState, batch: Dict, rng):
        drop_rng = jax.random.fold_in(rng, state.step)
        # decorrelate dropout across data-parallel shards
        drop_rng = jax.random.fold_in(drop_rng, jax.lax.axis_index(axis))

        def loss_fn(params):
            p, b = params, batch
            if mixed_precision:
                from tts_tpu.train.state import _cast_floats
                p = _cast_floats(params, jnp.bfloat16)
                b = dict(batch, mel=batch["mel"].astype(jnp.bfloat16))
            # model.apply, not state.apply_fn — the trainer re-clones the
            # model per reduction factor (see train/state.py make_train_step)
            out, mutated = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                b["text"], b["text_lengths"],
                b["mel"], b["mel_lengths"],
                train=train, rngs={"dropout": drop_rng},
                mutable=["batch_stats"], **_model_kwargs(b))
            if mixed_precision:
                from tts_tpu.train.state import _cast_floats
                out = _cast_floats(out, jnp.float32)
            losses = tacotron_loss(out, batch, **loss_kwargs)
            return losses["loss"], (losses, mutated)

        grads, (losses, mutated) = jax.grad(loss_fn, has_aux=True)(state.params)
        # ≙ apply_gradient_allreduce: all-reduce SUM / world size
        grads = jax.lax.pmean(grads, axis)
        # batch_stats drift across shards -> keep them synchronized
        new_bs = jax.lax.pmean(mutated.get("batch_stats", state.batch_stats), axis)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        # ≙ reduce_tensor for logging-side loss averaging
        losses = jax.lax.pmean(losses, axis)
        losses = dict(losses)
        losses["grad_norm"] = optax_global_norm(grads)
        return new_state, losses

    state_spec = P()       # replicated
    batch_spec = P(axis)   # sharded on leading dim
    smapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0,))


def make_glow_dp_train_step(model, tx, mesh: Mesh, axis: str = "data",
                            train: bool = True) -> Callable:
    """Jitted SPMD Glow-TTS train step (MAS in-graph, per shard).

    Mirrors the single-device step in train/trainer_glow.py::_step —
    signature step(params, opt_state, batch, rng) -> (params, opt_state,
    losses) — with the forward (incl. monotonic alignment search) running
    per-device on its batch shard and grads/losses pmean'd over ``axis``
    (≙ apply_gradient_allreduce + reduce_tensor,
    /root/reference/TTS/tts/utils/distribute.py:53-116; the reference's
    Glow trainer wraps the model in DDP/apex the same way,
    /root/reference/TTS/bin/train_glow_tts.py).

    Data-dependent ActNorm init (apply_ddi) happens BEFORE replication, on
    one global batch — matching the reference where data_depended_init runs
    per-process pre-DDP and rank-0 params are then broadcast
    (train_glow_tts.py:129-143 + distribute.py:78-81).

    With uniform text/mel lengths across items, pmean of the per-shard
    normalized losses equals the global-batch loss, so this step is
    numerically checkable against the single-device step (train=False;
    see __graft_entry__.dryrun_multichip).
    """
    import optax

    from tts_tpu.models.glow_tts import glow_tts_loss

    def per_shard(params, opt_state, batch, rng):
        drop_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch["text"], batch["text_lengths"],
                batch["mel"], batch["mel_lengths"],
                speaker_ids=batch.get("speaker_ids"),
                train=train, rngs={"dropout": drop_rng})
            losses = glow_tts_loss(out, batch["text_lengths"])
            return losses["loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        losses = jax.lax.pmean(losses, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    rep, shard = P(), P(axis)
    smapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(rep, rep, shard, rep),
        out_specs=(rep, rep, rep),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0, 1))
