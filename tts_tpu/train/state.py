"""Train state + jitted train/eval step factories for the Tacotron family.

Replaces the reference's per-batch Python training loop body
(/root/reference/TTS/bin/train_tts.py:144-301) with a single jitted step:
forward, composite loss, grads, optimizer update, batch-stats update. The
reference's *separate stopnet optimizer* (train_tts.py:545-551) is subsumed
by the stop_gradient boundary inside the model: stopnet params receive
gradients only from the stopnet loss, everything else only from the
spectrogram losses — one optax transform updates both, with identical
semantics and one fewer host sync.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax.training import train_state

from tts_tpu.losses.tts_losses import tacotron_loss


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def _cast_floats(tree, dtype):
    """Cast float leaves to the compute dtype (params stay f32 masters)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def create_train_state(model, rng, batch: Dict, tx) -> TrainState:
    """Initialize params/batch_stats from an example batch."""
    init_rng, drop_rng = jax.random.split(rng)
    kwargs = _model_kwargs(batch)
    variables = model.init({"params": init_rng, "dropout": drop_rng},
                           batch["text"], batch["text_lengths"],
                           batch["mel"], batch["mel_lengths"], **kwargs)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def _model_kwargs(batch: Dict) -> Dict:
    kwargs = {}
    if "speaker_ids" in batch:
        kwargs["speaker_ids"] = batch["speaker_ids"]
    if "speaker_embeddings" in batch:
        kwargs["speaker_embeddings"] = batch["speaker_embeddings"]
    return kwargs


def make_train_step(model, loss_kwargs: Optional[Dict] = None,
                    jit: bool = True, mixed_precision: bool = False,
                    train: bool = True) -> Callable:
    """Returns step(state, batch, rng) -> (new_state, losses_dict).

    mixed_precision: run the forward in bfloat16 (params cast at the step
    boundary — f32 masters stay in the optimizer; losses and grads are f32).
    TPU-native equivalent of the reference's apex AMP O1 (train_tts.py:553-559);
    no loss scaling needed — bf16 keeps f32's exponent range.

    train=False builds a fully deterministic step (dropout off, batch-norm
    running stats): gradients are still taken and applied — used by the
    DP-equals-single-device correctness tests where dropout noise would mask
    an all-reduce bug.
    """
    loss_kwargs = dict(loss_kwargs or {})
    loss_kwargs.setdefault("r", model.r)

    def step(state: TrainState, batch: Dict, rng) -> Any:
        drop_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            p = params
            b = batch
            if mixed_precision:
                p = _cast_floats(params, jnp.bfloat16)
                b = dict(batch,
                         mel=batch["mel"].astype(jnp.bfloat16))
            # NOT state.apply_fn: the trainer re-clones the model per
            # reduction factor (gradual training) while the TrainState keeps
            # the config-r apply_fn — using it here applied the WRONG r
            # whenever config r != the schedule's first r (caught by the
            # real-LJSpeech gradual run, round 5)
            out, mutated = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                b["text"], b["text_lengths"],
                b["mel"], b["mel_lengths"],
                train=train, rngs={"dropout": drop_rng},
                mutable=["batch_stats"], **_model_kwargs(b))
            if mixed_precision:
                out = _cast_floats(out, jnp.float32)
            losses = tacotron_loss(out, batch, **loss_kwargs)
            return losses["loss"], (losses, mutated)

        grads, (losses, mutated) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mutated.get("batch_stats", state.batch_stats))
        losses = dict(losses)
        losses["grad_norm"] = optax_global_norm(grads)
        return new_state, losses

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def make_eval_step(model, loss_kwargs: Optional[Dict] = None,
                   jit: bool = True) -> Callable:
    loss_kwargs = dict(loss_kwargs or {})
    loss_kwargs.setdefault("r", model.r)

    def step(state: TrainState, batch: Dict, rng) -> Dict:
        # model.apply, not state.apply_fn — see make_train_step
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["text"], batch["text_lengths"],
            batch["mel"], batch["mel_lengths"],
            train=False, rngs={"dropout": rng}, **_model_kwargs(batch))
        return tacotron_loss(out, batch, **loss_kwargs)

    return jax.jit(step) if jit else step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
