"""Optimizer stack: RAdam + Noam warmup + decoupled weight decay + grad clip.

Capability parity with the reference training helpers:
- RAdam default optimizer (≙ /root/reference/TTS/utils/radam.py, via optax.radam)
- NoamLR warmup schedule (≙ /root/reference/TTS/utils/training.py:91-103)
- decoupled weight decay with skip-lists (≙ training.py:52-89)
- gradient clip + non-finite-step skipping (≙ training.py:16-41 check_update)
- gradual training schedule (r, batch_size) by step (≙ training.py:105-116)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def noam_schedule(base_lr: float, warmup_steps: int = 4000):
    """lr * warmup^0.5 * min(step * warmup^-1.5, step^-0.5)."""

    def schedule(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        return base_lr * warmup_steps**0.5 * jnp.minimum(
            step * warmup_steps**-1.5, step**-0.5)

    return schedule


def _decay_mask(params) -> Any:
    """Apply weight decay only to rank>=2 kernels; skip biases/norm scales
    (≙ set_weight_decay skip-lists, training.py:66-89)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(
    *,
    lr: float = 1e-4,
    grad_clip: float = 5.0,
    weight_decay: float = 0.0,
    use_noam: bool = False,
    warmup_steps: int = 4000,
    skip_nonfinite: bool = True,
    params_for_mask=None,
) -> optax.GradientTransformation:
    schedule = noam_schedule(lr, warmup_steps) if use_noam else lr
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_radam())
    if weight_decay and weight_decay > 0:
        # decoupled weight decay, scaled by lr via the final transform
        # (≙ adam_weight_decay: p -= wd * lr * p)
        chain.append(optax.add_decayed_weights(weight_decay, mask=_decay_mask))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if skip_nonfinite:
        # skip the update (keep state) on inf/nan grads, ≙ check_update's
        # "[!] NaN or inf" skip path
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10000)
    return tx


def gradual_training_schedule(global_step: int, schedule: Sequence[Sequence[int]],
                              num_replicas: int = 1) -> Tuple[int, int]:
    """[[start_step, r, batch_size], ...] -> (r, batch_size) for current step
    (≙ gradual_training_scheduler, training.py:105-116; step scaled by replica
    count as the reference scales by num_gpus)."""
    step = global_step * max(num_replicas, 1)
    r, bs = schedule[0][1], schedule[0][2]
    for entry in schedule:
        if step >= entry[0]:
            r, bs = entry[1], entry[2]
    return r, bs
