"""Length masking utilities (≙ sequence_mask, /root/reference/TTS/tts/utils/generic_utils.py:32-40)."""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool mask; True inside the sequence."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]
