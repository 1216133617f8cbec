"""GE2E speaker encoder: stacked LSTM-with-projection d-vector model.

Capability parity with /root/reference/TTS/speaker_encoder/model.py:32-89
(3x LSTMWithProjection 768->256, L2-normalized last-frame embedding;
sliding-window ``compute_embedding``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class LSTMWithProjection(nn.Module):
    lstm_dim: int = 768
    proj_dim: int = 256

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.RNN(nn.OptimizedLSTMCell(self.lstm_dim), name="lstm")(x)
        return nn.Dense(self.proj_dim, use_bias=False, name="proj")(y)


class SpeakerEncoder(nn.Module):
    input_dim: int = 40
    proj_dim: int = 256
    lstm_dim: int = 768
    num_lstm_layers: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """mel (B, T, n_mel) -> L2-normalized d-vector (B, proj_dim)."""
        y = x
        for i in range(self.num_lstm_layers):
            y = LSTMWithProjection(self.lstm_dim, self.proj_dim,
                                   name=f"layer_{i}")(y)
        d = y[:, -1, :]
        return d / jnp.maximum(
            jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)

    def compute_embedding(self, x: Array, num_frames: int = 160,
                          overlap: float = 0.5) -> Array:
        """Sliding-window embedding average (≙ model.py:72-89)."""
        T = x.shape[1]
        hop = max(1, int(num_frames * (1 - overlap)))
        if T <= num_frames:
            return self(x)
        offsets = list(range(0, T - num_frames + 1, hop))
        embs = jnp.stack([self(x[:, o: o + num_frames]) for o in offsets])
        emb = embs.mean(axis=0)
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                                 1e-8)
