"""Global Style Tokens: reference encoder + style-token attention.

Capability parity with /root/reference/TTS/tts/layers/gst_layers.py:6-175
(ReferenceEncoder: 6 strided Conv2d -> GRU l.27-90; StyleTokenLayer +
MultiHeadAttention l.92-175).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class ReferenceEncoder(nn.Module):
    """mel (B, T, n_mel) -> prosody embedding (B, ref_dim)."""

    num_mel: int = 80
    out_dim: int = 128
    filters: tuple = (32, 32, 64, 64, 128, 128)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, T, M = x.shape
        y = x[..., None]  # (B, T, n_mel, 1) NHWC with H=time, W=mel
        for i, ch in enumerate(self.filters):
            y = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv_{i}")(y)
            # eval MUST use running stats (≙ torch BatchNorm2d .eval()):
            # batch-stats at inference made the style embedding depend on
            # the serving batch size (found by
            # test_gst_style_conditioning_converges — a B=1 probe gave a
            # different style than the same item inside a full batch)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn_{i}")(y)
            y = nn.relu(y)
        B2, T2, M2, C2 = y.shape
        y = y.reshape(B2, T2, M2 * C2)
        gru = nn.RNN(nn.GRUCell(self.out_dim), name="gru")
        out = gru(y)
        return out[:, -1, :]  # last state


class MultiHeadStyleAttention(nn.Module):
    """Query (prosody) attends over learned style tokens (≙ gst_layers.py:126-175)."""

    num_heads: int = 4
    num_units: int = 128

    @nn.compact
    def __call__(self, query: Array, keys: Array) -> Array:
        # query: (B, 1, Dq), keys: (B, N_tokens, Dk)
        H = self.num_heads
        d = self.num_units // H
        q = nn.Dense(self.num_units, use_bias=False, name="W_query")(query)
        k = nn.Dense(self.num_units, use_bias=False, name="W_key")(keys)
        v = nn.Dense(self.num_units, use_bias=False, name="W_value")(keys)
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, H, d)
        k = k.reshape(B, Tk, H, d)
        v = v.reshape(B, Tk, H, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return out.reshape(B, Tq, self.num_units)


class GST(nn.Module):
    """(≙ GST, gst_layers.py:6-24): mel -> style embedding (B, gst_dim)."""

    num_mel: int = 80
    num_heads: int = 4
    num_style_tokens: int = 10
    gst_embedding_dim: int = 512
    speaker_embedding_dim: Optional[int] = None

    @nn.compact
    def __call__(self, style_mel: Array,
                 speaker_embedding: Optional[Array] = None,
                 train: bool = False) -> Array:
        ref = ReferenceEncoder(self.num_mel, self.gst_embedding_dim // 2,
                               name="ref_encoder")(style_mel, train=train)
        if speaker_embedding is not None and self.speaker_embedding_dim:
            ref = jnp.concatenate([ref, speaker_embedding], axis=-1)
        tokens = self.param(
            "style_tokens", nn.initializers.normal(0.5),
            (self.num_style_tokens, self.gst_embedding_dim // self.num_heads))
        keys = jnp.tanh(tokens)[None].repeat(ref.shape[0], axis=0)
        style = MultiHeadStyleAttention(
            self.num_heads, self.gst_embedding_dim,
            name="style_attention")(ref[:, None, :], keys)
        return style[:, 0, :]
