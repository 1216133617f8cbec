"""Relative-position transformer encoder for Glow-TTS.

Capability parity with /root/reference/TTS/tts/layers/glow_tts/transformer.py:
RelativePositionMultiHeadAttention with windowed relative K/V embeddings and
optional proximal bias (l.9-227), conv FFN (l.228), encoder stack (l.265-319).
Attention is a single batched einsum chain — MXU-friendly, shardable over
heads (the layer the long-context design leaves shardable, SURVEY.md §5).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class RelativePositionMultiHeadAttention(nn.Module):
    channels: int
    num_heads: int
    rel_attn_window_size: Optional[int] = 4
    input_length: Optional[int] = None  # block-local masking
    proximal_bias: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, attn_mask: Optional[Array] = None,
                 train: bool = True) -> Array:
        B, T, C = x.shape
        H = self.num_heads
        k_ch = C // H

        q = nn.Dense(C, name="q")(x).reshape(B, T, H, k_ch)
        k = nn.Dense(C, name="k")(x).reshape(B, T, H, k_ch)
        v = nn.Dense(C, name="v")(x).reshape(B, T, H, k_ch)

        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(k_ch)

        if self.rel_attn_window_size is not None:
            W = self.rel_attn_window_size
            emb_k = self.param("emb_rel_k",
                               nn.initializers.normal(k_ch**-0.5),
                               (2 * W + 1, k_ch))
            # relative logits: q . emb_k[rel]. The reference ZERO-PADS the
            # relative embeddings outside the window (transformer.py
            # _get_relative_embeddings pads with zeros), so positions with
            # |j - i| > W contribute 0 — not the clipped edge embedding.
            # Computed through a banded (T, S, d) table built by a tiny
            # one-hot matmul: all-MXU. (A per-(b,h,t,s) gather formulation
            # measured ~2x the encoder's roofline on TPU serving.)
            rel_raw = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
            in_window = (jnp.abs(rel_raw) <= W)  # (T, T)
            rel = jnp.clip(rel_raw, -W, W) + W
            sel = jax.nn.one_hot(rel, 2 * W + 1) * in_window[..., None]
            emb_full = jnp.einsum("tsr,rd->tsd", sel, emb_k)  # (T, S, d)
            scores = scores + jnp.einsum("bthd,tsd->bhts", q, emb_full) \
                / math.sqrt(k_ch)
        if self.proximal_bias:
            r = jnp.arange(T, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None]
        if self.input_length is not None:
            block = jnp.abs(jnp.arange(T)[None, :] - jnp.arange(T)[:, None]) \
                < self.input_length
            scores = jnp.where(block[None, None], scores, -1e4)
        if attn_mask is not None:
            scores = jnp.where(attn_mask, scores, -1e4)

        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.dropout_rate, deterministic=not train)(p)
        out = jnp.einsum("bhts,bshd->bthd", p, v)

        if self.rel_attn_window_size is not None:
            emb_v = self.param("emb_rel_v",
                               nn.initializers.normal(k_ch**-0.5),
                               (2 * W + 1, k_ch))
            # same zero-outside-window semantics as the key path
            out = out + jnp.einsum("bhts,tsr,rd->bthd", p, sel, emb_v)

        out = out.reshape(B, T, C)
        return nn.Dense(C, name="out")(out)


class FFN(nn.Module):
    """Conv feed-forward (≙ transformer.py:228-263)."""

    out_channels: int
    filter_channels: int
    kernel_size: int = 1
    dropout_rate: float = 0.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, train: bool = True) -> Array:
        y = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME",
                    name="conv1")(x * x_mask)
        if self.activation == "gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    name="conv2")(y * x_mask)
        return y * x_mask


class RelPosTransformer(nn.Module):
    """Stack of rel-pos attention + conv FFN blocks (≙ transformer.py:265-319)."""

    hidden_channels: int = 192
    filter_channels: int = 768
    num_heads: int = 2
    num_layers: int = 6
    kernel_size: int = 3
    dropout_rate: float = 0.1
    rel_attn_window_size: Optional[int] = 4
    input_length: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, train: bool = True) -> Array:
        m = x_mask[..., 0]  # (B, T)
        attn_mask = (m[:, None, :, None] * m[:, None, None, :]) > 0  # (B,1,T,T)
        for i in range(self.num_layers):
            y = RelativePositionMultiHeadAttention(
                self.hidden_channels, self.num_heads,
                self.rel_attn_window_size, self.input_length,
                dropout_rate=self.dropout_rate,
                name=f"attn_{i}")(x * x_mask, attn_mask, train=train)
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
            x = nn.LayerNorm(epsilon=1e-4, scale_init=nn.initializers.constant(0.1), name=f"ln1_{i}")(x + y)
            y = FFN(self.hidden_channels, self.filter_channels,
                    self.kernel_size, self.dropout_rate,
                    name=f"ffn_{i}")(x, x_mask, train=train)
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
            x = nn.LayerNorm(epsilon=1e-4, scale_init=nn.initializers.constant(0.1), name=f"ln2_{i}")(x + y)
        return x * x_mask
