"""Glow-TTS text encoder: embeddings -> (transformer | gatedconv | tdsep)
-> (mean, log-scale) projections + duration predictor.

Capability parity with /root/reference/TTS/tts/layers/glow_tts/encoder.py:13-145,
duration_predictor.py:7-40, gated_conv.py:6-44, time_depth_sep_conv.py:5-92.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.models.glow.flows import ConvLayerNorm
from tts_tpu.models.glow.transformer import RelPosTransformer

Array = jnp.ndarray


class DurationPredictor(nn.Module):
    """2x [conv -> relu -> LN -> dropout] -> 1-channel log-durations
    (≙ duration_predictor.py:7-40)."""

    hidden_channels: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, train: bool = True) -> Array:
        y = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME",
                    name="conv1")(x * x_mask)
        y = nn.relu(y)
        y = nn.LayerNorm(epsilon=1e-4, scale_init=nn.initializers.constant(0.1), name="ln1")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME",
                    name="conv2")(y * x_mask)
        y = nn.relu(y)
        y = nn.LayerNorm(epsilon=1e-4, scale_init=nn.initializers.constant(0.1), name="ln2")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Conv(1, (1,), name="proj")(y * x_mask)
        return y * x_mask  # (B, T, 1) log durations


class GatedConvBlock(nn.Module):
    """Stack of GLU convs with channel layer norm + residual
    (≙ gated_conv.py:6-44: per layer dropout -> conv(o*mask) -> LN -> GLU ->
    residual; the final output is returned unmasked, like the reference)."""

    hidden_channels: int
    kernel_size: int = 5
    num_layers: int = 9
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, train: bool = True) -> Array:
        o = x
        res = x
        for i in range(self.num_layers):
            o = nn.Dropout(self.dropout_rate, deterministic=not train)(o)
            o = nn.Conv(2 * self.hidden_channels, (self.kernel_size,),
                        padding="SAME", name=f"conv_{i}")(o * x_mask)
            o = nn.LayerNorm(epsilon=1e-4,
                             scale_init=nn.initializers.constant(0.1),
                             name=f"ln_{i}")(o)
            a, b = jnp.split(o, 2, axis=-1)
            o = res + a * jax.nn.sigmoid(b)
            res = o
        return o


class TimeDepthSeparableConv(nn.Module):
    """One TDS layer (≙ time_depth_sep_conv.py:5-62): 1x1-GLU -> depthwise ->
    swish -> 1x1, BatchNorm after every conv, residual around the whole layer.
    torch BatchNorm1d momentum 0.1 == flax momentum 0.9."""

    hid_channels: int
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x_res = x
        x = nn.Conv(2 * self.hid_channels, (1,), name="time_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        x = nn.Conv(self.hid_channels, (self.kernel_size,),
                    feature_group_count=self.hid_channels, padding="SAME",
                    name="depth_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm2")(x)
        x = x * jax.nn.sigmoid(x)
        x = nn.Conv(self.out_channels, (1,), name="time_conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm3")(x)
        return x_res + x


class TimeDepthSeparableConvBlock(nn.Module):
    """TDS layer chain, each on masked input (≙ time_depth_sep_conv.py:65-92;
    the encoder wires in == hid == out so every layer's residual is valid)."""

    hidden_channels: int
    kernel_size: int = 5
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, train: bool = True) -> Array:
        for i in range(self.num_layers):
            x = TimeDepthSeparableConv(
                self.hidden_channels, self.hidden_channels, self.kernel_size,
                name=f"layer_{i}")(x * x_mask, train=train)
        return x


class GlowTTSEncoder(nn.Module):
    """(≙ Encoder, glow_tts/encoder.py:13-145)."""

    num_chars: int = 200
    out_channels: int = 80
    hidden_channels: int = 192
    filter_channels: int = 768
    filter_channels_dp: int = 256
    encoder_type: str = "transformer"  # | "gatedconv" | "time-depth-separable"
    num_heads: int = 2
    num_layers: int = 6
    kernel_size: int = 3
    dropout_rate: float = 0.1
    rel_attn_window_size: Optional[int] = 4
    dropout_rate_dp: float = 0.1
    mean_only: bool = False
    use_prenet: bool = True
    c_in_channels: int = 0

    @nn.compact
    def __call__(self, x_ids: Array, x_lengths: Array,
                 g: Optional[Array] = None, train: bool = True
                 ) -> Tuple[Array, Array, Array, Array]:
        """Returns (means, log_scales, log_durations, x_mask)."""
        from tts_tpu.ops.masking import sequence_mask

        x = nn.Embed(self.num_chars, self.hidden_channels,
                     embedding_init=nn.initializers.normal(
                         self.hidden_channels**-0.5), name="emb")(x_ids)
        x = x * math.sqrt(self.hidden_channels)
        x_mask = sequence_mask(x_lengths, x_ids.shape[1]
                               ).astype(x.dtype)[..., None]

        if self.use_prenet and self.encoder_type in ("transformer",
                                                     "time-depth-separable"):
            x = ConvLayerNorm(self.hidden_channels, self.hidden_channels,
                              kernel_size=5, num_layers=3, dropout_rate=0.5,
                              name="prenet")(x, x_mask, train=train)
        if self.encoder_type == "transformer":
            x = RelPosTransformer(
                self.hidden_channels, self.filter_channels, self.num_heads,
                self.num_layers, self.kernel_size, self.dropout_rate,
                self.rel_attn_window_size, name="encoder")(x, x_mask, train=train)
        elif self.encoder_type == "gatedconv":
            # no prenet; depth 3 + num_layers (≙ encoder.py:87-91)
            x = GatedConvBlock(self.hidden_channels, kernel_size=5,
                               num_layers=3 + self.num_layers,
                               dropout_rate=self.dropout_rate,
                               name="encoder")(x, x_mask, train=train)
        elif self.encoder_type == "time-depth-separable":
            # (≙ encoder.py:92-105): prenet + 3 + num_layers TDS layers
            x = TimeDepthSeparableConvBlock(
                self.hidden_channels, kernel_size=5,
                num_layers=3 + self.num_layers,
                name="encoder")(x, x_mask, train=train)
        else:
            raise ValueError(f"unknown encoder type {self.encoder_type}")

        o_mean = nn.Conv(self.out_channels, (1,), name="proj_mean")(x) * x_mask
        if self.mean_only:
            o_log_scale = jnp.zeros_like(o_mean)
        else:
            o_log_scale = nn.Conv(self.out_channels, (1,),
                                  name="proj_scale")(x) * x_mask

        # duration predictor sees detached features (+ speaker cond concat)
        # (≙ encoder.py duration predictor input, detach semantics)
        x_dp = jax.lax.stop_gradient(x)
        if g is not None:
            g_exp = jnp.broadcast_to(
                jax.lax.stop_gradient(g)[:, None, :],
                (x_dp.shape[0], x_dp.shape[1], g.shape[-1]))
            x_dp = jnp.concatenate([x_dp, g_exp], axis=-1)
        o_dur_log = DurationPredictor(
            self.filter_channels_dp, dropout_rate=self.dropout_rate_dp,
            name="duration_predictor")(x_dp, x_mask, train=train)
        return o_mean, o_log_scale, o_dur_log, x_mask
