"""Normalizing-flow blocks for the Glow-TTS decoder (NWC layout).

Capability parity with /root/reference/TTS/tts/layers/glow_tts/glow.py
(WN l.63-149, InvConvNear l.151-208, CouplingBlock l.211-270, fused gate
l.53-60) and normalization.py (ActNorm with data-dependent init l.48-107).

Every block exposes ``__call__(x, x_mask, g=None, reverse=False)`` returning
``(y, logdet)``; the whole decoder is reversible with shared params. Inverse
1x1-conv weights are 4x4 — inverted inline (jnp.linalg.inv) instead of the
reference's cached ``store_inverse`` (a trace-time constant fold under jit).
fp32 islands: logdet terms accumulate in float32 regardless of compute dtype
(SURVEY.md §7 hard-parts #7).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def fused_gate(a: Array, b: Array) -> Array:
    """tanh(x_a) * sigmoid(x_b) on pre-split halves of (a + b)
    (≙ fused_add_tanh_sigmoid_multiply, glow.py:53-60; XLA fuses this chain)."""
    x = a + b
    t, s = jnp.split(x, 2, axis=-1)
    return jnp.tanh(t) * jax.nn.sigmoid(s)


class LayerNormChannels(nn.Module):
    """LayerNorm over the channel axis (≙ normalization.py:5-28)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=1e-4, scale_init=nn.initializers.constant(0.1), name="ln")(x)


class ConvLayerNorm(nn.Module):
    """conv -> layernorm -> relu -> dropout stack + residual projection
    (≙ ConvLayerNorm prenet, glow.py:8-50)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    num_layers: int = 3
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, train: bool = True) -> Array:
        x_org = x
        y = x
        for i in range(self.num_layers):
            y = nn.Conv(self.hidden_channels, (self.kernel_size,),
                        padding="SAME", name=f"conv_{i}")(y * x_mask)
            y = nn.LayerNorm(epsilon=1e-4, scale_init=nn.initializers.constant(0.1), name=f"ln_{i}")(y)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        # zero-init residual projection
        y = nn.Conv(self.out_channels, (1,),
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="proj")(y)
        return (x_org + y) * x_mask


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init support
    (≙ ActNorm, normalization.py:48-107).

    Forward: z = (bias + exp(logs) * x) * mask; when the 'ddi' collection is
    mutable, masked mean/std of the input are recorded so the trainer can
    overwrite (bias, logs) once before training (≙ set_ddi / initialize)."""

    channels: int

    @nn.compact
    def __call__(self, x: Array, x_mask: Optional[Array] = None,
                 g: Optional[Array] = None, reverse: bool = False
                 ) -> Tuple[Array, Optional[Array]]:
        if x_mask is None:
            x_mask = jnp.ones((x.shape[0], x.shape[1], 1), x.dtype)
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))

        if self.is_mutable_collection("ddi") and not reverse:
            denom = jnp.maximum(x_mask.sum(), 1.0)
            m = (x * x_mask).sum(axis=(0, 1)) / denom
            m_sq = (x * x * x_mask).sum(axis=(0, 1)) / denom
            v = jnp.maximum(m_sq - m**2, 1e-6)
            init_logs = -0.5 * jnp.log(v)
            init_bias = -m * jnp.exp(init_logs)
            mean_var = self.variable("ddi", "logs", lambda: init_logs)
            mean_var.value = init_logs
            bias_var = self.variable("ddi", "bias", lambda: init_bias)
            bias_var.value = init_bias
            # Self-initialize IN-PASS (≙ reference ActNorm.forward: initialize
            # then apply, normalization.py:60-66): downstream ActNorms must see
            # THIS layer already normalized, or their collected stats are fit
            # to the unnormalized cascade — per-channel stds != 1 then compound
            # across the 12 flows (z blew up ~5000x on real LJSpeech mels;
            # sine fixtures masked it).
            logs, bias = init_logs, init_bias

        lengths = x_mask.sum(axis=(1, 2)).astype(jnp.float32)
        if not reverse:
            z = (bias + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs.astype(jnp.float32)) * lengths
            return z, logdet
        z = (x - bias) * jnp.exp(-logs) * x_mask
        return z, None


def _closed_form_inv(w: Array) -> Array:
    """LAPACK-free inverse for tiny (n<=5) matrices via cofactor/adjugate
    expansion: plain arithmetic HLO, so the inverse flow stages through
    jax2tf -> SavedModel/TFLite, whose host runtime has no lapack FFI handler
    (jnp.linalg.inv failed there with 'No FFI handler registered for
    lapack_sgetrf_ffi'). Exact enough for the near-orthogonal 4x4 invconv
    weights; falls back to jnp.linalg.inv for larger n."""
    n = w.shape[0]
    if n > 5:
        return jnp.linalg.inv(w)

    def minor(m, i, j):
        m = jnp.delete(m, i, axis=0, assume_unique_indices=True)
        return jnp.delete(m, j, axis=1, assume_unique_indices=True)

    def det(m):
        k = m.shape[0]
        if k == 1:
            return m[0, 0]
        return sum(((-1.0) ** j) * m[0, j] * det(minor(m, 0, j))
                   for j in range(k))

    cof = jnp.stack([
        jnp.stack([((-1.0) ** (i + j)) * det(minor(w, i, j))
                   for j in range(n)])
        for i in range(n)])
    return cof.T / det(w)


class InvConvNear(nn.Module):
    """Invertible 1x1 conv over channel groups of ``n_split``
    (≙ InvConvNear, glow.py:151-208)."""

    channels: int
    n_split: int = 4
    no_jacobian: bool = False

    @nn.compact
    def __call__(self, x: Array, x_mask: Optional[Array] = None,
                 g: Optional[Array] = None, reverse: bool = False
                 ) -> Tuple[Array, Optional[Array]]:
        B, T, C = x.shape
        assert C % self.n_split == 0
        if x_mask is None:
            x_mask = jnp.ones((B, T, 1), x.dtype)

        def ortho_init(key, shape, dtype=jnp.float32):
            w = jax.random.normal(key, shape, dtype)
            q, _ = jnp.linalg.qr(w)
            det = jnp.linalg.det(q)
            # keep det > 0 so logdet is real
            q = q.at[:, 0].set(q[:, 0] * jnp.sign(det))
            return q

        weight = self.param("weight", ortho_init, (self.n_split, self.n_split))

        # group channels exactly like the reference's view/permute:
        # halves first, then n_split/2 interleave (glow.py:168-172)
        half = self.n_split // 2
        xg = x.reshape(B, T, 2, C // self.n_split, half)
        xg = jnp.transpose(xg, (0, 1, 2, 4, 3))  # (B,T,2,half,C//split)
        xg = xg.reshape(B, T, self.n_split, C // self.n_split)

        if reverse:
            w = _closed_form_inv(weight.astype(jnp.float32)).astype(x.dtype)
            logdet = None
        else:
            w = weight
            if self.no_jacobian:
                logdet = jnp.zeros((B,), jnp.float32)
            else:
                lengths = x_mask.sum(axis=(1, 2)).astype(jnp.float32)
                _, ld = jnp.linalg.slogdet(weight.astype(jnp.float32))
                logdet = ld * (C / self.n_split) * lengths

        zg = jnp.einsum("btsg,rs->btrg", xg, w)
        z = zg.reshape(B, T, 2, half, C // self.n_split)
        z = jnp.transpose(z, (0, 1, 2, 4, 3)).reshape(B, T, C)
        return z * x_mask, logdet


class WN(nn.Module):
    """Dilated-conv WaveNet core with weight norm + optional speaker cond
    (≙ WN, glow.py:63-149)."""

    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 4
    c_in_channels: int = 0
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, g: Optional[Array] = None,
                 train: bool = True) -> Array:
        output = jnp.zeros_like(x)
        n_ch_tensor = 2 * self.hidden_channels

        if g is not None and self.c_in_channels > 0:
            # single 1x1 over cond, split per layer (≙ cond_layer, glow.py:84-88)
            g_all = nn.WeightNorm(nn.Conv(
                n_ch_tensor * self.num_layers, (1,), name="cond_layer"))(g)

        y = x
        for i in range(self.num_layers):
            dilation = self.dilation_rate**i
            pad = (self.kernel_size - 1) // 2 * dilation
            x_in = nn.WeightNorm(nn.Conv(
                n_ch_tensor, (self.kernel_size,), kernel_dilation=(dilation,),
                padding=[(pad, pad)], name=f"in_{i}"))(y)
            x_in = nn.Dropout(self.dropout_rate, deterministic=not train)(x_in)
            if g is not None and self.c_in_channels > 0:
                g_l = g_all[..., i * n_ch_tensor: (i + 1) * n_ch_tensor]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = fused_gate(x_in, g_l)
            res_skip_ch = (2 * self.hidden_channels
                           if i < self.num_layers - 1 else self.hidden_channels)
            res_skip = nn.WeightNorm(nn.Conv(res_skip_ch, (1,),
                                             name=f"res_skip_{i}"))(acts)
            if i < self.num_layers - 1:
                y = (y + res_skip[..., : self.hidden_channels]) * x_mask
                output = output + res_skip[..., self.hidden_channels:]
            else:
                output = output + res_skip
        return output * x_mask


class CouplingBlock(nn.Module):
    """Affine coupling: first half conditions an affine transform of the second
    (≙ CouplingBlock, glow.py:211-270)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 4
    c_in_channels: int = 0
    dropout_rate: float = 0.0
    sigmoid_scale: bool = False

    @nn.compact
    def __call__(self, x: Array, x_mask: Optional[Array] = None,
                 g: Optional[Array] = None, reverse: bool = False,
                 train: bool = True) -> Tuple[Array, Optional[Array]]:
        if x_mask is None:
            x_mask = jnp.ones((x.shape[0], x.shape[1], 1), x.dtype)
        half = self.in_channels // 2
        x_0, x_1 = x[..., :half], x[..., half:]

        h = nn.WeightNorm(nn.Conv(self.hidden_channels, (1,),
                                  name="start"))(x_0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.num_layers, self.c_in_channels, self.dropout_rate,
               name="wn")(h, x_mask, g=g, train=train)
        # zero-init end conv -> identity flow at start (glow.py:239-243)
        out = nn.Conv(self.in_channels, (1,),
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="end")(h)

        m = out[..., :half]
        logs = out[..., half:]
        if self.sigmoid_scale:
            logs = jnp.log(1e-6 + jax.nn.sigmoid(logs + 2.0))

        if not reverse:
            z_1 = (m + jnp.exp(logs) * x_1) * x_mask
            logdet = jnp.sum(
                logs.astype(jnp.float32) * x_mask, axis=(1, 2))
            return jnp.concatenate([x_0, z_1], axis=-1), logdet
        z_1 = (x_1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x_0, z_1], axis=-1), None
