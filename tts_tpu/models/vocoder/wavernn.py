"""WaveRNN vocoder (fatchord architecture), TPU-native.

The reference serves WaveRNN only by importing an EXTERNAL repo at runtime
(/root/reference/TTS/server/synthesizer.py:93-125: `from
WaveRNN.models.wavernn import Model` with rnn_dims=512, fc_dims=512,
feat_dims=80, compute_dims=128, res_out_dims=128, res_blocks=10 and
config-driven mode/mulaw/pad/upsample settings). This module implements
that architecture natively so the capability is first-class:

- ``MelResNet`` + ``UpsampleNetwork``: the aux conditioning path — a
  res-block conv stack over mels plus nearest-stretch upsampling with
  smoothing convs, producing per-SAMPLE conditioning split into four aux
  groups.
- ``WaveRNNCell``: one sample step (fc_in -> GRU1 -> +res -> GRU2 -> +res
  -> fc1 -> fc2 -> logits over 2**bits classes). ONE cell shared by both
  passes below, so training and sampling provably use the same params.
- ``WaveRNN.__call__``: teacher-forced training forward — ``nn.scan`` of
  the cell over all samples with ground-truth previous samples.
- ``WaveRNN.generate``: autoregressive sampling as one ``nn.scan`` with
  the sampled value fed back through the carry — static shapes, no host
  round trip, categorical sampling under a JAX PRNG key.

TPU-first notes: the sequential sample loop is inherently latency-bound
(hop*frames scan steps); WaveRNN is provided for capability parity and
offline use — the production serving path remains the parallel MB-MelGAN
megakernel (CLAUDE.md). Mode 'mold' (mixture of logistics) is out of
scope; bits-mode mu-law is what the reference's shipped models use.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def mulaw_encode_jnp(x: Array, qc: int) -> Array:
    """mu-law companding + quantization to int ids (device twin of
    audio/processor.py:303-316)."""
    mu = qc - 1
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return jnp.clip((y + 1.0) / 2.0 * mu + 0.5, 0, mu).astype(jnp.int32)


def mulaw_decode_jnp(ids: Array, qc: int) -> Array:
    mu = qc - 1
    y = 2.0 * ids.astype(jnp.float32) / mu - 1.0
    return jnp.sign(y) / mu * (jnp.power(1.0 + mu, jnp.abs(y)) - 1.0)


def label_to_float(ids: Array, bits: int) -> Array:
    """Class id -> [-1, 1] network input (fatchord: 2*x/(2^bits-1) - 1)."""
    return 2.0 * ids.astype(jnp.float32) / (2 ** bits - 1.0) - 1.0


class MelResNet(nn.Module):
    """res_blocks x [1x1 conv + BN + relu] over mels after a VALID conv
    that trims ``pad`` context frames each side."""

    res_blocks: int = 10
    compute_dims: int = 128
    res_out_dims: int = 128
    pad: int = 2

    @nn.compact
    def __call__(self, mel: Array, train: bool = False) -> Array:
        k = 2 * self.pad + 1
        x = nn.Conv(self.compute_dims, (k,), padding="VALID",
                    use_bias=False, name="conv_in")(mel)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn_in")(x)
        x = nn.relu(x)
        for i in range(self.res_blocks):
            r = x
            x = nn.Conv(self.compute_dims, (1,), use_bias=False,
                        name=f"res_{i}_conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"res_{i}_bn1")(x)
            x = nn.relu(x)
            x = nn.Conv(self.compute_dims, (1,), use_bias=False,
                        name=f"res_{i}_conv2")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"res_{i}_bn2")(x)
            x = x + r
        return nn.Conv(self.res_out_dims, (1,), name="conv_out")(x)


class UpsampleNetwork(nn.Module):
    """Stretch-and-smooth mel upsampling + aux path (fatchord
    use_upsample_net=True, use_aux_net=True)."""

    upsample_factors: Sequence[int] = (4, 8, 8)
    pad: int = 2
    res_blocks: int = 10
    compute_dims: int = 128
    res_out_dims: int = 128

    @nn.compact
    def __call__(self, mel: Array, train: bool = False
                 ) -> Tuple[Array, Array]:
        """mel (B, T, M) -> (cond (B, (T-2*pad)*hop, M),
        aux (B, (T-2*pad)*hop, res_out_dims))."""
        total = 1
        for f in self.upsample_factors:
            total *= f
        aux = MelResNet(self.res_blocks, self.compute_dims,
                        self.res_out_dims, self.pad, name="resnet")(
                            mel, train=train)
        # aux stretched to sample rate (nearest repeat, ≙ Stretch2d)
        aux = jnp.repeat(aux, total, axis=1)

        x = mel
        for i, f in enumerate(self.upsample_factors):
            # nearest stretch then a smoothing conv over 2f+1 taps with ONE
            # k-tap filter SHARED across all mel bins — the fatchord
            # parameterization (Stretch2d + Conv2d(1, 1, (1, 2f+1)) filled
            # 1/k), stored as a (k, 1, 1) param so external checkpoints
            # port 1:1 (compat/torch_port.py::port_wavernn); broadcast to a
            # depthwise kernel at apply time.
            x = jnp.repeat(x, f, axis=1)
            k = 2 * f + 1
            kern = self.param(f"smooth_{i}_kernel",
                              nn.initializers.constant(1.0 / k), (k, 1, 1))
            x = jax.lax.conv_general_dilated(
                x, jnp.broadcast_to(kern, (k, 1, x.shape[-1])),
                window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=x.shape[-1])
        x = x[:, self.pad * total:-(self.pad * total) or None]
        return x, aux


class WaveRNNCell(nn.Module):
    """One autoregressive sample step; carry = (h1, h2)."""

    bits: int = 10
    rnn_dims: int = 512
    fc_dims: int = 512

    @nn.compact
    def __call__(self, carry, inputs):
        h1, h2 = carry
        x_prev, cond, a1, a2, a3, a4 = inputs
        h = nn.Dense(self.rnn_dims, name="I")(
            jnp.concatenate([x_prev[..., None], cond, a1], axis=-1))
        h1, out1 = nn.GRUCell(self.rnn_dims, name="rnn1")(h1, h)
        h = h + out1
        h2, out2 = nn.GRUCell(self.rnn_dims, name="rnn2")(
            h2, jnp.concatenate([h, a2], axis=-1))
        h = h + out2
        h = nn.relu(nn.Dense(self.fc_dims, name="fc1")(
            jnp.concatenate([h, a3], axis=-1)))
        h = nn.relu(nn.Dense(self.fc_dims, name="fc2")(
            jnp.concatenate([h, a4], axis=-1)))
        logits = nn.Dense(2 ** self.bits, name="fc3")(h)
        return (h1, h2), logits


class WaveRNN(nn.Module):
    """Fatchord WaveRNN, bits mode (categorical over 2**bits classes)."""

    bits: int = 10
    rnn_dims: int = 512
    fc_dims: int = 512
    feat_dims: int = 80
    compute_dims: int = 128
    res_out_dims: int = 128
    res_blocks: int = 10
    pad: int = 2
    upsample_factors: Sequence[int] = (4, 8, 8)
    mulaw: bool = True

    def setup(self):
        self.upsample = UpsampleNetwork(
            self.upsample_factors, self.pad, self.res_blocks,
            self.compute_dims, self.res_out_dims, name="upsample")
        self.cell = WaveRNNCell(self.bits, self.rnn_dims, self.fc_dims,
                                name="cell")

    @property
    def hop(self) -> int:
        total = 1
        for f in self.upsample_factors:
            total *= f
        return total

    def _features(self, mel: Array, train: bool):
        """(cond, a1..a4) per sample, time-major for scanning."""
        cond, aux = self.upsample(mel, train=train)
        d = self.res_out_dims // 4
        parts = (cond, aux[..., :d], aux[..., d:2 * d],
                 aux[..., 2 * d:3 * d], aux[..., 3 * d:])
        return tuple(jnp.swapaxes(p, 0, 1) for p in parts)  # (T, B, .)

    def __call__(self, x: Array, mel: Array, train: bool = False) -> Array:
        """Teacher-forced forward. x (B, T_samples) previous-sample floats
        in [-1, 1]; mel (B, T_frames, M) with ``pad`` context frames each
        side: T_samples == (T_frames - 2*pad) * hop. Returns logits
        (B, T_samples, 2**bits)."""
        cond, a1, a2, a3, a4 = self._features(mel, train)
        B = x.shape[0]
        xs = (jnp.swapaxes(x, 0, 1), cond, a1, a2, a3, a4)
        scan = nn.scan(
            lambda cell, c, inp: cell(c, inp),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0, out_axes=0)
        zeros = jnp.zeros((B, self.rnn_dims))
        _, logits = scan(self.cell, (zeros, zeros), xs)
        return jnp.swapaxes(logits, 0, 1)

    def generate(self, mel: Array, rng: Array,
                 temperature: float = 1.0) -> Array:
        """Autoregressive sampling; returns float waveform (B, T_samples)
        in [-1, 1] (mu-law expanded when ``mulaw``)."""
        cond, a1, a2, a3, a4 = self._features(mel, False)
        B = cond.shape[1]

        def body(cell, carry, inp):
            h1, h2, x_prev, key = carry
            c_t, b1, b2, b3, b4 = inp
            (h1, h2), logits = cell((h1, h2),
                                    (x_prev, c_t, b1, b2, b3, b4))
            key, sub = jax.random.split(key)
            ids = jax.random.categorical(sub, logits / temperature, axis=-1)
            return (h1, h2, label_to_float(ids, self.bits), key), ids

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        zeros = jnp.zeros((B, self.rnn_dims))
        carry0 = (zeros, zeros, jnp.zeros((B,)), rng)
        _, ids = scan(self.cell, carry0, (cond, a1, a2, a3, a4))
        ids = jnp.swapaxes(ids, 0, 1)              # (B, T)
        if self.mulaw:
            return mulaw_decode_jnp(ids, 2 ** self.bits)
        return label_to_float(ids, self.bits)


def wavernn_loss(logits: Array, target_ids: Array) -> Array:
    """Cross entropy over quantized sample classes (fatchord training)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None], axis=-1)
    return jnp.mean(nll)
