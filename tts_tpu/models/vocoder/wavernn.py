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

TPU-first notes: the sequential sample loop scans one cell step per
sample but is REAL-TIME capable on chip (RTF 0.37 at B=1 measured,
CLAUDE.md); the production batch serving path remains the parallel
MB-MelGAN megakernel. Both reference hook modes are supported: 'bits'
(mu-law categorical — the shipped-model configuration) and 'mold'
(discretized mixture of logistics over raw samples).
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


# ---------------------------------------------------------------------------
# Discretized mixture of logistics ('mold' mode, fatchord distribs.py)
# ---------------------------------------------------------------------------

def discretized_mix_logistic_loss(y_hat: Array, y: Array,
                                  num_classes: int = 65536,
                                  log_scale_min: float = -32.23619130191664
                                  ) -> Array:
    """Negative log-likelihood of y in [-1,1] under a discretized mixture
    of logistics. y_hat (B, T, 3*nr_mix) = [logit_probs, means, log_scales];
    y (B, T). Mean over batch and time (the fatchord 'mold' training loss)."""
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:], log_scale_min)

    centered = y[..., None] - means                     # (B, T, nr_mix)
    inv_std = jnp.exp(-log_scales)
    half = 1.0 / (num_classes - 1)
    plus_in = inv_std * (centered + half)
    min_in = inv_std * (centered - half)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)
    # edge cases: 0 and (num_classes-1) buckets integrate to the tails
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)       # log sigmoid
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_std * centered
    # log pdf * bin width: fallback for tiny probability mass
    log_pdf_mid = (mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)
                   + jnp.log(half * 2.0))

    log_probs = jnp.where(
        y[..., None] < -0.999, log_cdf_plus,
        jnp.where(y[..., None] > 0.999, log_one_minus_cdf_min,
                  jnp.where(cdf_delta > 1e-5,
                            jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                            log_pdf_mid)))
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return -jnp.mean(jax.nn.logsumexp(log_probs, axis=-1))


def sample_from_discretized_mix_logistic(y_hat: Array, rng: Array,
                                         log_scale_min: float
                                         = -32.23619130191664) -> Array:
    """Draw samples in [-1,1]; y_hat (B, 3*nr_mix) for one step."""
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    k_sel, k_u = jax.random.split(rng)
    # gumbel-max mixture selection
    sel = jax.random.categorical(k_sel, logit_probs, axis=-1)   # (B,)
    onehot = jax.nn.one_hot(sel, nr_mix)
    means = jnp.sum(y_hat[..., nr_mix:2 * nr_mix] * onehot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y_hat[..., 2 * nr_mix:] * onehot, axis=-1), log_scale_min)
    u = jax.random.uniform(k_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)


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
    """One autoregressive sample step; carry = (h1, h2).

    ``n_classes``: 2**bits logits (bits mode) or 3*nr_mix mixture params
    ('mold' mode); 0 -> derived from ``bits``."""

    bits: int = 10
    rnn_dims: int = 512
    fc_dims: int = 512
    n_classes: int = 0

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
        logits = nn.Dense(self.n_classes or 2 ** self.bits, name="fc3")(h)
        return (h1, h2), logits


class WaveRNN(nn.Module):
    """Fatchord WaveRNN. ``mode='bits'``: categorical over 2**bits
    (mu-law) classes — the erogol shipped-model configuration. ``'mold'``:
    discretized mixture of 10 logistics over raw [-1,1] samples (the
    reference hook's config-driven alternative,
    /root/reference/TTS/server/synthesizer.py:106)."""

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
    mode: str = "bits"
    nr_mix: int = 10

    def setup(self):
        if self.mode not in ("bits", "mold"):
            raise ValueError(f"unknown WaveRNN mode {self.mode!r}")
        self.upsample = UpsampleNetwork(
            self.upsample_factors, self.pad, self.res_blocks,
            self.compute_dims, self.res_out_dims, name="upsample")
        n_classes = (3 * self.nr_mix if self.mode == "mold"
                     else 2 ** self.bits)
        self.cell = WaveRNNCell(self.bits, self.rnn_dims, self.fc_dims,
                                n_classes=n_classes, name="cell")

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

        mold = self.mode == "mold"

        def body(cell, carry, inp):
            h1, h2, x_prev, key = carry
            c_t, b1, b2, b3, b4 = inp
            (h1, h2), logits = cell((h1, h2),
                                    (x_prev, c_t, b1, b2, b3, b4))
            key, sub = jax.random.split(key)
            if mold:
                x = sample_from_discretized_mix_logistic(logits, sub)
                return (h1, h2, x, key), x
            ids = jax.random.categorical(sub, logits / temperature, axis=-1)
            return (h1, h2, label_to_float(ids, self.bits), key), ids

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        zeros = jnp.zeros((B, self.rnn_dims))
        carry0 = (zeros, zeros, jnp.zeros((B,)), rng)
        _, out = scan(self.cell, carry0, (cond, a1, a2, a3, a4))
        out = jnp.swapaxes(out, 0, 1)              # (B, T)
        if mold:
            return out                              # raw [-1,1] samples
        if self.mulaw:
            return mulaw_decode_jnp(out, 2 ** self.bits)
        return label_to_float(out, self.bits)


def wavernn_loss(logits: Array, target_ids: Array) -> Array:
    """Cross entropy over quantized sample classes (fatchord training)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None], axis=-1)
    return jnp.mean(nll)
