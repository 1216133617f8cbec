"""Glow-TTS: transformer encoder + duration predictor + flow decoder + MAS.

Capability parity with /root/reference/TTS/tts/models/glow_tts.py:12-197:
training forward runs the mel through the flow to latent z, computes the
(text x frame) Gaussian log-likelihood map with two matmuls, finds the best
monotonic alignment with the on-device MAS kernel (stop_gradient — ≙ the
reference's no_grad block, glow_tts.py:140-152), and returns the MLE terms;
inference expands encoder stats by predicted durations (generate_path) and
inverts the flow. ``store_inverse`` (l.196-197) is unneeded: the reverse pass
folds the 4x4 inverses at trace time.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.models.glow.decoder import FlowDecoder
from tts_tpu.models.glow.encoder import GlowTTSEncoder
from tts_tpu.ops.mas import generate_path, maximum_path, maximum_path_jnp
from tts_tpu.ops.masking import sequence_mask

Array = jnp.ndarray


class GlowTTS(nn.Module):
    num_chars: int = 200
    num_speakers: int = 1
    out_channels: int = 80
    hidden_channels_enc: int = 192
    hidden_channels_dec: int = 192
    filter_channels: int = 768
    filter_channels_dp: int = 256
    encoder_type: str = "transformer"
    num_heads: int = 2
    num_layers_enc: int = 6
    kernel_size: int = 3
    dropout_rate: float = 0.1
    rel_attn_window_size: Optional[int] = 4
    mean_only: bool = True
    use_encoder_prenet: bool = True
    kernel_size_dec: int = 5
    dilation_rate: int = 1
    num_flow_blocks_dec: int = 12
    num_block_layers: int = 4
    dropout_rate_dec: float = 0.05
    num_splits: int = 4
    num_sqz: int = 2
    sigmoid_scale: bool = False
    c_in_channels: int = 0
    mas_impl: str = "jnp"  # "pallas" on TPU

    def setup(self):
        c_in = self.c_in_channels
        if self.num_speakers > 1 and c_in == 0:
            c_in = 64
        self._c_in = c_in
        self.encoder = GlowTTSEncoder(
            num_chars=self.num_chars,
            out_channels=self.out_channels,
            hidden_channels=self.hidden_channels_enc,
            filter_channels=self.filter_channels,
            filter_channels_dp=self.filter_channels_dp,
            encoder_type=self.encoder_type,
            num_heads=self.num_heads,
            num_layers=self.num_layers_enc,
            kernel_size=self.kernel_size,
            dropout_rate=self.dropout_rate,
            rel_attn_window_size=self.rel_attn_window_size,
            mean_only=self.mean_only,
            use_prenet=self.use_encoder_prenet,
            c_in_channels=c_in,
            name="encoder")
        self.decoder = FlowDecoder(
            in_channels=self.out_channels,
            hidden_channels=self.hidden_channels_dec,
            kernel_size=self.kernel_size_dec,
            dilation_rate=self.dilation_rate,
            num_flow_blocks=self.num_flow_blocks_dec,
            num_coupling_layers=self.num_block_layers,
            dropout_rate=self.dropout_rate_dec,
            num_splits=self.num_splits,
            num_sqz=self.num_sqz,
            sigmoid_scale=self.sigmoid_scale,
            c_in_channels=c_in,
            name="decoder")
        if self.num_speakers > 1:
            self.emb_g = nn.Embed(self.num_speakers, c_in, name="emb_g")

    def _speaker_vector(self, speaker_ids: Optional[Array],
                        speaker_embeddings: Optional[Array]) -> Optional[Array]:
        if speaker_embeddings is not None:
            return speaker_embeddings
        if self.num_speakers > 1 and speaker_ids is not None:
            return self.emb_g(speaker_ids)
        return None

    def __call__(self, text: Array, text_lengths: Array, mel: Array,
                 mel_lengths: Array, speaker_ids: Optional[Array] = None,
                 speaker_embeddings: Optional[Array] = None,
                 train: bool = True) -> Dict[str, Array]:
        g = self._speaker_vector(speaker_ids, speaker_embeddings)
        o_mean, o_log_scale, o_dur_log, x_mask = self.encoder(
            text, text_lengths, g=g, train=train)

        y_max = mel.shape[1] // self.num_sqz * self.num_sqz
        mel = mel[:, :y_max]
        mel_lengths_sqz = (mel_lengths // self.num_sqz) * self.num_sqz
        y_mask = sequence_mask(mel_lengths_sqz, y_max).astype(mel.dtype)[..., None]

        z, logdet, y_mask = self.decoder(mel, y_mask, g=g, reverse=False,
                                         train=train)

        # ---- MAS under stop_gradient (≙ no_grad, glow_tts.py:140-152) ----
        zs = jax.lax.stop_gradient(z)
        om = jax.lax.stop_gradient(o_mean)
        ols = jax.lax.stop_gradient(o_log_scale)
        o_scale = jnp.exp(-2.0 * ols)                                    # (B,Tx,C)
        logp1 = jnp.sum(-0.5 * math.log(2 * math.pi) - ols, axis=-1)     # (B,Tx)
        logp2 = jnp.einsum("btc,byc->bty", o_scale, -0.5 * zs**2)        # (B,Tx,Ty)
        logp3 = jnp.einsum("btc,byc->bty", om * o_scale, zs)
        logp4 = jnp.sum(-0.5 * om**2 * o_scale, axis=-1)                 # (B,Tx)
        logp = logp1[..., None] + logp2 + logp3 + logp4[..., None]

        attn_mask = x_mask[:, :, 0:1] * jnp.swapaxes(y_mask, 1, 2)  # (B,Tx,Ty)
        attn = maximum_path(logp, attn_mask, impl=self.mas_impl)
        attn = jax.lax.stop_gradient(attn)

        # expand encoder stats to frame rate through the hard alignment
        y_mean = jnp.einsum("bty,btc->byc", attn, o_mean)
        y_log_scale = jnp.einsum("bty,btc->byc", attn, o_log_scale)
        o_attn_dur = jnp.log1p(jnp.sum(attn, axis=-1))[..., None] * x_mask

        return {
            "z": z,
            "logdet": logdet,
            "y_mean": y_mean,
            "y_log_scale": y_log_scale,
            "o_dur_log": o_dur_log,
            "o_attn_dur": o_attn_dur,
            "alignments": jnp.swapaxes(attn, 1, 2),  # (B, Ty, Tx)
            "x_mask": x_mask,
            "y_mask": y_mask,
            "y_lengths": mel_lengths_sqz,
        }

    def decode_mean(self, y_mean: Array, y_mask: Array,
                    speaker_ids: Optional[Array] = None,
                    speaker_embeddings: Optional[Array] = None) -> Array:
        """Inverse-flow mel reconstruction from frame-rate latent means —
        the flow-family analogue of teacher forcing: fed `__call__`'s
        MAS-aligned ``y_mean``/``y_mask``, the result is an alignment-true,
        noise-free mel prediction. Used by bin/eval_model for mel L1 / MCD
        on Glow checkpoints (the reference has no such eval for glow;
        closest is its inference path glow_tts.py:158-185 at noise 0)."""
        g = self._speaker_vector(speaker_ids, speaker_embeddings)
        mel, _, _ = self.decoder(y_mean * y_mask, y_mask, g=g, reverse=True,
                                 train=False)
        return mel

    def inference(self, text: Array, text_lengths: Optional[Array] = None,
                  speaker_ids: Optional[Array] = None,
                  speaker_embeddings: Optional[Array] = None,
                  noise_scale: float = 0.33, length_scale: float = 1.0,
                  y_max_length: int = 1024,
                  rng: Optional[Array] = None) -> Dict[str, Array]:
        """Duration-driven flow inversion (≙ glow_tts.py:158-185).

        y_max_length is the static frame budget (rounded to num_sqz)."""
        if text_lengths is None:
            text_lengths = jnp.full((text.shape[0],), text.shape[1], jnp.int32)
        g = self._speaker_vector(speaker_ids, speaker_embeddings)
        o_mean, o_log_scale, o_dur_log, x_mask = self.encoder(
            text, text_lengths, g=g, train=False)

        # expm1, not exp: durations were regressed against log1p(sum attn)
        # (≙ glow_tts.py:169 `w = (torch.exp(o_dur_log) - 1) * x_mask`)
        w = jnp.expm1(o_dur_log[..., 0]) * x_mask[..., 0] * length_scale
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=-1), 1, y_max_length
                             ).astype(jnp.int32)
        y_lengths = (jnp.ceil(y_lengths / self.num_sqz) * self.num_sqz
                     ).astype(jnp.int32)
        y_max = y_max_length // self.num_sqz * self.num_sqz

        y_mask = sequence_mask(y_lengths, y_max).astype(o_mean.dtype)[..., None]
        attn_mask = x_mask[:, :, 0:1] * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(w_ceil.astype(jnp.int32), attn_mask)

        y_mean = jnp.einsum("bty,btc->byc", attn, o_mean)
        y_log_scale = jnp.einsum("bty,btc->byc", attn, o_log_scale)

        if noise_scale:
            if rng is None:
                rng = self.make_rng("noise")
            z = (y_mean + jnp.exp(y_log_scale) * noise_scale
                 * jax.random.normal(rng, y_mean.shape)) * y_mask
        else:
            # noise_scale == 0 is static: skip RNG entirely — deterministic
            # serving needs no noise rng, and the TFLite converter cannot
            # legalize the threefry bit ops this would otherwise stage
            z = y_mean * y_mask
        mel, _, _ = self.decoder(z, y_mask, g=g, reverse=True, train=False)
        return {
            "model_outputs": mel,
            "mel_lengths": y_lengths,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "durations_log": o_dur_log,
        }


def glow_tts_loss(outputs: Dict[str, Array], text_lengths: Array,
                  constant_factor_removed: bool = False) -> Dict[str, Array]:
    """Flow MLE + duration loss (≙ GlowTTSLoss, losses.py:288-309)."""
    z = outputs["z"]
    y_mean = outputs["y_mean"]
    y_log_scale = outputs["y_log_scale"]
    logdet = outputs["logdet"]
    y_mask = outputs["y_mask"]
    n_elems = jnp.maximum(jnp.sum(y_mask) * z.shape[-1], 1.0)

    sq = jnp.exp(-2.0 * y_log_scale) * (z - y_mean) ** 2
    log_mle = (0.5 * math.log(2 * math.pi)
               + (jnp.sum(y_log_scale * y_mask)
                  + 0.5 * jnp.sum(sq * y_mask)
                  - jnp.sum(logdet)) / n_elems)

    # Huber loss on log-durations, normalized by token count
    diff = outputs["o_dur_log"] - outputs["o_attn_dur"]
    huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2,
                      jnp.abs(diff) - 0.5)
    n_tokens = jnp.maximum(jnp.sum(text_lengths).astype(jnp.float32), 1.0)
    loss_dur = jnp.sum(huber * outputs["x_mask"]) / n_tokens

    return {"log_mle": log_mle, "loss_dur": loss_dur,
            "loss": log_mle + loss_dur}


def apply_ddi(model: GlowTTS, variables: Dict, batch: Dict, rng) -> Dict:
    """Data-dependent ActNorm init: one forward pass collects masked
    mean/std per ActNorm; returned params have (bias, logs) overwritten
    (≙ data_depended_init, train_glow_tts.py:129-143 + set_ddi)."""
    _, mutated = model.apply(
        variables, batch["text"], batch["text_lengths"], batch["mel"],
        batch["mel_lengths"],
        speaker_ids=batch.get("speaker_ids"),
        speaker_embeddings=batch.get("speaker_embeddings"),
        train=True, rngs={"dropout": rng}, mutable=["ddi"])
    from flax.core import unfreeze
    params = unfreeze(variables["params"])
    ddi = unfreeze(mutated["ddi"])

    def merge(p, d):
        for k, v in d.items():
            if isinstance(v, dict):
                merge(p[k], v)
            else:
                p[k] = v

    merge(params, ddi)
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars
