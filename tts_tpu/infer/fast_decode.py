"""Serving fast path: Tacotron2 inference through the fused decode kernel.

Encoder/postnet run as regular flax/XLA (large batched convs — already
efficient); the autoregressive loop runs in ops/pallas/fused_taco2_decode
with all decoder weights VMEM-resident. Single-speaker, location-sensitive
softmax attention, no windowing (the serving configuration benchmarked in
bench.py); other configurations fall back to ``model.inference``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

import flax.linen as nn

from tts_tpu.models.tacotron2 import Tacotron2
from tts_tpu.ops.pallas.fused_bilstm import fused_bilstm, pack_bilstm_params
from tts_tpu.ops.pallas.fused_taco2_decode import (fused_decode,
                                                   pack_decoder_params)
from tts_tpu.ops.masking import sequence_mask

Array = jnp.ndarray


def taco2_fused_encode(model: Tacotron2, variables: Dict[str, Any],
                       text: Array, text_lengths: Array,
                       compute_dtype=jnp.bfloat16,
                       interpret: bool = False):
    """Eval-mode encoder: embedding + ConvBN stack (XLA) + Pallas BiLSTM.
    Matches model._encode(..., train=False) for the single-speaker, no-GST
    configuration."""
    params = variables["params"]
    stats = variables["batch_stats"]
    x = jnp.take(params["embedding"]["embedding"], text, axis=0)
    # pad-position masking through the conv stack, matching
    # Tacotron2Encoder(mask_pads=True) inference semantics (bit-exact
    # text-length bucketing; models/layers.py)
    pad_mask = sequence_mask(text_lengths, text.shape[1]
                             ).astype(x.dtype)[..., None]
    x = x * pad_mask
    enc_p, enc_s = params["encoder"], stats["encoder"]
    for i in range(3):
        x = nn.Conv(model.encoder_dim, (5,), padding="SAME",
                    use_bias=False).apply(
            {"params": enc_p[f"conv_{i}"]["conv"]}, x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9).apply(
            {"params": enc_p[f"conv_{i}"]["bn"],
             "batch_stats": enc_s[f"conv_{i}"]["bn"]}, x)
        x = nn.relu(x)
        x = x * pad_mask
    wf, bf, wb, bb = pack_bilstm_params(enc_p)
    enc = fused_bilstm(x, text_lengths, wf, bf, wb, bb,
                       compute_dtype=compute_dtype, interpret=interpret)
    # attention input preprocessing (inputs_layer)
    pi = enc @ params["decoder"]["attention"]["inputs_layer"]["kernel"]
    mask = sequence_mask(text_lengths, enc.shape[1])
    return enc, pi, mask


def supports_fused_decode(model: Tacotron2) -> bool:
    return (model.num_speakers == 1 and not model.use_gst
            and model.attn_type == "original" and model.location_attn
            and model.attn_norm == "softmax"
            and not model.use_forward_attn)


def taco2_fused_inference(model: Tacotron2, variables: Dict[str, Any],
                          text: Array, text_lengths: Optional[Array] = None,
                          max_decoder_steps: Optional[int] = None,
                          compute_dtype=jnp.bfloat16,
                          packed: Optional[Dict[str, Array]] = None,
                          two_stage: bool = False,
                          interpret: bool = False) -> Dict[str, Array]:
    """Drop-in for ``model.apply(..., method=model.inference)`` on the
    supported serving configuration. Runs the full static step budget (no
    early exit); 'done' masking matches model.inference."""
    assert supports_fused_decode(model), "config not supported by fused decode"
    B = text.shape[0]
    if text_lengths is None:
        text_lengths = jnp.full((B,), text.shape[1], jnp.int32)
    steps = max_decoder_steps or model.max_decoder_steps

    enc, pi, mask = taco2_fused_encode(model, variables, text, text_lengths,
                                       compute_dtype=compute_dtype,
                                       interpret=interpret)

    if packed is None:
        packed = pack_decoder_params(variables["params"],
                                     n_mels=model.n_mels, t_in=enc.shape[1],
                                     attn_dim=model.attn_dim,
                                     two_stage=two_stage)
    frames, stop_logits, alignments = fused_decode(
        enc, pi, mask, packed, steps=steps, r=model.r, n_mels=model.n_mels,
        compute_dtype=compute_dtype, two_stage=two_stage,
        interpret=interpret)

    # (steps, B, r*M) -> (B, steps*r, M); stop masking as in model.inference
    frames = jnp.swapaxes(frames, 0, 1).reshape(B, steps * model.r,
                                                model.n_mels)
    stop_logits = jnp.swapaxes(stop_logits, 0, 1)      # (B, steps)
    alignments = jnp.swapaxes(alignments, 0, 1)
    done = jax.nn.sigmoid(stop_logits) > model.stop_threshold
    # active[t] == True while no stop fired at any earlier step
    active = jnp.cumsum(done.astype(jnp.int32), axis=1) \
        - done.astype(jnp.int32) == 0
    frame_mask = jnp.repeat(active, model.r, axis=1)[..., None]
    frames = frames * frame_mask

    def post(mdl, dec_out):
        return dec_out + mdl.postnet(dec_out, train=False)

    postnet_outputs = model.apply(variables, dec_out=frames, method=post)
    return {
        "decoder_outputs": frames,
        "postnet_outputs": postnet_outputs * frame_mask,
        "alignments": alignments,
        "stop_logits": stop_logits,
        "mel_lengths": jnp.sum(active.astype(jnp.int32), axis=1) * model.r,
    }
