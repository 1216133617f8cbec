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

from tts_tpu.models.tacotron2 import Tacotron2
from tts_tpu.ops.pallas.fused_taco2_decode import (fused_decode,
                                                   pack_decoder_params)

Array = jnp.ndarray


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
                          interpret: bool = False) -> Dict[str, Array]:
    """Drop-in for ``model.apply(..., method=model.inference)`` on the
    supported serving configuration. Runs the full static step budget (no
    early exit); 'done' masking matches model.inference."""
    assert supports_fused_decode(model), "config not supported by fused decode"
    B = text.shape[0]
    if text_lengths is None:
        text_lengths = jnp.full((B,), text.shape[1], jnp.int32)
    steps = max_decoder_steps or model.max_decoder_steps

    def encode(mdl, text, tl):
        enc, mask = mdl._encode(text, tl, False, None, None, None)
        pi = mdl.decoder.attention.preprocess_inputs(enc)
        return enc, pi, mask

    enc, pi, mask = model.apply(variables, text, text_lengths, method=encode)

    if packed is None:
        packed = pack_decoder_params(variables["params"],
                                     n_mels=model.n_mels, t_in=enc.shape[1],
                                     attn_dim=model.attn_dim)
    frames, stop_logits, alignments = fused_decode(
        enc, pi, mask, packed, steps=steps, r=model.r, n_mels=model.n_mels,
        compute_dtype=compute_dtype, interpret=interpret)

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
