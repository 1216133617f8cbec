"""End-to-end synthesis helper: text -> id sequence -> model -> waveform.

Capability parity with /root/reference/TTS/tts/utils/synthesis.py:10-262
(text_to_seqvec, model dispatch tacotron/glow, GST style conditioning,
Griffin-Lim decode + silence trim). The backend dispatch torch/tf/tflite
collapses to one jitted JAX path (+ the export module for edge targets).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.text import phoneme_to_sequence, text_to_sequence


def text_to_seqvec(text: str, c: Dict, tp=None) -> np.ndarray:
    """(≙ synthesis.py:10-21)."""
    if c.get("use_phonemes", False):
        seq = phoneme_to_sequence(
            text, c.get("text_cleaner", "phoneme_cleaners"),
            language=c.get("phoneme_language", "en-us"),
            enable_eos_bos=c.get("enable_eos_bos_chars", False), tp=tp)
    else:
        seq = text_to_sequence(text, c.get("text_cleaner", "english_cleaners"),
                               tp=tp)
    return np.asarray(seq, dtype=np.int32)


def compute_style_mel(style_wav: str, ap) -> np.ndarray:
    """(≙ synthesis.py:24-30)."""
    wav = ap.load_wav(style_wav)
    return ap.melspectrogram(wav)[None]


TEXT_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512)


def bucket_text_length(n: int, buckets=TEXT_BUCKETS) -> int:
    """Smallest bucket >= n (single-stream serving pads text to a fixed set
    of lengths so XLA compiles a handful of programs instead of one per
    sentence length — each cold compile costs minutes through the tunnel).
    Masked attention makes the padding semantically inert."""
    for b in buckets:
        if n <= b:
            return b
    return n


# jitted-inference cache: one entry per (model, family, static inference
# args, kwarg names). Without this every request executes the model
# OP-BY-OP — measured 5.4 s/request (RTF 1.6) on the tunnel vs ~60 ms
# jitted; jax.jit re-keys on shapes, which text bucketing keeps to a
# handful of programs. LRU-bounded so a long-lived server that reloads
# models (new Synthesizer per checkpoint) does not pin old model objects
# and their executables for the process lifetime.
_JIT_CACHE: "OrderedDict[Any, Any]" = OrderedDict()
_JIT_CACHE_MAX = 32


def _jit_for(key, build):
    fn = _JIT_CACHE.get(key)
    if fn is None:
        # AotJit == jax.jit + per-shape on-disk AOT executable store
        # (utils/aot.py): a fresh process restores the compiled TTS graph
        # in ~1 s instead of paying the remote compile/link. Name the
        # store entry by a digest of the static key (model config + static
        # inference args) so distinct models never collide.
        import hashlib

        from tts_tpu.utils.aot import AotJit
        name = "tts_" + hashlib.sha256(
            repr(key).encode()).hexdigest()[:16]
        fn = _JIT_CACHE[key] = AotJit(build(), name)
        while len(_JIT_CACHE) > _JIT_CACHE_MAX:
            _JIT_CACHE.popitem(last=False)
    else:
        _JIT_CACHE.move_to_end(key)
    return fn


def run_model(model, variables, inputs: jnp.ndarray,
              c: Dict,
              speaker_id: Optional[int] = None,
              speaker_embedding: Optional[np.ndarray] = None,
              style_mel: Optional[np.ndarray] = None,
              max_decoder_steps: Optional[int] = None,
              rng: Optional[Any] = None,
              text_lengths: Optional[jnp.ndarray] = None
              ) -> Dict[str, jnp.ndarray]:
    """Model-family dispatch (≙ run_model_torch, synthesis.py:48-67)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    kwargs: Dict[str, Any] = {}
    if text_lengths is not None:
        kwargs["text_lengths"] = jnp.asarray(text_lengths, jnp.int32)
    if speaker_id is not None:
        kwargs["speaker_ids"] = jnp.asarray([speaker_id], jnp.int32)
    if speaker_embedding is not None:
        kwargs["speaker_embeddings"] = jnp.asarray(speaker_embedding)[None]
    model_name = c.get("model", "tacotron2").lower()
    if model_name == "glow_tts":
        noise_scale = c.get("inference_noise_scale", 0.33)
        length_scale = c.get("length_scale", 1.0)
        y_max = max_decoder_steps or 1024

        def build():
            def fn(variables, inputs, rng, kwargs):
                return model.apply(
                    variables, inputs, rngs={"dropout": rng, "noise": rng},
                    method=model.inference, noise_scale=noise_scale,
                    length_scale=length_scale, y_max_length=y_max, **kwargs)
            return fn

        key = (model, "glow", noise_scale, length_scale, y_max,
               tuple(sorted(kwargs)))
        out = dict(_jit_for(key, build)(variables, inputs, rng, kwargs))
        out["postnet_outputs"] = out["model_outputs"]
        return out
    if style_mel is not None:
        kwargs["style_mel"] = jnp.asarray(style_mel)

    def build():
        def fn(variables, inputs, rng, kwargs):
            return model.apply(
                variables, inputs, rngs={"dropout": rng},
                method=model.inference,
                max_decoder_steps=max_decoder_steps,
                mutable=False, **kwargs)
        return fn

    key = (model, "taco", max_decoder_steps, tuple(sorted(kwargs)))
    return _jit_for(key, build)(variables, inputs, rng, kwargs)


def inv_spectrogram(postnet_output: np.ndarray, ap, c: Dict) -> np.ndarray:
    """(≙ synthesis.py:81-89): linear (tacotron) or mel (tacotron2) GL decode."""
    if c.get("model", "tacotron2").lower() == "tacotron":
        return ap.inv_spectrogram(postnet_output)
    return ap.inv_melspectrogram(postnet_output)


def trim_silence(wav: np.ndarray, ap) -> np.ndarray:
    """(≙ synthesis.py:93-96)."""
    margin = int(ap.sample_rate * 0.01)
    return wav[margin:-margin] if len(wav) > 2 * margin else wav


def synthesis(
    model,
    variables,
    text: str,
    c: Dict,
    ap,
    *,
    use_griffin_lim: bool = True,
    speaker_id: Optional[int] = None,
    speaker_embedding: Optional[np.ndarray] = None,
    style_wav: Optional[str] = None,
    do_trim_silence: bool = False,
    max_decoder_steps: Optional[int] = None,
    tp=None,
    rng=None,
) -> Dict[str, Any]:
    """Full pipeline (≙ synthesis(), synthesis.py:178-262). Returns dict with
    'wav' (if GL), 'postnet_outputs' (normalized spectrogram, valid frames
    only), 'alignments'."""
    seq = text_to_seqvec(text, c, tp=tp)
    n = len(seq)
    text_lengths = None
    if c.get("bucket_text", True):
        b = bucket_text_length(n)
        if b > n:
            seq = np.pad(seq, (0, b - n))
        text_lengths = jnp.asarray([n], jnp.int32)
    inputs = jnp.asarray(seq)[None]
    style_mel = None
    if style_wav is not None and c.get("use_gst", False):
        style_mel = compute_style_mel(style_wav, ap)
    out = run_model(model, variables, inputs, c, speaker_id,
                    speaker_embedding, style_mel, max_decoder_steps, rng,
                    text_lengths=text_lengths)
    postnet = np.asarray(out["postnet_outputs"])[0]
    if "mel_lengths" in out:
        n_valid = int(np.asarray(out["mel_lengths"])[0])
        if n_valid > 0:
            postnet = postnet[:n_valid]
    result: Dict[str, Any] = {
        "postnet_outputs": postnet,
        "alignments": np.asarray(out["alignments"])[0],
        "raw_outputs": out,
    }
    if use_griffin_lim:
        wav = inv_spectrogram(postnet, ap, c)
        if do_trim_silence:
            wav = trim_silence(wav, ap)
        result["wav"] = wav
    return result
