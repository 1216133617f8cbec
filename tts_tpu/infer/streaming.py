"""Chunked/streaming Tacotron2 synthesis: time-to-first-audio.

A long sentence is split at word boundaries into fixed-size symbol chunks;
each chunk is decoded with ``Tacotron2.inference_truncated`` — RNN states,
attention context and the last frame persist across chunks while attention
re-initializes per text chunk (≙ the reference's keep_states truncated
decoder, /root/reference/TTS/tts/models/tacotron2.py:165-189 +
tts/layers/tacotron2.py:376-409) — and its mel is vocoded and emitted
immediately. First audio leaves after ONE chunk's decode instead of the
whole utterance's (scripts/bench_single_stream.py --streaming measures it).

Each chunk's decode runs a fixed ``decoder_steps`` budget (static XLA
shape); the emitted frames are trimmed where the attention peak crosses the
chunk's last symbol (mid-sentence chunks never fire the stopnet, so the
gate cannot provide the cut — the attention heuristic does, as in the
reference's truncated-inference notebooks).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.infer.synthesis import (_jit_for, bucket_text_length,
                                     text_to_seqvec)


def chunk_words(text: str, chunk_chars: int) -> List[str]:
    """Split at word boundaries into pieces of <= chunk_chars (a single
    overlong word becomes its own chunk)."""
    words = text.split()
    chunks: List[str] = []
    cur: List[str] = []
    n = 0
    for w in words:
        if cur and n + 1 + len(w) > chunk_chars:
            chunks.append(" ".join(cur))
            cur, n = [], 0
        cur.append(w)
        n += len(w) + (1 if n else 0)
    if cur:
        chunks.append(" ".join(cur))
    return chunks or [text]


def attention_end_step(alignments: np.ndarray, text_len: int) -> int:
    """First decoder step whose attention peak reaches the chunk's last
    symbol (returns the step count to KEEP; all steps if never reached)."""
    peaks = np.argmax(alignments, axis=-1)  # (steps,)
    hits = np.nonzero(peaks >= text_len - 1)[0]
    return int(hits[0]) + 1 if len(hits) else alignments.shape[0]


def stream_mel_chunks(model, variables, text: str, c: Dict, *,
                      tp=None,
                      chunk_chars: int = 48,
                      decoder_steps: int = 128,
                      speaker_id: Optional[int] = None,
                      ) -> Iterator[Dict[str, Any]]:
    """Yield {'mel': (frames, n_mels), 'chunk_text': str, 'final': bool}
    per text chunk, decoder state threaded across chunks."""
    model_name = c.get("model", "tacotron2").lower()
    if model_name not in ("tacotron2", "tacotron"):
        raise ValueError(f"streaming decode is for the tacotron family "
                         f"(parallel models emit full mels at once), got "
                         f"{model_name}")

    chunks = chunk_words(text, chunk_chars)
    state = None
    kwargs_base: Dict[str, Any] = {}
    if speaker_id is not None:
        kwargs_base["speaker_ids"] = jnp.asarray([speaker_id], jnp.int32)

    for i, chunk_text in enumerate(chunks):
        seq = text_to_seqvec(chunk_text, c, tp=tp)
        bucket = bucket_text_length(len(seq))
        padded = np.zeros((1, bucket), np.int32)
        padded[0, : len(seq)] = seq
        lengths = jnp.asarray([len(seq)], jnp.int32)
        kwargs = dict(kwargs_base)
        if state is not None:
            kwargs["decoder_state"] = state

        def build():
            def fn(variables, inputs, lengths, kwargs):
                return model.apply(
                    variables, inputs, lengths,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                    method=model.inference_truncated,
                    max_decoder_steps=decoder_steps,
                    mutable=False, **kwargs)
            return fn

        key = (model, "taco_trunc", decoder_steps, bucket,
               state is not None, tuple(sorted(kwargs_base)))
        out = _jit_for(key, build)(variables, jnp.asarray(padded),
                                   lengths, kwargs)
        state = out["decoder_state"]

        align = np.asarray(out["alignments"])[0]       # (steps, bucket)
        final = i == len(chunks) - 1
        if final:
            # last chunk: the stopnet CAN fire — honor it if it did
            n_frames = int(np.asarray(out["mel_lengths"])[0])
            if n_frames <= 0 or n_frames >= align.shape[0] * model.r:
                n_steps = attention_end_step(align, len(seq))
                n_frames = n_steps * model.r
        else:
            n_steps = attention_end_step(align, len(seq))
            n_frames = n_steps * model.r
        mel = np.asarray(out["postnet_outputs"])[0, :n_frames]
        yield {"mel": mel, "chunk_text": chunk_text, "final": final}
