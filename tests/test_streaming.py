"""Streaming (chunked inference_truncated) synthesis tests
(≙ the reference's truncated-decoder semantics,
/root/reference/TTS/tts/layers/tacotron2.py:376-409 keep_states)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.infer.streaming import (attention_end_step, chunk_words,
                                     stream_mel_chunks)
from tts_tpu.models.tacotron2 import Tacotron2

RNG = jax.random.PRNGKey(0)

CONFIG = {"model": "tacotron2", "use_phonemes": False,
          "text_cleaner": "english_cleaners"}


def _small_model():
    model = Tacotron2(num_chars=200, r=2, encoder_dim=64, embedding_dim=64,
                      attn_dim=32, max_decoder_steps=16)
    text = jax.random.randint(RNG, (1, 8), 1, 60)
    lens = jnp.array([8], jnp.int32)
    mel = jnp.zeros((1, 16, 80))
    variables = model.init({"params": RNG, "dropout": RNG}, text, lens,
                           mel, jnp.array([16], jnp.int32))
    return model, variables


class TestChunking:
    def test_word_boundaries(self):
        chunks = chunk_words("the quick brown fox jumps over the lazy dog",
                             chunk_chars=15)
        assert all(len(c) <= 15 for c in chunks)
        assert " ".join(chunks) == "the quick brown fox jumps over the lazy dog"

    def test_single_long_word(self):
        assert chunk_words("supercalifragilistic", 5) == \
            ["supercalifragilistic"]

    def test_attention_end_step(self):
        align = np.zeros((6, 10), np.float32)
        for s in range(6):
            align[s, min(2 * s, 9)] = 1.0  # peak sweeps 0,2,4,6,8,9
        assert attention_end_step(align, text_len=9) == 5
        assert attention_end_step(align, text_len=30) == 6  # never reached


class TestStreamMelChunks:
    def test_yields_per_chunk_and_threads_state(self):
        model, variables = _small_model()
        text = "hello world this is a longer sentence for chunked decoding"
        pieces = list(stream_mel_chunks(model, variables, text, CONFIG,
                                        chunk_chars=20, decoder_steps=8))
        assert len(pieces) == len(chunk_words(text, 20))
        assert pieces[-1]["final"] and not pieces[0]["final"]
        for p in pieces:
            assert p["mel"].ndim == 2 and p["mel"].shape[1] == 80
            assert np.isfinite(p["mel"]).all()
            assert p["mel"].shape[0] % model.r == 0

    def test_carried_state_changes_continuation(self):
        """The second chunk decoded WITH the first chunk's carried decoder
        state must differ from the same chunk decoded fresh — proves the
        keep_states threading is live, not cosmetic."""
        model, variables = _small_model()
        text = "hello world again and again"
        chunks = chunk_words(text, 12)
        assert len(chunks) >= 2
        pieces = list(stream_mel_chunks(model, variables, text, CONFIG,
                                        chunk_chars=12, decoder_steps=8))
        fresh = list(stream_mel_chunks(model, variables, chunks[1], CONFIG,
                                       chunk_chars=12, decoder_steps=8))
        carried = pieces[1]["mel"]
        alone = fresh[0]["mel"]
        n = min(carried.shape[0], alone.shape[0])
        assert n > 0
        assert np.abs(carried[:n] - alone[:n]).max() > 1e-6

    def test_glow_rejected(self):
        import pytest
        with pytest.raises(ValueError):
            next(stream_mel_chunks(None, None, "hi", {"model": "glow_tts"}))
