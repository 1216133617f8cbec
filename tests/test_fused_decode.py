"""Fused whole-decode Pallas kernel vs the flax scan inference (eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.infer.fast_decode import taco2_fused_inference
from tts_tpu.models.tacotron2 import Tacotron2


def test_matches_scan_inference():
    rng = jax.random.PRNGKey(0)
    model = Tacotron2(num_chars=40, r=2, max_decoder_steps=6,
                      stop_threshold=2.0)  # high threshold: no early stops
    B, T_text, T_mel = 2, 16, 12
    text = jax.random.randint(rng, (B, T_text), 1, 40)
    tl = jnp.array([T_text, T_text - 5], jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, text, tl,
                           jnp.zeros((B, T_mel, 80)),
                           jnp.full((B,), T_mel, jnp.int32))

    want = model.apply(variables, text, tl, max_decoder_steps=6,
                       use_windowing=False,
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       method=Tacotron2.inference)
    got = taco2_fused_inference(model, variables, text, tl,
                                max_decoder_steps=6,
                                compute_dtype=jnp.float32, interpret=True)

    np.testing.assert_allclose(np.asarray(got["alignments"]),
                               np.asarray(want["alignments"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["decoder_outputs"]),
                               np.asarray(want["decoder_outputs"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["stop_logits"]),
                               np.asarray(want["stop_logits"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["postnet_outputs"]),
                               np.asarray(want["postnet_outputs"]), atol=1e-4)


def test_stop_masking_matches():
    rng = jax.random.PRNGKey(3)
    model = Tacotron2(num_chars=40, r=2, max_decoder_steps=8,
                      stop_threshold=0.5)  # random logits -> mixed stops
    B, T_text, T_mel = 2, 12, 12
    text = jax.random.randint(rng, (B, T_text), 1, 40)
    tl = jnp.full((B,), T_text, jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, text, tl,
                           jnp.zeros((B, T_mel, 80)),
                           jnp.full((B,), T_mel, jnp.int32))
    want = model.apply(variables, text, tl, max_decoder_steps=8,
                       use_windowing=False,
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       method=Tacotron2.inference)
    got = taco2_fused_inference(model, variables, text, tl,
                                max_decoder_steps=8,
                                compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["mel_lengths"]),
                                  np.asarray(want["mel_lengths"]))
    np.testing.assert_allclose(np.asarray(got["postnet_outputs"]),
                               np.asarray(want["postnet_outputs"]), atol=1e-4)
