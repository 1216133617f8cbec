"""Export/deployment tests (≙ reference torch<->TF parity tier,
tests/test_tacotron2_tf_model.py:26-137, re-based on jax2tf)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from tts_tpu.export import (export_saved_model, export_tflite, load_tflite,
                            max_abs_diff, run_tflite)
from tts_tpu.models.vocoder.melgan import MelganGenerator

RNG = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def melgan():
    gen = MelganGenerator(base_channels=32, num_res_blocks=1,
                          upsample_factors=(4, 4))
    mel = jax.random.normal(RNG, (1, 8, 80))
    params = gen.init(RNG, mel)

    def fn(m):
        return gen.apply(params, m)

    return fn, mel


class TestSavedModel:
    def test_roundtrip_parity(self, melgan, tmp_path):
        fn, mel = melgan
        out_dir = str(tmp_path / "saved")
        export_saved_model(fn, [mel], out_dir)
        loaded = tf.saved_model.load(out_dir)
        tf_out = loaded.f(np.asarray(mel)).numpy()
        jax_out = np.asarray(fn(mel))
        assert max_abs_diff(tf_out, jax_out) < 1e-4


class TestTFLite:
    def test_export_and_run(self, melgan, tmp_path):
        fn, mel = melgan
        path = str(tmp_path / "melgan.tflite")
        export_tflite(fn, [mel], path)
        interp = load_tflite(path)
        tfl_out = run_tflite(interp, np.asarray(mel, np.float32))
        jax_out = np.asarray(fn(mel))
        assert tfl_out.shape == jax_out.shape
        # TFLite applies default optimizations; allow loose tolerance
        assert max_abs_diff(tfl_out, jax_out) < 5e-2


@pytest.fixture(scope="module")
def taco2():
    """Tacotron2 autoregressive INFERENCE (nn.scan decoder + stop masking) —
    the reference's flagship TFLite artifact and the hard jax2tf case: the
    scan must stage to a TF while_loop with a fixed signature
    (≙ /root/reference/TTS/tts/tf/models/tacotron2.py:88-110 +
    tts/tf/utils/tflite.py:4-26)."""
    from tts_tpu.models.tacotron2 import Tacotron2

    model = Tacotron2(num_chars=32, r=2, encoder_dim=64, embedding_dim=64,
                      attn_dim=32, max_decoder_steps=12)
    text = jax.random.randint(RNG, (1, 8), 1, 32)
    lens = jnp.array([8], jnp.int32)
    mel = jnp.zeros((1, 12, 80))
    variables = model.init({"params": RNG, "dropout": RNG}, text, lens,
                           mel, jnp.array([12], jnp.int32))

    def fn(t, tl):
        out = model.apply(variables, t, tl, method=Tacotron2.inference)
        return out["postnet_outputs"]

    return fn, text, lens


@pytest.fixture(scope="module")
def glow():
    """Glow-TTS inference (duration head + parallel inverse flow),
    deterministic at noise_scale=0."""
    from tts_tpu.models.glow_tts import GlowTTS

    model = GlowTTS(num_chars=32, hidden_channels_enc=64,
                    hidden_channels_dec=64, filter_channels=128,
                    filter_channels_dp=64, num_layers_enc=2,
                    num_flow_blocks_dec=2)
    text = jax.random.randint(RNG, (1, 8), 1, 32)
    lens = jnp.array([8], jnp.int32)
    mel = jax.random.normal(RNG, (1, 16, 80)) * 0.1
    variables = model.init({"params": RNG, "dropout": RNG}, text, lens,
                           mel, jnp.array([16], jnp.int32))

    def fn(t, tl):
        out = model.apply(variables, t, tl, noise_scale=0.0,
                          y_max_length=32, rng=jax.random.PRNGKey(1),
                          method=GlowTTS.inference)
        return out["model_outputs"]

    return fn, text, lens


class TestTacotron2Export:
    def test_saved_model_parity(self, taco2, tmp_path):
        fn, text, lens = taco2
        out_dir = str(tmp_path / "taco2_saved")
        export_saved_model(fn, [text, lens], out_dir)
        loaded = tf.saved_model.load(out_dir)
        tf_out = loaded.f(np.asarray(text), np.asarray(lens)).numpy()
        jax_out = np.asarray(fn(text, lens))
        assert tf_out.shape == jax_out.shape
        assert max_abs_diff(tf_out, jax_out) < 1e-4

    def test_tflite_parity(self, taco2, tmp_path):
        fn, text, lens = taco2
        path = str(tmp_path / "taco2.tflite")
        export_tflite(fn, [text, lens], path)
        interp = load_tflite(path)
        tfl_out = run_tflite(interp, np.asarray(text), np.asarray(lens))
        jax_out = np.asarray(fn(text, lens))
        assert tfl_out.shape == jax_out.shape
        assert max_abs_diff(tfl_out, jax_out) < 5e-2


class TestGlowExport:
    def test_saved_model_parity(self, glow, tmp_path):
        fn, text, lens = glow
        out_dir = str(tmp_path / "glow_saved")
        export_saved_model(fn, [text, lens], out_dir)
        loaded = tf.saved_model.load(out_dir)
        tf_out = loaded.f(np.asarray(text), np.asarray(lens)).numpy()
        jax_out = np.asarray(fn(text, lens))
        assert tf_out.shape == jax_out.shape
        assert max_abs_diff(tf_out, jax_out) < 1e-4

    def test_tflite_parity(self, glow, tmp_path):
        fn, text, lens = glow
        path = str(tmp_path / "glow.tflite")
        export_tflite(fn, [text, lens], path)
        interp = load_tflite(path)
        tfl_out = run_tflite(interp, np.asarray(text), np.asarray(lens))
        jax_out = np.asarray(fn(text, lens))
        assert tfl_out.shape == jax_out.shape
        assert max_abs_diff(tfl_out, jax_out) < 5e-2


class TestMaxAbsDiff:
    def test_metric(self):
        assert max_abs_diff([1.0, 2.0], [1.0, 2.5]) == pytest.approx(0.5)
