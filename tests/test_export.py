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


class TestMaxAbsDiff:
    def test_metric(self):
        assert max_abs_diff([1.0, 2.0], [1.0, 2.5]) == pytest.approx(0.5)
