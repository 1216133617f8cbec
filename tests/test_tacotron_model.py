"""Tacotron v1 tests (≙ reference tests/test_tacotron_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tts_tpu.models.registry import setup_model
from tts_tpu.models.tacotron import CBHG, Highway, Tacotron
from tts_tpu.losses.tts_losses import tacotron_loss

RNG = jax.random.PRNGKey(0)


def _batch(B=2, T_text=10, T_mel=12, r=2, linear_dim=513):
    k1, k2, k3 = jax.random.split(RNG, 3)
    return {
        "text": jax.random.randint(k1, (B, T_text), 0, 50),
        "text_lengths": jnp.array([T_text, T_text - 2][:B], jnp.int32),
        "mel": jax.random.normal(k2, (B, T_mel, 80)),
        "linear": jax.random.normal(k3, (B, T_mel, linear_dim)),
        "mel_lengths": jnp.array([T_mel, T_mel - r][:B], jnp.int32),
        "stop_targets": jnp.zeros((B, T_mel // r)).at[:, -1].set(1.0),
    }


class TestLayers:
    def test_highway_shape(self):
        m = Highway(16)
        x = jax.random.normal(RNG, (4, 16))
        p = m.init(RNG, x)
        assert m.apply(p, x).shape == (4, 16)

    def test_cbhg_shape(self):
        m = CBHG(64, K=4, conv_bank_features=32, conv_projections=(32, 64),
                 highway_features=64, gru_features=32)
        x = jax.random.normal(RNG, (2, 9, 64))
        p = m.init(RNG, x)
        y, _ = m.apply(p, x, mutable=["batch_stats"])
        assert y.shape == (2, 9, 64)  # 2 * gru_features


class TestTacotron:
    def _model(self, **kw):
        kw.setdefault("num_chars", 50)
        kw.setdefault("r", 2)
        kw.setdefault("linear_dim", 513)
        return Tacotron(**kw)

    def test_forward_shapes(self):
        model = self._model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        out, _ = model.apply(v, b["text"], b["text_lengths"], b["mel"],
                             b["mel_lengths"], rngs={"dropout": RNG},
                             mutable=["batch_stats"])
        assert out["decoder_outputs"].shape == (2, 12, 80)
        assert out["postnet_outputs"].shape == (2, 12, 513)  # linear bins
        assert out["alignments"].shape == (2, 6, 10)

    def test_train_step(self):
        model = self._model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        tx = optax.adam(1e-3)
        opt = tx.init(v["params"])

        @jax.jit
        def step(params, bs, opt, rng):
            def f(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, b["text"],
                    b["text_lengths"], b["mel"], b["mel_lengths"],
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                losses = tacotron_loss(out, b, r=2, use_linear=True)
                return losses["loss"], (losses, mut)
            (loss, (losses, mut)), grads = jax.value_and_grad(
                f, has_aux=True)(params)
            updates, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates),
                    mut["batch_stats"], opt, losses)

        params, bs = v["params"], v.get("batch_stats", {})
        first = None
        for i in range(5):
            params, bs, opt, losses = step(params, bs, opt,
                                           jax.random.fold_in(RNG, i))
            if first is None:
                first = float(losses["decoder_loss"])
        assert np.isfinite(float(losses["loss"]))
        assert float(losses["decoder_loss"]) < first

    def test_memory_queue(self):
        model = self._model(memory_size=4)
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        out, _ = model.apply(v, b["text"], b["text_lengths"], b["mel"],
                             b["mel_lengths"], rngs={"dropout": RNG},
                             mutable=["batch_stats"])
        assert out["decoder_outputs"].shape == (2, 12, 80)

    def test_inference(self):
        model = self._model()
        b = _batch()
        v = model.init({"params": RNG, "dropout": RNG}, b["text"],
                       b["text_lengths"], b["mel"], b["mel_lengths"])
        out, _ = model.apply(v, b["text"], b["text_lengths"],
                             rngs={"dropout": RNG}, method=model.inference,
                             max_decoder_steps=5, mutable=["batch_stats"])
        assert out["decoder_outputs"].shape == (2, 10, 80)
        assert out["postnet_outputs"].shape == (2, 10, 513)


class TestRegistry:
    def _cfg(self, model):
        return {"model": model, "r": 2,
                "audio": {"num_mels": 80, "fft_size": 1024}}

    @pytest.mark.parametrize("name", ["tacotron", "tacotron2", "glow_tts"])
    def test_setup_model(self, name):
        m = setup_model(50, 1, self._cfg(name))
        assert m is not None

    def test_unknown_model(self):
        with pytest.raises(KeyError):
            setup_model(50, 1, self._cfg("fastspeech"))
