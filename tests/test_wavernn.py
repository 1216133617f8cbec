"""WaveRNN vocoder (models/vocoder/wavernn.py) — native equivalent of the
reference's external-WaveRNN serving path (server/synthesizer.py:93-125)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tts_tpu.models.vocoder.wavernn import (WaveRNN, label_to_float,
                                            mulaw_decode_jnp,
                                            mulaw_encode_jnp, wavernn_loss)

BITS = 8
FACTORS = (2, 2, 4)     # hop 16: small enough for CPU scan tests
PAD = 2


def _model():
    return WaveRNN(bits=BITS, rnn_dims=32, fc_dims=32, feat_dims=20,
                   compute_dims=16, res_out_dims=16, res_blocks=2,
                   pad=PAD, upsample_factors=FACTORS)


def _data(rng, B=2, frames=8):
    hop = 2 * 2 * 4
    mel = jax.random.normal(rng, (B, frames + 2 * PAD, 20))
    t = (frames) * hop
    wav = 0.5 * jnp.sin(jnp.linspace(0, 60, t))[None, :].repeat(B, 0)
    return mel, wav, hop


class TestMulaw:
    def test_roundtrip_matches_numpy(self):
        from tts_tpu.audio.processor import AudioProcessor
        x = np.linspace(-0.99, 0.99, 257).astype(np.float32)
        ids = mulaw_encode_jnp(jnp.asarray(x), 256)
        ref = AudioProcessor.mulaw_encode(x, 256)
        np.testing.assert_array_equal(np.asarray(ids), ref.astype(np.int32))
        dec = mulaw_decode_jnp(ids, 256)
        np.testing.assert_allclose(np.asarray(dec), x, atol=2e-2)


class TestWaveRNN:
    def test_teacher_forced_shapes_and_loss(self):
        rng = jax.random.PRNGKey(0)
        model = _model()
        mel, wav, hop = _data(rng)
        ids = mulaw_encode_jnp(wav, 2 ** BITS)
        x_prev = jnp.pad(label_to_float(ids, BITS)[:, :-1], ((0, 0), (1, 0)))
        v = model.init(rng, x_prev, mel)
        logits, _ = model.apply(v, x_prev, mel, train=True,
                                mutable=["batch_stats"])
        assert logits.shape == (2, wav.shape[1], 2 ** BITS)
        loss = wavernn_loss(logits, ids)
        assert np.isfinite(float(loss))

    def test_train_step_updates_and_reduces_loss(self):
        """5 steps on one tiny batch: every param updates, loss falls
        (the reference test pattern, tests/test_*_train.py style)."""
        rng = jax.random.PRNGKey(0)
        model = _model()
        mel, wav, hop = _data(rng)
        ids = mulaw_encode_jnp(wav, 2 ** BITS)
        x_prev = jnp.pad(label_to_float(ids, BITS)[:, :-1], ((0, 0), (1, 0)))
        v = model.init(rng, x_prev, mel)
        params, bs = v["params"], v.get("batch_stats", {})
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, bs, opt):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, x_prev, mel,
                    train=True, mutable=["batch_stats"])
                return wavernn_loss(out, ids), mut["batch_stats"]
            (loss, bs2), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, opt = tx.update(grads, opt)
            return optax.apply_updates(params, upd), bs2, opt, loss

        p0 = jax.tree_util.tree_leaves(params)
        losses = []
        for _ in range(5):
            params, bs, opt, loss = step(params, bs, opt)
            losses.append(float(loss))
        p1 = jax.tree_util.tree_leaves(params)
        changed = [not np.allclose(a, b) for a, b in zip(p0, p1)]
        assert all(changed), f"{sum(changed)}/{len(changed)} params changed"
        assert losses[-1] < losses[0], losses

    def test_generate_shapes_and_range(self):
        rng = jax.random.PRNGKey(0)
        model = _model()
        mel, wav, hop = _data(rng, B=2, frames=4)
        ids0 = mulaw_encode_jnp(wav, 2 ** BITS)
        x_prev = jnp.pad(label_to_float(ids0, BITS)[:, :-1], ((0, 0), (1, 0)))
        v = model.init(rng, x_prev[:, :4 * hop], mel)
        out = model.apply(v, mel, jax.random.PRNGKey(1),
                          method=WaveRNN.generate)
        assert out.shape == (2, 4 * hop)
        o = np.asarray(out)
        assert np.isfinite(o).all() and np.abs(o).max() <= 1.0

    def test_registry(self):
        from tts_tpu.models.vocoder.registry import setup_generator
        gen = setup_generator({
            "generator_model": "wavernn",
            "generator_model_params": {"bits": 8, "rnn_dims": 32,
                                       "fc_dims": 32, "res_blocks": 2,
                                       "upsample_factors": [2, 2, 4]},
            "audio": {"num_mels": 20}})
        assert isinstance(gen, WaveRNN)
        assert gen.hop == 16
