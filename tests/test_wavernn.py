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


class TestWaveRNNConvergence:
    def test_overfit_tone_and_resample_spectrum(self):
        """Convergence evidence (the harness used for taco2/GST/speakers,
        extended per VERDICT r3 item 4c): overfit a fixed sine on one
        conditioning mel; the CE loss must collapse and near-greedy
        ``generate()`` must reproduce the tone — dominant FFT bin of the
        sampled audio == the target's, and sample-domain correlation
        is high."""
        rng = jax.random.PRNGKey(0)
        model = WaveRNN(bits=BITS, rnn_dims=48, fc_dims=48, feat_dims=8,
                        compute_dims=16, res_out_dims=16, res_blocks=1,
                        pad=PAD, upsample_factors=(2, 2), mulaw=True)
        hop = 4
        frames = 16
        t = frames * hop              # 64 samples
        period = 16
        wav = 0.6 * jnp.sin(2 * jnp.pi * jnp.arange(t) / period)[None]
        mel = jax.random.normal(rng, (1, frames + 2 * PAD, 8)) * 0.5

        ids = mulaw_encode_jnp(wav, 2 ** BITS)
        x_prev = jnp.pad(label_to_float(ids, BITS)[:, :-1], ((0, 0), (1, 0)))
        variables = model.init(rng, x_prev, mel)
        params, batch_stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt):
            def loss_fn(p):
                logits, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    x_prev, mel, train=True, mutable=["batch_stats"])
                return wavernn_loss(logits, ids), mut["batch_stats"]
            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), bs, opt, loss

        loss0 = None
        for i in range(400):
            params, batch_stats, opt, loss = step(params, batch_stats, opt)
            if loss0 is None:
                loss0 = float(loss)
        assert float(loss) < 0.1 * loss0, (loss0, float(loss))

        gen = model.apply({"params": params, "batch_stats": batch_stats},
                          mel, jax.random.PRNGKey(1), 0.05,
                          method=model.generate)
        gen = np.asarray(gen)[0]
        target = np.asarray(wav)[0]
        # dominant (non-DC) frequency must match
        gbin = int(np.abs(np.fft.rfft(gen))[1:].argmax()) + 1
        tbin = int(np.abs(np.fft.rfft(target))[1:].argmax()) + 1
        assert gbin == tbin, (gbin, tbin)
        corr = np.corrcoef(gen, target)[0, 1]
        assert corr > 0.8, corr


class TestMoldMode:
    def _model(self):
        return WaveRNN(bits=8, rnn_dims=32, fc_dims=32, feat_dims=20,
                       compute_dims=16, res_out_dims=16, res_blocks=1,
                       pad=PAD, upsample_factors=(2, 2), mode="mold",
                       nr_mix=4)

    def test_forward_shapes_and_loss(self):
        from tts_tpu.models.vocoder.wavernn import \
            discretized_mix_logistic_loss

        rng = jax.random.PRNGKey(0)
        model = self._model()
        hop = 4
        frames = 6
        mel = jax.random.normal(rng, (2, frames + 2 * PAD, 20))
        wav = 0.5 * jnp.sin(jnp.linspace(0, 30, frames * hop))[None].repeat(2, 0)
        x_prev = jnp.pad(wav[:, :-1], ((0, 0), (1, 0)))
        v = model.init(rng, x_prev, mel)
        params, _ = model.apply(v, x_prev, mel, train=True,
                                mutable=["batch_stats"])
        assert params.shape == (2, frames * hop, 3 * 4)
        loss = discretized_mix_logistic_loss(params, wav)
        assert np.isfinite(float(loss))

    def test_mold_loss_gradients_train(self):
        from tts_tpu.models.vocoder.wavernn import \
            discretized_mix_logistic_loss

        rng = jax.random.PRNGKey(0)
        model = self._model()
        hop, frames = 4, 6
        mel = jax.random.normal(rng, (1, frames + 2 * PAD, 20)) * 0.3
        wav = 0.4 * jnp.sin(jnp.linspace(0, 20, frames * hop))[None]
        x_prev = jnp.pad(wav[:, :-1], ((0, 0), (1, 0)))
        v = model.init(rng, x_prev, mel)
        params, bs = v["params"], v["batch_stats"]
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, bs, opt):
            def loss_fn(p):
                out, mut = model.apply({"params": p, "batch_stats": bs},
                                       x_prev, mel, train=True,
                                       mutable=["batch_stats"])
                return discretized_mix_logistic_loss(out, wav), \
                    mut["batch_stats"]
            (loss, bs2), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), bs2, opt, loss

        first = None
        for _ in range(40):
            params, bs, opt, loss = step(params, bs, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < first, (first, float(loss))
        assert np.isfinite(float(loss))

    def test_generate_range_and_shapes(self):
        rng = jax.random.PRNGKey(0)
        model = self._model()
        mel = jax.random.normal(rng, (2, 6 + 2 * PAD, 20))
        v = model.init(rng, jnp.zeros((2, 2 * 4)), mel[:, :2 + 2 * PAD])
        wav = model.apply(v, mel, jax.random.PRNGKey(1),
                          method=model.generate)
        assert wav.shape == (2, 6 * 4)
        assert np.all(np.abs(np.asarray(wav)) <= 1.0)

    def test_mol_sampler_concentrates_on_selected_mean(self):
        """Crafted mixture params: one dominant component with tiny scale
        -> samples land on its mean."""
        from tts_tpu.models.vocoder.wavernn import \
            sample_from_discretized_mix_logistic

        B, nr_mix = 512, 4
        y_hat = np.zeros((B, 3 * nr_mix), np.float32)
        y_hat[:, 0] = 20.0                 # logit: component 0 dominates
        y_hat[:, nr_mix + 0] = 0.5         # its mean
        y_hat[:, 2 * nr_mix:] = -8.0       # tiny scales everywhere
        x = sample_from_discretized_mix_logistic(
            jnp.asarray(y_hat), jax.random.PRNGKey(0))
        x = np.asarray(x)
        assert np.abs(x - 0.5).max() < 0.02, np.abs(x - 0.5).max()

    def test_registry_mode(self):
        from tts_tpu.models.vocoder.registry import setup_generator

        gen = setup_generator({
            "generator_model": "wavernn", "mode": "mold",
            "generator_model_params": {"nr_mix": 4},
            "audio": {"num_mels": 20}})
        assert gen.mode == "mold" and gen.nr_mix == 4


def test_registry_integer_mode_means_bits():
    """Reference configs overload "mode": an INT selects bits mode with
    that many bits (fatchord 2**mode classes)."""
    from tts_tpu.models.vocoder.registry import setup_generator

    gen = setup_generator({
        "generator_model": "wavernn", "mode": 9,
        "generator_model_params": {}, "audio": {"num_mels": 20}})
    assert gen.mode == "bits" and gen.bits == 9
