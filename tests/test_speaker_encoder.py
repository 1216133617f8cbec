"""Speaker encoder + GE2E/AngleProto tests (≙ reference tests/test_encoder.py:15-105)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tts_tpu.losses.ge2e import AngleProtoLoss, GE2ELoss
from tts_tpu.models.speaker_encoder import SpeakerEncoder

RNG = jax.random.PRNGKey(0)


class TestSpeakerEncoder:
    def test_embedding_shape_and_norm(self):
        model = SpeakerEncoder(input_dim=40, proj_dim=32, lstm_dim=64,
                               num_lstm_layers=2)
        x = jax.random.normal(RNG, (4, 20, 40))
        params = model.init(RNG, x)
        emb = model.apply(params, x)
        assert emb.shape == (4, 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)

    def test_sliding_window_embedding(self):
        model = SpeakerEncoder(input_dim=40, proj_dim=32, lstm_dim=64,
                               num_lstm_layers=1)
        x = jax.random.normal(RNG, (2, 100, 40))
        params = model.init(RNG, x[:, :40])
        emb = model.apply(params, x, num_frames=40,
                          method=model.compute_embedding)
        assert emb.shape == (2, 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)


def _clustered_dvecs(N=4, M=5, D=16, noise=0.05):
    k1, k2 = jax.random.split(RNG)
    centers = jax.random.normal(k1, (N, 1, D))
    return centers + noise * jax.random.normal(k2, (N, M, D))


class TestGE2E:
    @pytest.mark.parametrize("method", ["softmax", "contrast"])
    def test_clustered_lower_than_random(self, method):
        loss_mod = GE2ELoss(loss_method=method)
        good = _clustered_dvecs(noise=0.01)
        bad = jax.random.normal(jax.random.PRNGKey(9), good.shape)
        p = loss_mod.init(RNG, good)
        l_good = float(loss_mod.apply(p, good))
        l_bad = float(loss_mod.apply(p, bad))
        assert l_good < l_bad

    def test_trainable_end_to_end(self):
        """Encoder + GE2E trains: loss decreases on a fixed batch."""
        N, M, T, F = 3, 4, 10, 20
        enc = SpeakerEncoder(input_dim=F, proj_dim=16, lstm_dim=32,
                             num_lstm_layers=1)
        loss_mod = GE2ELoss()
        x = jax.random.normal(RNG, (N * M, T, F))
        enc_p = enc.init(RNG, x)["params"]
        loss_p = loss_mod.init(RNG, jnp.zeros((N, M, 16)))["params"]
        params = {"enc": enc_p, "loss": loss_p}
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def f(p):
                emb = enc.apply({"params": p["enc"]}, x)
                return loss_mod.apply({"params": p["loss"]},
                                      emb.reshape(N, M, -1))
            loss, grads = jax.value_and_grad(f)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        first = None
        for _ in range(15):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < first

    def test_w_clamped_positive(self):
        loss_mod = GE2ELoss()
        d = _clustered_dvecs()
        p = loss_mod.init(RNG, d)
        p2 = jax.tree_util.tree_map(lambda x: x, p)
        p2["params"]["w"] = jnp.asarray(-3.0)
        val = float(loss_mod.apply(p2, d))
        assert np.isfinite(val)


class TestAngleProto:
    def test_clustered_lower_than_random(self):
        loss_mod = AngleProtoLoss()
        good = _clustered_dvecs(noise=0.01)
        bad = jax.random.normal(jax.random.PRNGKey(9), good.shape)
        p = loss_mod.init(RNG, good)
        assert float(loss_mod.apply(p, good)) < float(loss_mod.apply(p, bad))


class TestSpeakerDataset:
    def test_batch_structure(self, tmp_path):
        from tests.fixtures import make_ljspeech_fixture
        from tts_tpu.audio import AudioProcessor
        from tts_tpu.data.formatters import ljspeech
        from tts_tpu.data.speaker_dataset import SpeakerEncoderDataset

        root = make_ljspeech_fixture(str(tmp_path))
        items = ljspeech(root, "metadata.csv")
        # fake 2 speakers by renaming half
        for i, it in enumerate(items):
            it[2] = f"spk{i % 2}"
        ap = AudioProcessor(sample_rate=22050, num_mels=40, mel_fmax=8000.0)
        ds = SpeakerEncoderDataset(
            ap, items, voice_len_seconds=0.2, num_speakers_in_batch=2,
            num_utters_per_speaker=2)
        batch = ds.next_batch()
        assert batch["mels"].shape[0] == 4  # 2 speakers x 2 utters
        assert batch["mels"].shape[2] == 40
        assert len(set(batch["speaker_names"])) == 2
