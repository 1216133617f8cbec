"""Vocoder loss + GAN train-step tests (≙ reference tests/test_vocoder_losses.py
and the train_vocoder.py loop semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.losses.vocoder_losses import (
    discriminator_loss, feature_matching_loss, generator_loss, hinge_d_loss,
    hinge_g_loss, mse_d_loss, mse_g_loss, multiscale_stft_loss, stft_loss,
)
from tts_tpu.models.vocoder.melgan import (
    MelganGenerator, MelganMultiscaleDiscriminator,
)
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.train.gan import create_gan_states, make_gan_train_step
from tts_tpu.train.optim import make_optimizer

RNG = jax.random.PRNGKey(0)


class TestSTFTLosses:
    def test_identical_is_zero(self):
        y = jax.random.normal(RNG, (2, 4096))
        sc, mag = stft_loss(y, y, 512, 128, 512)
        assert float(sc) < 1e-6 and float(mag) < 1e-6

    def test_different_is_positive(self):
        k1, k2 = jax.random.split(RNG)
        a = jax.random.normal(k1, (2, 4096))
        b = jax.random.normal(k2, (2, 4096))
        sc, mag = multiscale_stft_loss(a, b)
        assert float(sc) > 0.1 and float(mag) > 0.1

    def test_closer_signal_smaller_loss(self):
        t = jnp.arange(4096) / 22050.0
        y = jnp.sin(2 * jnp.pi * 440 * t)[None]
        near = y + 0.01 * jax.random.normal(RNG, y.shape)
        far = y + 0.5 * jax.random.normal(RNG, y.shape)
        sc_near, mag_near = multiscale_stft_loss(near, y)
        sc_far, mag_far = multiscale_stft_loss(far, y)
        assert float(sc_near) < float(sc_far)
        assert float(mag_near) < float(mag_far)


class TestAdversarialLosses:
    def test_mse_g(self):
        assert float(mse_g_loss([jnp.ones((2, 4))])) < 1e-6
        assert float(mse_g_loss([jnp.zeros((2, 4))])) == pytest.approx(1.0)

    def test_mse_d(self):
        total, lr, lf = mse_d_loss([jnp.zeros((2, 4))], [jnp.ones((2, 4))])
        assert float(total) < 1e-6
        total2, _, _ = mse_d_loss([jnp.ones((2, 4))], [jnp.zeros((2, 4))])
        assert float(total2) == pytest.approx(2.0)

    def test_hinge(self):
        g = hinge_g_loss([jnp.full((2, 2), 3.0)])
        assert float(g) == pytest.approx(-3.0)
        total, _, _ = hinge_d_loss([jnp.full((2, 2), -2.0)],
                                   [jnp.full((2, 2), 2.0)])
        assert float(total) < 1e-6

    def test_feature_matching(self):
        f = [[jnp.ones((2, 8, 4)), jnp.zeros((2, 4, 8))]]
        assert float(feature_matching_loss(f, f)) < 1e-6
        f2 = [[jnp.zeros((2, 8, 4)), jnp.zeros((2, 4, 8))]]
        assert float(feature_matching_loss(f, f2)) == pytest.approx(0.5)


def _gan_batch(T_frames=8, hop=64, conv_pad=0, B=2):
    k1, k2 = jax.random.split(RNG)
    return {
        "audio": jax.random.normal(k1, (B, T_frames * hop, 1)) * 0.1,
        "mel": jax.random.normal(k2, (B, T_frames + 2 * conv_pad, 80)),
    }


class TestGANTrainStep:
    def _models(self):
        gen = MelganGenerator(base_channels=32, num_res_blocks=1,
                              upsample_factors=(4, 4, 2, 2))  # prod=64
        disc = MelganMultiscaleDiscriminator(num_scales=2)
        return gen, disc

    def test_warmup_step_updates_G_only(self):
        gen, disc = self._models()
        batch = _gan_batch()
        sg, sd = create_gan_states(gen, disc, batch, RNG,
                                   make_optimizer(lr=1e-3),
                                   make_optimizer(lr=1e-3))
        d_before = jax.tree_util.tree_map(np.asarray, sd.params)
        step = make_gan_train_step(gen, disc, hop_len=64, conv_pad=0,
                                   train_disc=False, jit=True)
        sg2, sd2, losses = step(sg, sd, batch, _gan_batch(), RNG)
        assert np.isfinite(float(losses["G_loss"]))
        assert "D_loss" not in losses
        # D untouched during warmup
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(d_before),
                jax.tree_util.tree_leaves_with_path(sd2.params)):
            np.testing.assert_array_equal(a, np.asarray(b))

    def test_full_step_updates_both(self):
        gen, disc = self._models()
        batch = _gan_batch()
        sg, sd = create_gan_states(gen, disc, batch, RNG,
                                   make_optimizer(lr=1e-3),
                                   make_optimizer(lr=1e-3))
        g_before = jax.tree_util.tree_map(np.asarray, sg.params)
        d_before = jax.tree_util.tree_map(np.asarray, sd.params)
        step = make_gan_train_step(
            gen, disc, hop_len=64, conv_pad=0, train_disc=True,
            gen_loss_kwargs={"use_feat_match_loss": True}, jit=True)
        sg2, sd2, losses = step(sg, sd, batch, _gan_batch(), RNG)
        for key in ("G_loss", "G_stft_loss_sc", "G_mse_fake_loss",
                    "G_feat_match_loss", "D_loss", "D_mse_gan_loss"):
            assert key in losses and np.isfinite(float(losses[key])), key
        changed_g = sum(
            not np.array_equal(a, np.asarray(dict(
                jax.tree_util.tree_leaves_with_path(sg2.params))[p]))
            for p, a in jax.tree_util.tree_leaves_with_path(g_before))
        changed_d = sum(
            not np.array_equal(a, np.asarray(dict(
                jax.tree_util.tree_leaves_with_path(sd2.params))[p]))
            for p, a in jax.tree_util.tree_leaves_with_path(d_before))
        assert changed_g > 0 and changed_d > 0

    def test_multiband_pqmf_step(self):
        gen = MultibandMelganGenerator(base_channels=32, num_res_blocks=1,
                                       upsample_factors=(2, 4, 2))  # prod=16
        disc = MelganMultiscaleDiscriminator(num_scales=2)
        batch = {
            "audio": jax.random.normal(RNG, (2, 8 * 64, 1)) * 0.1,
            "mel": jax.random.normal(RNG, (2, 8, 80)),
        }
        sg, sd = create_gan_states(gen, disc, batch, RNG,
                                   make_optimizer(lr=1e-3),
                                   make_optimizer(lr=1e-3))
        step = make_gan_train_step(gen, disc, hop_len=64, conv_pad=0,
                                   use_pqmf=True, train_disc=True, jit=True)
        _, _, losses = step(sg, sd, batch, batch, RNG)
        assert "G_subband_stft_loss_sc" in losses
        assert np.isfinite(float(losses["G_loss"]))

    def test_stft_loss_drives_learning(self):
        gen, disc = self._models()
        batch = _gan_batch()
        sg, sd = create_gan_states(gen, disc, batch, RNG,
                                   make_optimizer(lr=1e-3),
                                   make_optimizer(lr=1e-3))
        step = make_gan_train_step(gen, disc, hop_len=64, conv_pad=0,
                                   train_disc=False, jit=True)
        first = None
        for i in range(8):
            sg, sd, losses = step(sg, sd, batch, batch,
                                  jax.random.fold_in(RNG, i))
            if first is None:
                first = float(losses["G_loss"])
        assert float(losses["G_loss"]) < first


class TestGANMixedPrecision:
    def test_mixed_precision_step_matches_f32_closely(self):
        """bf16 GAN step: params stay f32 masters, losses finite and close
        to the f32 step's, both nets update (the AMP equivalent the
        reference gets from apex for TTS but never had for vocoders)."""
        gen = MelganGenerator(base_channels=32, num_res_blocks=1,
                              upsample_factors=(4, 4, 2, 2))
        disc = MelganMultiscaleDiscriminator(num_scales=2)
        batch = _gan_batch()
        sg, sd = create_gan_states(gen, disc, batch, RNG,
                                   make_optimizer(lr=1e-3),
                                   make_optimizer(lr=1e-3))
        sg_mp = jax.tree_util.tree_map(jnp.array, sg)
        sd_mp = jax.tree_util.tree_map(jnp.array, sd)

        step32 = make_gan_train_step(gen, disc, hop_len=64, conv_pad=0,
                                     train_disc=True, jit=True)
        step16 = make_gan_train_step(gen, disc, hop_len=64, conv_pad=0,
                                     train_disc=True, jit=True,
                                     mixed_precision=True)
        sg32, sd32, l32 = step32(sg, sd, batch, _gan_batch(), RNG)
        sg16, sd16, l16 = step16(sg_mp, sd_mp, batch, _gan_batch(), RNG)

        for k in ("G_loss", "D_loss"):
            assert np.isfinite(float(l16[k]))
            # bf16 has ~3 decimal digits; the loss scale here is O(1-20)
            np.testing.assert_allclose(float(l16[k]), float(l32[k]),
                                       rtol=0.1)
        # masters stay f32
        for leaf in jax.tree_util.tree_leaves(sg16.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(sd16.params):
            assert leaf.dtype == jnp.float32

    def test_mixed_precision_multiband_pqmf_step(self):
        """bf16 + PQMF: the filter-bank convs upcast bf16 subbands/audio to
        f32 internally (pqmf.py) — this step used to TypeError on
        lax.conv dtype mismatch."""
        gen = MultibandMelganGenerator(base_channels=32, num_res_blocks=1,
                                       upsample_factors=(2, 4, 2))
        disc = MelganMultiscaleDiscriminator(num_scales=2)
        batch = {
            "audio": jax.random.normal(RNG, (2, 8 * 64, 1)) * 0.1,
            "mel": jax.random.normal(RNG, (2, 8, 80)),
        }
        sg, sd = create_gan_states(gen, disc, batch, RNG,
                                   make_optimizer(lr=1e-3),
                                   make_optimizer(lr=1e-3))
        step = make_gan_train_step(gen, disc, hop_len=64, conv_pad=0,
                                   use_pqmf=True, train_disc=True, jit=True,
                                   mixed_precision=True)
        _, _, losses = step(sg, sd, batch, batch, RNG)
        assert np.isfinite(float(losses["G_loss"]))
        assert np.isfinite(float(losses["D_loss"]))
