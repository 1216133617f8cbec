"""iSTFT-head MelGAN generator (models/vocoder/istft_melgan.py).

Capability addition (no reference counterpart); the iSTFT head's numerics
are pinned to the in-tree scatter-add reference `audio.dsp.istft`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.audio import dsp
from tts_tpu.models.vocoder.istft_melgan import (ISTFTMelganGenerator,
                                                 istft_head)


class TestISTFTHead:
    @pytest.mark.parametrize("n_fft,hop", [(16, 4), (32, 8)])
    def test_matches_dsp_istft(self, n_fft, hop):
        """Basis-matmul + ConvTranspose OLA == complex scatter-add istft."""
        rng = np.random.default_rng(0)
        bins = n_fft // 2 + 1
        n_frames = 23
        re = rng.standard_normal((3, n_frames, bins)).astype(np.float32)
        im = rng.standard_normal((3, n_frames, bins)).astype(np.float32)
        # DC and Nyquist bins of a real signal's rfft are real
        im[..., 0] = 0.0
        if n_fft % 2 == 0:
            im[..., -1] = 0.0
        got = istft_head(jnp.concatenate([jnp.asarray(re), jnp.asarray(im)],
                                         axis=-1), n_fft, hop)
        want = dsp.istft(jnp.asarray(re + 1j * im), n_fft, hop,
                         win_length=n_fft, center=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_roundtrip_interior(self):
        """stft -> istft_head reconstructs the interior of a signal."""
        n_fft, hop = 16, 4
        t = np.linspace(0, 1, 512, endpoint=False)
        y = (0.5 * np.sin(2 * np.pi * 13 * t)
             + 0.3 * np.sin(2 * np.pi * 41 * t)).astype(np.float32)
        spec = dsp.stft(jnp.asarray(y[None]), n_fft, hop, n_fft, center=False)
        got = istft_head(
            jnp.concatenate([spec.real, spec.imag], axis=-1), n_fft, hop)
        n = got.shape[-1]
        np.testing.assert_allclose(np.asarray(got)[0, n_fft:n - n_fft],
                                   y[n_fft:n - n_fft], atol=1e-4)


class TestGenerator:
    def test_output_shape_and_range(self):
        gen = ISTFTMelganGenerator(base_channels=32, upsample_factors=(4, 4),
                                   num_res_blocks=1, n_fft_head=16, hop_head=4)
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 80))
        v = gen.init(jax.random.PRNGKey(1), mel)
        wav = gen.apply(v, mel)
        assert wav.shape == (2, 12 * 4 * 4 * 4, 1)  # T * prod(up) * hop_head
        assert np.all(np.isfinite(np.asarray(wav)))
        assert np.abs(np.asarray(wav)).max() <= 1.0

    def test_registry(self):
        from tts_tpu.models.vocoder.registry import setup_generator
        gen = setup_generator({
            "generator_model": "iSTFT_melgan_generator",
            "generator_model_params": {"base_channels": 64,
                                       "upsample_factors": (8, 8)},
            "audio": {"num_mels": 80},
        })
        assert isinstance(gen, ISTFTMelganGenerator)
        assert gen.base_channels == 64

    def test_gan_train_step_loss_falls(self):
        """The existing GAN trainer takes the family unchanged (fullband
        waveform out, same discriminator/losses)."""
        from tts_tpu.models.vocoder.melgan import MelganMultiscaleDiscriminator
        from tts_tpu.train.gan import create_gan_states, make_gan_train_step
        from tts_tpu.train.optim import make_optimizer

        rng = jax.random.PRNGKey(0)
        gen = ISTFTMelganGenerator(base_channels=32, upsample_factors=(4, 4),
                                   num_res_blocks=1, n_fft_head=16,
                                   hop_head=4)
        disc = MelganMultiscaleDiscriminator(num_scales=2)
        hop = 4 * 4 * 4
        mel = jax.random.normal(rng, (2, 16, 80)) * 0.3
        batch = {"mel": mel,
                 "audio": jax.random.normal(rng, (2, 16 * hop, 1)) * 0.1}
        sg, sd = create_gan_states(gen, disc, batch, rng,
                                   make_optimizer(lr=2e-4),
                                   make_optimizer(lr=2e-4))
        step = jax.jit(make_gan_train_step(gen, disc, hop_len=hop,
                                           conv_pad=0, train_disc=True))
        first = None
        for i in range(8):
            sg, sd, losses = step(sg, sd, batch, batch, jax.random.fold_in(rng, i))
            if first is None:
                first = float(losses["G_loss"])
        assert np.isfinite(float(losses["G_loss"]))
        assert float(losses["G_loss"]) < first
