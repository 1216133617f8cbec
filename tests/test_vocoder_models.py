"""Vocoder model shape/PQMF tests (≙ reference tests/test_vocoder_melgan_*,
test_vocoder_pqmf.py, test_vocoder_pwgan_*, test_vocoder_rwd.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.vocoder.melgan import (
    MelganDiscriminator, MelganGenerator, MelganMultiscaleDiscriminator,
    ResidualStack,
)
from tts_tpu.models.vocoder.multiband_melgan import (
    FullbandMelganGenerator, MultibandMelganGenerator,
)
from tts_tpu.models.vocoder.pqmf import PQMF
from tts_tpu.models.vocoder.pwgan import (
    ParallelWaveganDiscriminator, ParallelWaveganGenerator,
    ResidualParallelWaveganDiscriminator,
)
from tts_tpu.models.vocoder.rwd import RandomWindowDiscriminator
from tts_tpu.models.vocoder.registry import setup_discriminator, setup_generator


RNG = jax.random.PRNGKey(0)


class TestMelganGenerator:
    def test_output_shape(self):
        gen = MelganGenerator(base_channels=64, num_res_blocks=2)
        mel = jax.random.normal(RNG, (2, 16, 80))
        params = gen.init(RNG, mel)
        y = gen.apply(params, mel)
        assert y.shape == (2, 16 * 256, 1)  # prod(8,8,2,2) = 256
        assert np.abs(np.asarray(y)).max() <= 1.0  # tanh output

    def test_inference_padding(self):
        gen = MelganGenerator(base_channels=32, num_res_blocks=1,
                              inference_padding=2)
        mel = jax.random.normal(RNG, (1, 10, 80))
        params = gen.init(RNG, mel)
        y = gen.apply(params, mel, method=gen.inference)
        assert y.shape[1] == (10 + 4) * 256

    def test_residual_stack_shape(self):
        block = ResidualStack(channels=32, num_res_blocks=2)
        x = jax.random.normal(RNG, (2, 50, 32))
        params = block.init(RNG, x)
        y = block.apply(params, x)
        assert y.shape == x.shape


class TestPQMF:
    def test_reconstruction(self):
        """Analysis -> synthesis round trip error must be small
        (≙ test_vocoder_pqmf.py)."""
        pqmf = PQMF(N=4)
        t = np.arange(4096) / 22050
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32)
        xj = jnp.asarray(x)[None, :, None]
        sub = pqmf.analysis(xj)
        assert sub.shape == (1, 1024, 4)
        rec = np.asarray(pqmf.synthesis(sub))[0, :, 0]
        # compensate group delay: find best alignment
        n = min(len(rec), len(x))
        best = min(
            np.mean((rec[s: n - 64 + s] - x[: n - 64]) ** 2)
            for s in range(64))
        assert best < 1e-3

    def test_polyphase_exact(self):
        """The frame-rate polyphase path must equal the reference-style
        full-rate zero-stuffed path exactly."""
        pqmf = PQMF(N=4)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 512, 1)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(pqmf.analysis(x)),
                                   np.asarray(pqmf.analysis_direct(x)),
                                   atol=1e-5)
        sub = jnp.asarray(rng.standard_normal((2, 128, 4)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(pqmf.synthesis(sub)),
                                   np.asarray(pqmf.synthesis_direct(sub)),
                                   atol=1e-5)

    def test_subband_energy(self):
        pqmf = PQMF(N=4)
        t = np.arange(8192) / 22050
        lowband = np.sin(2 * np.pi * 500 * t).astype(np.float32)  # < fs/8
        sub = np.asarray(pqmf.analysis(jnp.asarray(lowband)[None, :, None]))
        energies = (sub[0] ** 2).sum(axis=0)
        assert energies[0] > 10 * energies[2]  # low band dominates


class TestMultibandMelgan:
    def test_subband_output(self):
        gen = MultibandMelganGenerator(base_channels=32, num_res_blocks=1)
        mel = jax.random.normal(RNG, (1, 12, 80))
        params = gen.init(RNG, mel)
        y = gen.apply(params, mel)
        assert y.shape == (1, 12 * 64, 4)  # prod(2,8,2,2)=64, 4 bands

    def test_inference_fullband(self):
        gen = MultibandMelganGenerator(base_channels=32, num_res_blocks=1)
        mel = jax.random.normal(RNG, (1, 12, 80))
        params = gen.init(RNG, mel)
        y = gen.apply(params, mel, method=gen.inference)
        assert y.shape == (1, (12 + 4) * 64 * 4, 1)

    def test_fullband_variant(self):
        gen = FullbandMelganGenerator(base_channels=32, num_res_blocks=1)
        mel = jax.random.normal(RNG, (1, 8, 80))
        params = gen.init(RNG, mel)
        assert gen.apply(params, mel).shape == (1, 8 * 64, 1)


class TestDiscriminators:
    def test_melgan_disc(self):
        d = MelganDiscriminator()
        x = jax.random.normal(RNG, (2, 4096, 1))
        params = d.init(RNG, x)
        score, feats = d.apply(params, x)
        assert score.shape[0] == 2 and score.shape[-1] == 1
        assert len(feats) == 6

    def test_multiscale_disc(self):
        d = MelganMultiscaleDiscriminator()
        x = jax.random.normal(RNG, (1, 4096, 1))
        params = d.init(RNG, x)
        scores, feats = d.apply(params, x)
        assert len(scores) == 3 and len(feats) == 3

    def test_pwgan_disc(self):
        d = ParallelWaveganDiscriminator(num_layers=4)
        x = jax.random.normal(RNG, (2, 2048, 1))
        params = d.init(RNG, x)
        assert d.apply(params, x).shape == (2, 2048, 1)

    def test_residual_pwgan_disc(self):
        d = ResidualParallelWaveganDiscriminator(num_layers=6, stacks=2)
        x = jax.random.normal(RNG, (1, 1024, 1))
        params = d.init(RNG, x)
        assert d.apply(params, x).shape == (1, 1024, 1)

    def test_rwd(self):
        d = RandomWindowDiscriminator(window_sizes=(512, 1024),
                                      hop_length=256)
        x = jax.random.normal(RNG, (2, 4096, 1))
        c = jax.random.normal(RNG, (2, 16, 80))
        params = d.init({"params": RNG, "rwd": RNG}, x, c)
        scores, _ = d.apply(params, x, c, rngs={"rwd": RNG})
        assert len(scores) == 4  # (uncond + cond) per window size
        for s in scores:
            assert s.shape == (2, 1)


class TestPWGANGenerator:
    def test_output_shape(self):
        gen = ParallelWaveganGenerator(num_res_blocks=6, stacks=2,
                                       upsample_factors=(4, 4, 4, 4))
        T_frames, hop = 8, 256
        c = jax.random.normal(RNG, (1, T_frames + 4, 80))  # +2*context
        z = jax.random.normal(RNG, (1, T_frames * hop, 1))
        params = gen.init(RNG, z, c)
        y = gen.apply(params, z, c)
        assert y.shape == (1, T_frames * hop, 1)

    def test_receptive_field(self):
        assert ParallelWaveganGenerator.receptive_field_size() == 6139


class TestRegistry:
    def _cfg(self, g, d):
        return {"generator_model": g, "discriminator_model": d,
                "audio": {"num_mels": 80, "hop_length": 256}}

    def test_setup_all_generators(self):
        for g in ("melgan_generator", "multiband_melgan_generator",
                  "fullband_melgan_generator", "parallel_wavegan_generator"):
            assert setup_generator(self._cfg(g, "x")) is not None

    def test_setup_all_discriminators(self):
        for d in ("melgan_multiscale_discriminator", "melgan_discriminator",
                  "parallel_wavegan_discriminator",
                  "residual_parallel_wavegan_discriminator",
                  "random_window_discriminator"):
            assert setup_discriminator(self._cfg("x", d)) is not None

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            setup_generator(self._cfg("wavenet", "x"))


class TestWeightNormFolding:
    def test_fold_parity_melgan(self):
        """Folded (bare-conv) generator == weight-normed generator
        (≙ remove_weight_norm parity)."""
        from tts_tpu.models.vocoder.fold import fold_weight_norm

        gen = MelganGenerator(base_channels=32, num_res_blocks=2,
                              upsample_factors=(4, 4))
        mel = jax.random.normal(RNG, (1, 8, 80))
        v = gen.init(RNG, mel)
        y_wn = gen.apply(v, mel)
        folded = fold_weight_norm(v["params"])
        y_folded = gen.clone(use_weight_norm=False).apply(
            {"params": folded}, mel)
        np.testing.assert_allclose(np.asarray(y_wn), np.asarray(y_folded),
                                   atol=1e-5)

    def test_fold_parity_multiband(self):
        from tts_tpu.models.vocoder.fold import fold_weight_norm

        gen = MultibandMelganGenerator(base_channels=32, num_res_blocks=1,
                                       upsample_factors=(2, 4, 2))
        mel = jax.random.normal(RNG, (1, 8, 80))
        v = gen.init(RNG, mel)
        y_wn = gen.apply(v, mel, method=gen.inference)
        folded = fold_weight_norm(v["params"])
        y_folded = gen.clone(use_weight_norm=False).apply(
            {"params": folded}, mel, method=gen.inference)
        np.testing.assert_allclose(np.asarray(y_wn), np.asarray(y_folded),
                                   atol=1e-5)


class TestDiscriminatorLowering:
    @pytest.mark.parametrize("lowering", ["tap_shift", "hybrid"])
    def test_lowering_matches_conv(self, lowering):
        """GroupedStridedConv (TPU lowerings) is math-identical to the XLA
        grouped conv and shares its param tree (melgan.py)."""
        from tts_tpu.models.vocoder.melgan import MelganDiscriminator

        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 1024, 1))
        d_conv = MelganDiscriminator(conv_lowering="conv")
        d_tap = MelganDiscriminator(conv_lowering=lowering)
        v = d_conv.init(rng, x)
        s1, f1 = d_conv.apply(v, x)
        s2, f2 = d_tap.apply(v, x)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
        for a, b in zip(f1, f2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    @pytest.mark.parametrize("lowering", ["tap_shift", "hybrid"])
    def test_lowering_grads_match(self, lowering):
        from tts_tpu.models.vocoder.melgan import MelganDiscriminator

        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (2, 512, 1))
        d_conv = MelganDiscriminator(conv_lowering="conv")
        d_tap = MelganDiscriminator(conv_lowering=lowering)
        v = d_conv.init(rng, x)

        def loss(params, model):
            s, _ = model.apply({"params": params}, x)
            return jnp.sum(s ** 2)

        g1 = jax.grad(loss)(v["params"], d_conv)
        g2 = jax.grad(loss)(v["params"], d_tap)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
        for path, a in flat1:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(flat2[path]), atol=1e-4,
                err_msg=str(path))
