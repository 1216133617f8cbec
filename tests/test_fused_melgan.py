"""Whole-generator Pallas megakernel vs the reference flax modules.

The megakernel must be element-wise exact (same op order, polyphase
upsampling identical to lax.conv_transpose SAME, reflect-pad conv heads) —
any deviation means the fused serving path would not match training/export
numerics. Runs in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.vocoder.fold import fold_weight_norm
from tts_tpu.models.vocoder.melgan import MelganGenerator
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.ops.pallas.fused_melgan import (compose_phase_order,
                                             megakernel_generator_apply,
                                             megakernel_inference,
                                             pack_generator_params,
                                             pack_upsample_params,
                                             phase_order, to_true_time)


class TestPhaseOrder:
    def test_compose(self):
        assert compose_phase_order((0,), 2) == (0, 1)
        # after (2, 2): storage block q*P+p has true phase sigma[p]*2+q
        assert phase_order((2, 2)) == (0, 2, 1, 3)

    def test_permutation(self):
        sigma = phase_order((2, 8, 2, 2))
        assert sorted(sigma) == list(range(64))

    def test_to_true_time_roundtrip(self):
        # feed a phase-block tensor built FROM a known true-time signal and
        # check to_true_time recovers it
        factors = (2, 4)
        sigma = phase_order(factors)
        P, t0, C = len(sigma), 5, 3
        rng = np.random.RandomState(0)
        true = rng.randn(2, t0 * P, C).astype(np.float32)
        pb = np.zeros((2, C, P * t0), np.float32)
        for j, phase in enumerate(sigma):
            for u in range(t0):
                pb[:, :, j * t0 + u] = true[:, u * P + phase, :]
        got = to_true_time(jnp.asarray(pb), factors)
        np.testing.assert_array_equal(np.asarray(got), true)


class TestPolyphaseUpsample:
    @pytest.mark.parametrize("factor", [2, 4, 8])
    def test_matches_conv_transpose(self, factor):
        """Polyphase weights reproduce lax.conv_transpose(SAME, k=2f, s=f)."""
        rng = np.random.RandomState(factor)
        c_in, c_out, T = 6, 5, 13
        kernel = jnp.asarray(rng.randn(2 * factor, c_in, c_out), jnp.float32)
        x = jnp.asarray(rng.randn(1, T, c_in), jnp.float32)
        want = jax.lax.conv_transpose(x, kernel, strides=(factor,),
                                      padding="SAME",
                                      dimension_numbers=("NWC", "WIO", "NWC"))
        wa, wb = pack_upsample_params(kernel, factor)
        xt = x[0].T                              # (C_in, T)
        zeros = jnp.zeros((c_in, 1))
        ym = jnp.concatenate([zeros, xt[:, :-1]], axis=1)
        yp = jnp.concatenate([xt[:, 1:], zeros], axis=1)
        ra = wa @ jnp.concatenate([ym, xt], axis=0)
        rb = wb @ jnp.concatenate([xt, yp], axis=0)
        res = jnp.concatenate([ra, rb], axis=0).reshape(factor, c_out, T)
        got = jnp.transpose(res, (2, 0, 1)).reshape(T * factor, c_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want[0]),
                                   atol=1e-5, rtol=1e-5)


class TestMegakernelGenerator:
    @pytest.mark.parametrize("factors,base", [((2, 8, 2, 2), 96),
                                              ((2, 2), 32)])
    def test_multiband_matches_flax(self, factors, base):
        rng = jax.random.PRNGKey(len(factors))
        gen = MultibandMelganGenerator(upsample_factors=factors,
                                       base_channels=base)
        mel = jax.random.normal(rng, (2, 24, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel)
        packed = pack_generator_params(gen, folded)
        got = megakernel_generator_apply(gen, packed, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_fullband_single_channel(self):
        rng = jax.random.PRNGKey(9)
        gen = MelganGenerator(base_channels=64, upsample_factors=(8, 2),
                              use_weight_norm=True)
        mel = jax.random.normal(rng, (1, 20, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel)
        packed = pack_generator_params(gen, folded)
        got = megakernel_generator_apply(gen, packed, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_inference_with_pqmf(self):
        rng = jax.random.PRNGKey(1)
        gen = MultibandMelganGenerator(upsample_factors=(2, 2, 2, 2),
                                       base_channels=64)
        mel = jax.random.normal(rng, (1, 20, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel,
                           method=MelganGenerator.inference)
        want = plain.pqmf.synthesis(want)
        packed = pack_generator_params(gen, folded)
        got = megakernel_inference(gen, packed, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_inference_pqmf_in_kernel(self):
        """fuse_pqmf packs the PQMF synthesis matmul into the kernel tail;
        the wav must match generator.apply + pqmf.synthesis exactly."""
        rng = jax.random.PRNGKey(5)
        gen = MultibandMelganGenerator(upsample_factors=(2, 4),
                                       base_channels=32)
        mel = jax.random.normal(rng, (2, 20, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel,
                           method=MelganGenerator.inference)
        want = plain.pqmf.synthesis(want)
        packed = pack_generator_params(gen, folded, fuse_pqmf=True)
        got = megakernel_inference(gen, packed, mel, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_edges_match(self):
        """Boundary columns exercise every reflect/zero edge path through
        the phase-block gathers."""
        rng = jax.random.PRNGKey(3)
        gen = MultibandMelganGenerator(upsample_factors=(2, 4),
                                       base_channels=32)
        mel = jax.random.normal(rng, (1, 16, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel)
        packed = pack_generator_params(gen, folded)
        got = megakernel_generator_apply(gen, packed, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got)[:, :16],
                                   np.asarray(want)[:, :16], atol=3e-5)
        np.testing.assert_allclose(np.asarray(got)[:, -16:],
                                   np.asarray(want)[:, -16:], atol=3e-5)

    def test_accum_and_pretransposed_variants_exact(self):
        """accum_taps (per-tap accumulated matmuls) and pretransposed
        (mel transpose hoisted out of the kernel) match the base kernel.
        accum_taps applies to the unfolded packing only."""
        rng = jax.random.PRNGKey(4)
        gen = MultibandMelganGenerator(upsample_factors=(2, 4),
                                       base_channels=32)
        mel = jax.random.normal(rng, (2, 16, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        packed = pack_generator_params(gen, folded, fuse_pqmf=True,
                                       fold=False)
        base = megakernel_generator_apply(gen, packed, mel, interpret=True)
        for accum in (False, True):
            for pretrans in (False, True):
                got = megakernel_generator_apply(
                    gen, packed, mel, accum_taps=accum,
                    pretransposed=pretrans, interpret=True)
                np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                           atol=3e-6)


@pytest.mark.negative_record
class TestFoldedLayout:
    """Superphase-group fold: the folded packing must be element-wise exact
    vs both the unfolded kernel and the flax generator."""

    @pytest.mark.parametrize("factors,base", [((2, 4), 32),
                                              ((2, 8, 2, 2), 128),
                                              ((4, 2), 32)])
    def test_folded_matches_flax(self, factors, base):
        from tts_tpu.ops.pallas.fused_melgan import fold_start_stage
        rng = jax.random.PRNGKey(len(factors) + 10)
        gen = MultibandMelganGenerator(upsample_factors=factors,
                                       base_channels=base)
        assert fold_start_stage(gen) is not None
        mel = jax.random.normal(rng, (2, 17, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel)
        packed = pack_generator_params(gen, folded, fold=True)
        got = megakernel_generator_apply(gen, packed, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_folded_pqmf_in_kernel(self):
        rng = jax.random.PRNGKey(6)
        gen = MultibandMelganGenerator(upsample_factors=(2, 4),
                                       base_channels=32)
        mel = jax.random.normal(rng, (2, 20, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel,
                           method=MelganGenerator.inference)
        want = plain.pqmf.synthesis(want)
        packed = pack_generator_params(gen, folded, fuse_pqmf=True,
                                       fold=True)
        got = megakernel_inference(gen, packed, mel, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_folded_edges_match(self):
        """First/last samples exercise every reflect/zero edge fix through
        the folded window blocks."""
        rng = jax.random.PRNGKey(7)
        gen = MultibandMelganGenerator(upsample_factors=(2, 4),
                                       base_channels=32)
        mel = jax.random.normal(rng, (1, 16, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel)
        packed = pack_generator_params(gen, folded, fold=True)
        got = megakernel_generator_apply(gen, packed, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got)[:, :16],
                                   np.asarray(want)[:, :16], atol=3e-5)
        np.testing.assert_allclose(np.asarray(got)[:, -16:],
                                   np.asarray(want)[:, -16:], atol=3e-5)


@pytest.mark.negative_record
class TestStackedTaps:
    """Tap-stacked (output-shift) packing: one dot per conv on the unshifted
    input, shifts applied to output pieces — must match flax exactly."""

    @pytest.mark.parametrize("factors,base", [((2, 4), 32),
                                              ((2, 8, 2, 2), 96)])
    def test_stacked_matches_flax(self, factors, base):
        rng = jax.random.PRNGKey(len(factors) + 20)
        gen = MultibandMelganGenerator(upsample_factors=factors,
                                       base_channels=base)
        mel = jax.random.normal(rng, (2, 17, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel)
        packed = pack_generator_params(gen, folded, stacked=True)
        got = megakernel_generator_apply(gen, packed, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_stacked_pqmf_and_edges(self):
        rng = jax.random.PRNGKey(21)
        gen = MultibandMelganGenerator(upsample_factors=(2, 4),
                                       base_channels=32)
        mel = jax.random.normal(rng, (1, 16, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel,
                           method=MelganGenerator.inference)
        want = plain.pqmf.synthesis(want)
        packed = pack_generator_params(gen, folded, fuse_pqmf=True,
                                       stacked=True)
        got = megakernel_inference(gen, packed, mel, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got)[:, :64],
                                   np.asarray(want)[:, :64], atol=3e-5)
        np.testing.assert_allclose(np.asarray(got)[:, -64:],
                                   np.asarray(want)[:, -64:], atol=3e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)
