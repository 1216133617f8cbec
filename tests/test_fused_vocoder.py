"""Fused (Pallas) vocoder serving path vs the reference flax modules.

The kernel must be element-wise exact (same op order, same reflect padding)
— any deviation means the fused serving path would not match training/export
numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.vocoder.melgan import MelganGenerator, ResidualStack
from tts_tpu.models.vocoder.fold import fold_weight_norm
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.models.vocoder.serving import (fused_generator_apply,
                                            fused_inference)
from tts_tpu.ops.pallas.fused_resstack import (fused_residual_stack,
                                               stack_params_from_tree)


class TestFusedResidualStack:
    @pytest.mark.parametrize("channels,t", [(24, 160), (48, 96), (192, 40)])
    def test_matches_flax_stack(self, channels, t):
        rng = jax.random.PRNGKey(channels)
        x = jax.random.normal(rng, (3, t, channels))
        stack = ResidualStack(channels, 3, use_weight_norm=False)
        variables = stack.init(rng, x)
        want = stack.apply(variables, x)
        packed = stack_params_from_tree(variables["params"], 3)
        got = fused_residual_stack(x, *packed, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_reflect_edges_match(self):
        # edge rows exercise the in-kernel reflection; compare them alone
        rng = jax.random.PRNGKey(7)
        x = jax.random.normal(rng, (1, 32, 24))
        stack = ResidualStack(24, 3, use_weight_norm=False)
        variables = stack.init(rng, x)
        want = stack.apply(variables, x)
        packed = stack_params_from_tree(variables["params"], 3)
        got = fused_residual_stack(x, *packed, interpret=True)
        np.testing.assert_allclose(np.asarray(got)[:, :10],
                                   np.asarray(want)[:, :10], atol=2e-5)
        np.testing.assert_allclose(np.asarray(got)[:, -10:],
                                   np.asarray(want)[:, -10:], atol=2e-5)


class TestFusedGenerator:
    def test_multiband_full_forward(self):
        rng = jax.random.PRNGKey(0)
        gen = MultibandMelganGenerator(upsample_factors=(2, 2, 2, 2),
                                       base_channels=64)
        mel = jax.random.normal(rng, (2, 24, 80))
        variables = gen.init(rng, mel)
        folded = fold_weight_norm(variables["params"])
        plain = gen.clone(use_weight_norm=False)
        want = plain.apply({"params": folded}, mel)
        got = fused_generator_apply(gen, folded, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_fused_inference_pqmf(self):
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
        got = fused_inference(gen, folded, mel, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)
