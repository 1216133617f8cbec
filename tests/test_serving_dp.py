"""Data-parallel serving (infer/serving_dp.py) on the 8-virtual-device CPU
mesh: the SPMD pipeline must match the single-device pipeline element-wise,
including through the Pallas vocoder megakernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.infer.serving_dp import make_dp_serving
from tts_tpu.models.glow_tts import GlowTTS
from tts_tpu.models.vocoder.fold import fold_weight_norm
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.ops.pallas.fused_melgan import (megakernel_generator_apply,
                                             pack_generator_params)
from tts_tpu.parallel.mesh import make_mesh

B, T_TEXT, T_MEL = 8, 16, 24


@pytest.fixture(scope="module")
def glow_and_vocoder():
    rng = jax.random.PRNGKey(0)
    glow = GlowTTS(num_chars=32, hidden_channels_enc=32,
                   hidden_channels_dec=32, filter_channels=64,
                   filter_channels_dp=32, num_layers_enc=2,
                   num_flow_blocks_dec=2, num_block_layers=2,
                   rel_attn_window_size=2, mas_impl="jnp")
    text = jax.random.randint(rng, (B, T_TEXT), 1, 32)
    text_len = jnp.full((B,), T_TEXT, jnp.int32)
    gv = glow.init({"params": rng, "dropout": rng, "noise": rng},
                   text[:2], text_len[:2], jnp.zeros((2, T_MEL, 80)),
                   jnp.full((2,), T_MEL, jnp.int32), train=False)
    voc = MultibandMelganGenerator(base_channels=32, num_res_blocks=2,
                                   upsample_factors=(2, 2))
    vv = voc.init(rng, jnp.zeros((2, T_MEL, 80)))
    vp = fold_weight_norm(vv["params"])
    plain = voc.clone(use_weight_norm=False)
    packed = pack_generator_params(plain, vp, fuse_pqmf=True)
    return glow, gv, plain, packed, text, text_len


def _make_synthesize(glow, plain, interpret):
    def synthesize(params, text, text_len):
        gv, packed = params
        out = glow.apply(gv, text, text_len, noise_scale=0.0,
                         y_max_length=T_MEL,
                         rngs={"noise": jax.random.PRNGKey(1)},
                         method=GlowTTS.inference)
        mel = out["model_outputs"].astype(jnp.float32)
        return megakernel_generator_apply(plain, packed, mel,
                                          interpret=interpret)
    return synthesize


class TestDPServing:
    def test_matches_single_device(self, glow_and_vocoder):
        glow, gv, plain, packed, text, text_len = glow_and_vocoder
        fn = _make_synthesize(glow, plain, interpret=True)
        single = fn((gv, packed), text, text_len)

        mesh = make_mesh((("data", -1),))
        dp = make_dp_serving(fn, mesh)
        wav = dp((gv, packed), text, text_len)
        assert wav.shape == single.shape
        np.testing.assert_allclose(np.asarray(wav), np.asarray(single),
                                   atol=1e-5, rtol=1e-5)

    def test_output_is_sharded(self, glow_and_vocoder):
        glow, gv, plain, packed, text, text_len = glow_and_vocoder
        fn = _make_synthesize(glow, plain, interpret=True)
        mesh = make_mesh((("data", -1),))
        dp = make_dp_serving(fn, mesh)
        wav = dp((gv, packed), text, text_len)
        # leading (batch) axis sharded over the 8-device data axis
        assert len(wav.sharding.device_set) == len(jax.devices())

    def test_batch_must_divide(self, glow_and_vocoder):
        glow, gv, plain, packed, text, text_len = glow_and_vocoder
        fn = _make_synthesize(glow, plain, interpret=True)
        mesh = make_mesh((("data", -1),))
        dp = make_dp_serving(fn, mesh)
        with pytest.raises(ValueError):
            dp((gv, packed), text[:6], text_len[:6])
