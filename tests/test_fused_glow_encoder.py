"""Fused Glow-encoder megakernel vs the flax GlowTTSEncoder (eval mode).

Must be element-wise exact up to matmul precision: same prenet/attention/
FFN/LN math, zero-outside-window relative attention, masked pads. Runs in
interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.glow.encoder import GlowTTSEncoder
from tts_tpu.ops.pallas.fused_glow_encoder import (
    fused_glow_encoder_apply, pack_glow_encoder_params)

# measured 2x SLOWER than XLA on-device (CLAUDE.md Glow-encoder roofline
# entry); kernel kept as the experimental record only
pytestmark = pytest.mark.negative_record


def _setup(B=4, T=24, uniform_len=True, **kwargs):
    enc = GlowTTSEncoder(num_chars=50, hidden_channels=32,
                         filter_channels=64, filter_channels_dp=48,
                         num_heads=2, num_layers=2, **kwargs)
    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (B, T), 1, 50)
    if uniform_len:
        tl = jnp.full((B,), T, jnp.int32)
    else:
        tl = jnp.asarray([T, T - 3, T - 7, T // 2][:B], jnp.int32)
    v = enc.init({"params": rng, "dropout": rng}, text, tl, train=False)
    return enc, v["params"], text, tl


@pytest.mark.parametrize("uniform_len", [True, False])
def test_matches_flax(uniform_len):
    enc, params, text, tl = _setup(uniform_len=uniform_len)
    want = enc.apply({"params": params}, text, tl, train=False)
    packed = pack_glow_encoder_params(enc, params)
    got = fused_glow_encoder_apply(enc, params, packed, text, tl,
                                   ipb=2, att_group=2, interpret=True)
    for name, w, g in zip(("mean", "log_scale", "dur", "mask"),
                          want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=1e-4, err_msg=name)


def test_att_group_variants_match():
    enc, params, text, tl = _setup(B=4, uniform_len=False)
    packed = pack_glow_encoder_params(enc, params)
    base = fused_glow_encoder_apply(enc, params, packed, text, tl,
                                    ipb=1, att_group=1, interpret=True)
    for ipb, g in ((2, 1), (4, 2), (4, 4)):
        got = fused_glow_encoder_apply(enc, params, packed, text, tl,
                                       ipb=ipb, att_group=g, interpret=True)
        for b, a in zip(base, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


def test_no_prenet_and_mean_only():
    enc, params, text, tl = _setup(use_prenet=False, mean_only=True)
    want = enc.apply({"params": params}, text, tl, train=False)
    packed = pack_glow_encoder_params(enc, params)
    got = fused_glow_encoder_apply(enc, params, packed, text, tl,
                                   ipb=2, interpret=True)
    for name, w, g in zip(("mean", "log_scale", "dur", "mask"), want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=1e-4, err_msg=name)
