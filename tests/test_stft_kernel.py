"""Fused Pallas STFT-magnitude kernel vs the jnp.fft DSP path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.audio import dsp
from tts_tpu.ops.pallas.stft_kernel import stft_magnitude


@pytest.mark.parametrize("n_fft,hop,win", [(512, 128, 512), (1024, 120, 600)])
def test_matches_fft_stft(n_fft, hop, win):
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    want = jnp.abs(dsp.stft(y, n_fft, hop, win))
    got = stft_magnitude(y, n_fft, hop, win, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)


def test_gradients_flow():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32))

    def loss_pallas(y):
        return stft_magnitude(y, 512, 128, 512, interpret=True).sum()

    def loss_fft(y):
        return jnp.abs(dsp.stft(y, 512, 128, 512)).sum()

    g1 = jax.grad(loss_pallas)(y)
    g2 = jax.grad(loss_fft)(y)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-3, rtol=1e-2)
