"""Numerical parity vs the reference PyTorch MelGAN generator (weight port)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def test_melgan_generator_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from TTS.vocoder.models.melgan_generator import (
            MelganGenerator as RefMelgan)
    except ImportError:
        pytest.skip("reference checkout not importable")

    torch.manual_seed(0)
    factors = (4, 4)
    ref = RefMelgan(in_channels=80, out_channels=1, proj_kernel=7,
                    base_channels=64, upsample_factors=factors,
                    res_kernel=3, num_res_blocks=2)
    ref.eval()

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 12)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(mel)).numpy()  # (B, 1, T*16)

    from tts_tpu.compat.torch_port import port_melgan
    from tts_tpu.models.vocoder.melgan import MelganGenerator

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_melgan(sd, upsample_factors=factors, num_res_blocks=2)

    import jax.numpy as jnp

    gen = MelganGenerator(base_channels=64, num_res_blocks=2,
                          upsample_factors=factors, use_weight_norm=False)
    y = gen.apply({"params": params}, jnp.asarray(mel.transpose(0, 2, 1)))
    y = np.asarray(y).transpose(0, 2, 1)  # -> (B, 1, T)

    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=1e-4)
