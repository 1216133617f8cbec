"""Numerical parity vs the reference PyTorch ParallelWaveGAN generator.

Ports random-init reference weights (weight norm transferred verbatim) and
compares the noise+mel -> waveform forward element-wise, including the
conv_in context consumption and the reference's 0.25 residual scaling."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def test_pwgan_generator_parity():
    from TTS.vocoder.models.parallel_wavegan_generator import (
        ParallelWaveganGenerator as RefGen)
    import jax
    import jax.numpy as jnp
    from tts_tpu.compat.torch_port import port_pwgan
    from tts_tpu.models.vocoder.pwgan import ParallelWaveganGenerator

    torch.manual_seed(0)
    ref = RefGen(num_res_blocks=6, stacks=2, res_channels=16,
                 gate_channels=32, skip_channels=16, aux_channels=80,
                 upsample_factors=[4, 4], use_weight_norm=True)
    ref.eval()

    B, T_frames = 2, 12
    scale = 16
    rng = np.random.default_rng(0)
    c = rng.standard_normal((B, T_frames, 80)).astype(np.float32)
    z = rng.standard_normal((B, T_frames * scale, 1)).astype(np.float32)

    with torch.no_grad():
        # reference forward draws its own noise; call the pieces with ours
        c_t = torch.from_numpy(c.transpose(0, 2, 1))
        x = torch.from_numpy(z.transpose(0, 2, 1))
        cu = ref.upsample_net(c_t)
        assert cu.shape[-1] == x.shape[-1]
        h = ref.first_conv(x)
        skips = 0
        for f in ref.conv_layers:
            h, s = f(h, cu)
            skips += s
        import math
        skips *= math.sqrt(1.0 / len(ref.conv_layers))
        y = skips
        for f in ref.last_conv_layers:
            y = f(y)
        want = y.numpy().transpose(0, 2, 1)

    ours = ParallelWaveganGenerator(
        num_res_blocks=6, stacks=2, res_channels=16, gate_channels=32,
        skip_channels=16, aux_channels=80, upsample_factors=(4, 4),
        aux_context_window=0, use_weight_norm=True)
    jrng = jax.random.PRNGKey(0)
    template = ours.init(jrng, jnp.asarray(z), jnp.asarray(c))
    from flax.core import unfreeze
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_pwgan(sd, unfreeze(template["params"]), num_res_blocks=6,
                        upsample_factors=(4, 4))

    got = np.asarray(ours.apply({"params": params}, jnp.asarray(z),
                                jnp.asarray(c)))
    np.testing.assert_allclose(got, want, atol=1e-4)
