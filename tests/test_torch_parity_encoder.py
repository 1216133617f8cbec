"""Numerical parity vs the reference PyTorch SpeakerEncoder."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def test_speaker_encoder_parity():
    from TTS.speaker_encoder.model import SpeakerEncoder as RefEncoder
    import jax.numpy as jnp
    from tts_tpu.compat.torch_port import port_speaker_encoder
    from tts_tpu.models.speaker_encoder import SpeakerEncoder

    torch.manual_seed(0)
    ref = RefEncoder(input_dim=40, proj_dim=64, lstm_dim=128,
                     num_lstm_layers=3)
    ref.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 25, 40)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_speaker_encoder(sd)
    ours = SpeakerEncoder(input_dim=40, proj_dim=64, lstm_dim=128,
                          num_lstm_layers=3)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)
