"""Numerical parity vs the reference PyTorch Tacotron2.

Ports random-init reference weights through tts_tpu.compat.torch_port and
compares teacher-forced eval outputs element-wise — the BASELINE.json
mel-parity metric (atol 1e-3) verified end to end at the model level.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_model():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from TTS.tts.models.tacotron2 import Tacotron2 as RefTacotron2
    except ImportError:
        pytest.skip("reference checkout not importable")
    torch.manual_seed(0)
    model = RefTacotron2(num_chars=50, num_speakers=1, r=2,
                         prenet_dropout=False)
    model.eval()
    return model


def _inputs(B=2, T_text=8, T_mel=12):
    rng = np.random.default_rng(0)
    text = rng.integers(1, 50, (B, T_text)).astype(np.int64)
    text_lengths = np.array([T_text, T_text - 2], np.int64)  # sorted desc
    for b, L in enumerate(text_lengths):
        text[b, L:] = 0
    mel = rng.standard_normal((B, T_mel, 80)).astype(np.float32)
    mel_lengths = np.array([T_mel, T_mel], np.int64)
    return text, text_lengths, mel, mel_lengths


def test_teacher_forced_parity(ref_model):
    from tts_tpu.compat.torch_port import port_tacotron2
    from tts_tpu.models.tacotron2 import Tacotron2

    text, text_lengths, mel, mel_lengths = _inputs()

    with torch.no_grad():
        ref_dec, ref_post, ref_align, ref_stop = ref_model(
            torch.from_numpy(text), torch.from_numpy(text_lengths),
            torch.from_numpy(mel), torch.from_numpy(mel_lengths))

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params, batch_stats = port_tacotron2(sd)

    import jax
    import jax.numpy as jnp

    model = Tacotron2(num_chars=50, r=2, prenet_dropout=False)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(text, jnp.int32), jnp.asarray(text_lengths, jnp.int32),
        jnp.asarray(mel), jnp.asarray(mel_lengths, jnp.int32),
        train=False, rngs={"dropout": jax.random.PRNGKey(0)})

    got_dec = np.asarray(out["decoder_outputs"])
    got_post = np.asarray(out["postnet_outputs"])
    got_align = np.asarray(out["alignments"])
    got_stop = np.asarray(out["stop_logits"])

    ref_dec = ref_dec.numpy()
    ref_post = ref_post.numpy()
    ref_align = ref_align.numpy()
    ref_stop = ref_stop.numpy().squeeze(-1) if ref_stop.ndim == 3 \
        else ref_stop.numpy()

    assert got_dec.shape == ref_dec.shape
    np.testing.assert_allclose(got_dec, ref_dec, atol=1e-3)
    np.testing.assert_allclose(got_post, ref_post, atol=1e-3)
    np.testing.assert_allclose(got_align, ref_align, atol=1e-3)
    np.testing.assert_allclose(got_stop, ref_stop, atol=1e-2)
