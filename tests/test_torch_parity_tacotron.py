"""Numerical parity vs the reference PyTorch Tacotron (v1, CBHG).

Teacher-forced eval forward through ported weights: CBHG encoder (no max
pool — a reference quirk), sigmoid-normalized location attention with the
'v' bias, GRU decoder with single-frame memory (memory_size=0), PostCBHG +
linear head."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def test_teacher_forced_parity():
    from TTS.tts.models.tacotron import Tacotron as RefTacotron
    import jax
    import jax.numpy as jnp
    from tts_tpu.compat.torch_port import port_tacotron
    from tts_tpu.models.tacotron import Tacotron

    torch.manual_seed(0)
    r = 5
    ref = RefTacotron(num_chars=50, num_speakers=1, r=r, memory_size=0)
    ref.eval()

    rng = np.random.default_rng(0)
    B, T_text, T_mel = 2, 9, 20
    text = rng.integers(1, 50, (B, T_text)).astype(np.int64)
    text_lengths = np.array([T_text, T_text - 2], np.int64)
    for b, L in enumerate(text_lengths):
        text[b, L:] = 0
    mel = rng.standard_normal((B, T_mel, 80)).astype(np.float32)
    mel_lengths = np.array([T_mel, T_mel], np.int64)

    with torch.no_grad():
        ref_dec, ref_lin, ref_align, ref_stop = ref(
            torch.from_numpy(text), torch.from_numpy(text_lengths),
            torch.from_numpy(mel), torch.from_numpy(mel_lengths))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = port_tacotron(sd)

    model = Tacotron(num_chars=50, r=r, memory_size=0, prenet_dropout=True)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(text, jnp.int32), jnp.asarray(text_lengths, jnp.int32),
        jnp.asarray(mel), jnp.asarray(mel_lengths, jnp.int32),
        train=False, rngs={"dropout": jax.random.PRNGKey(0)})

    # reference returns decoder outputs as (B, C?, T) mel and linear
    ref_dec = ref_dec.numpy()
    ref_lin = ref_lin.numpy()
    got_dec = np.asarray(out["decoder_outputs"])
    got_lin = np.asarray(out["postnet_outputs"])
    if ref_dec.shape != got_dec.shape:
        ref_dec = ref_dec.transpose(0, 2, 1)
    np.testing.assert_allclose(got_dec, ref_dec, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["alignments"]),
                               ref_align.numpy(), atol=1e-3)
    np.testing.assert_allclose(got_lin, ref_lin, atol=1e-3)
    got_stop = np.asarray(out["stop_logits"])
    ref_stop = ref_stop.numpy()
    if ref_stop.ndim == 3:
        ref_stop = ref_stop.squeeze(-1)
    # reference stopnet outputs sigmoid-activated? compare via logits shape
    np.testing.assert_allclose(got_stop, ref_stop, atol=1e-3)
