"""M1 exit test (SURVEY.md §7): overfit a single utterance — the training
dynamics sanity check. A Tacotron2 fit to one (text, mel) pair must drive
the teacher-forced decoder loss down by a large factor and produce a
near-monotonic alignment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures import SR, make_ljspeech_fixture
from tts_tpu.audio import AudioProcessor
from tts_tpu.models.tacotron2 import Tacotron2
from tts_tpu.text import text_to_sequence
from tts_tpu.train.optim import make_optimizer
from tts_tpu.train.state import create_train_state, make_train_step
from tts_tpu.utils.measures import alignment_diagonal_score


@pytest.mark.slow
def test_overfit_single_utterance(tmp_path):
    ap = AudioProcessor(sample_rate=SR, num_mels=80, fft_size=1024,
                        hop_length=256, win_length=1024, mel_fmax=8000.0)
    root = make_ljspeech_fixture(str(tmp_path), n_items=1)
    wav = ap.load_wav(f"{root}/wavs/LJ001-0000.wav")
    mel = ap.melspectrogram(wav)
    ids = np.asarray(text_to_sequence("hello world", ["english_cleaners"]),
                     np.int32)

    r = 2
    T_mel = mel.shape[0] // r * r
    batch = {
        "text": jnp.asarray(ids)[None],
        "text_lengths": jnp.asarray([len(ids)], jnp.int32),
        "mel": jnp.asarray(mel[:T_mel])[None],
        "mel_lengths": jnp.asarray([T_mel], jnp.int32),
        "stop_targets": jnp.zeros((1, T_mel // r)).at[:, -1].set(1.0),
    }
    model = Tacotron2(num_chars=200, r=r, encoder_dim=64, embedding_dim=64,
                      attn_dim=32)
    import optax

    rng = jax.random.PRNGKey(0)
    # adam: immediate sqrt(v)-normalized updates overfit faster than radam's
    # warmup in a 150-step budget
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(2e-3))
    state = create_train_state(model, rng, batch, tx)
    step = make_train_step(model, {"ga_alpha": 5.0}, jit=True)

    first = None
    for i in range(150):
        state, losses = step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = float(losses["decoder_loss"])
    final = float(losses["decoder_loss"])
    assert final < first * 0.35, (first, final)

    # teacher-forced alignment approaches the diagonal under guided attention
    out, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["text"], batch["text_lengths"], batch["mel"],
        batch["mel_lengths"], train=False, rngs={"dropout": rng},
        mutable=["batch_stats"])
    score = alignment_diagonal_score(np.asarray(out["alignments"]))
    assert score > 0.1, score
