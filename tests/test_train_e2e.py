"""Full-loop on-disk training e2e (VERDICT r2 item 5): render a synthetic
LJSpeech-format corpus to wav files, drive the `bin/train_tts.py` CLI main()
from disk at realistic utterance lengths (dataset discovery -> collate ->
train -> checkpoint), then score the produced checkpoint with
`bin/eval_model.evaluate()` — closing the eval-CLI coverage gap (VERDICT
weak item 6). ≙ the reference's smoke-train tier
/root/reference/tests/test_tts_train.sh:5-13 (1-epoch CPU run on the bundled
LJSpeech sample + continue re-run) plus its eval pass."""

import glob
import json
import os

import numpy as np
import pytest

from tests.fixtures import SR, make_ljspeech_fixture


@pytest.fixture(scope="module")
def lj_root(tmp_path_factory):
    # ~0.8-1.5 s utterances: realistic frame counts (70-130 mel frames)
    return make_ljspeech_fixture(str(tmp_path_factory.mktemp("lj_e2e")),
                                 n_items=8, base_dur=0.8, dur_step=0.1)


@pytest.fixture(scope="module")
def config_file(lj_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cfg"))
    c = {
        "model": "tacotron2",
        "run_name": "e2e",
        "audio": {
            "sample_rate": SR, "num_mels": 80, "fft_size": 1024,
            "hop_length": 256, "win_length": 1024, "preemphasis": 0.0,
            "min_level_db": -100, "ref_level_db": 20, "power": 1.5,
            "griffin_lim_iters": 10, "signal_norm": True,
            "symmetric_norm": True, "max_norm": 4.0, "clip_norm": True,
            "mel_fmin": 0.0, "mel_fmax": 8000.0, "do_trim_silence": False,
        },
        "batch_size": 2, "eval_batch_size": 2, "r": 2,
        "loss_masking": True, "run_eval": True, "test_delay_epochs": 100,
        "print_step": 1, "save_step": 4, "checkpoint": True,
        "grad_clip": 1.0, "epochs": 1, "lr": 1e-3, "seq_len_norm": False,
        "use_phonemes": False, "text_cleaner": "english_cleaners",
        "num_speakers": 1, "max_decoder_steps": 40,
        "datasets": [{"name": "ljspeech", "path": lj_root,
                      "meta_file_train": "metadata.csv"}],
        "output_path": out,
    }
    path = os.path.join(out, "config.json")
    with open(path, "w") as f:
        json.dump(c, f)
    return path


@pytest.fixture(scope="module")
def run_dir(config_file, tmp_path_factory):
    """One CLI training run shared by the tests below."""
    from tts_tpu.bin.train_tts import main

    out_root = str(tmp_path_factory.mktemp("e2e_runs"))
    main(["--config_path", config_file, "--output_path", out_root])
    subdirs = [d for d in glob.glob(os.path.join(out_root, "*"))
               if os.path.isdir(d)]
    assert len(subdirs) == 1, subdirs
    return subdirs[0]


def _latest_ckpt(run_dir):
    from tts_tpu.train.checkpoint import latest_checkpoint
    return latest_checkpoint(run_dir)


class TestTrainCLI:
    def test_run_produces_checkpoint(self, run_dir):
        ckpt = _latest_ckpt(run_dir)
        assert ckpt and os.path.isfile(ckpt)
        assert os.path.isfile(os.path.join(run_dir, "best_model.ckpt"))

    def test_continue_path_resumes(self, config_file, run_dir):
        """≙ test_tts_train.sh:10-13 continue re-run, through the CLI."""
        from tts_tpu.bin.train_tts import main
        from tts_tpu.train.checkpoint import load_checkpoint

        step_before = load_checkpoint(_latest_ckpt(run_dir))["meta"]["step"]
        main(["--config_path", config_file, "--continue_path", run_dir])
        step_after = load_checkpoint(_latest_ckpt(run_dir))["meta"]["step"]
        assert step_after > step_before


class TestEvalCLI:
    def test_evaluate_metrics(self, config_file, run_dir, lj_root):
        from tts_tpu.bin.eval_model import evaluate

        # evaluate() prefers the eval split, which is 1 item for this tiny
        # fixture — the point is that every metric comes back finite
        res = evaluate(config_file, _latest_ckpt(run_dir),
                       num_items=4, data_path=lj_root)
        assert res["n_items"] >= 1
        for key in ("mel_l1", "mel_max_abs_err", "mcd_db"):
            assert np.isfinite(res[key]), (key, res)
        assert res["mcd_db"] > 0
        assert 0.0 <= res["alignment_diagonal_score"] <= 1.0

    def test_self_parity_is_zero(self, config_file, run_dir, lj_root):
        """ref_checkpoint == checkpoint must report exact output parity —
        guards the BASELINE.json mel max-abs-err instrument itself."""
        from tts_tpu.bin.eval_model import evaluate

        ckpt = _latest_ckpt(run_dir)
        res = evaluate(config_file, ckpt, ref_checkpoint=ckpt,
                       num_items=2, data_path=lj_root)
        assert res["vs_ref_max_abs_diff"] == 0.0
        assert res["vs_ref_allclose_1e3"] is True
