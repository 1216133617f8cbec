"""Config loader / validator tests (reference L0 parity, SURVEY.md §1)."""

import pytest

from tts_tpu.config import (
    AttrDict, check_argument, check_config_tts, load_config, loads_config,
    strip_json_comments,
)


def test_comment_stripping():
    text = '{"a": 1, // comment\n "b": "http://x//y", "c": 2}'
    cfg = loads_config(text)
    assert cfg.a == 1 and cfg.b == "http://x//y" and cfg.c == 2


def test_attrdict_nested():
    cfg = AttrDict({"audio": {"sample_rate": 22050}, "lst": [{"name": "x"}]})
    assert cfg.audio.sample_rate == 22050
    assert cfg.lst[0].name == "x"
    cfg.audio.num_mels = 80
    assert cfg["audio"]["num_mels"] == 80


def test_load_config_file(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{\n// a training config\n"model": "tacotron2", "lr": 1e-4\n}')
    cfg = load_config(str(p))
    assert cfg.model == "tacotron2"
    assert cfg.lr == 1e-4


def test_check_argument_rules():
    c = {"x": 5, "y": "graves"}
    check_argument("x", c, val_type=int, min_val=1, max_val=10)
    check_argument("y", c, enum_list=["graves", "original"])
    with pytest.raises(AssertionError):
        check_argument("x", c, val_type=int, max_val=3)
    with pytest.raises(AssertionError):
        check_argument("missing", c, restricted=True)
    with pytest.raises(AssertionError):
        check_argument("y", c, enum_list=["sigmoid"])
    # alternative key satisfies requirement
    check_argument("missing", {"alt": 1}, restricted=True, alternative="alt")
    # prerequisite disabled -> optional
    check_argument("ddc_r", {"double_decoder_consistency": False}, restricted=True,
                   prerequest="double_decoder_consistency")


def _minimal_tts_config():
    return AttrDict({
        "model": "tacotron2",
        "run_name": "test",
        "audio": {
            "sample_rate": 22050, "num_mels": 80, "fft_size": 1024,
            "hop_length": 256, "win_length": 1024, "preemphasis": 0.0,
            "min_level_db": -100, "ref_level_db": 20, "power": 1.5,
            "griffin_lim_iters": 60, "signal_norm": True, "symmetric_norm": True,
            "max_norm": 4.0, "clip_norm": True, "mel_fmin": 0.0,
            "mel_fmax": 8000.0, "do_trim_silence": True,
        },
        "batch_size": 32, "eval_batch_size": 16, "r": 7,
        "loss_masking": True, "run_eval": True, "test_delay_epochs": 0,
        "print_step": 25, "save_step": 1000, "checkpoint": True,
        "grad_clip": 1.0, "epochs": 1, "lr": 1e-4, "seq_len_norm": False,
        "datasets": [{"name": "ljspeech", "path": "x", "meta_file_train": "m.csv"}],
        "output_path": "/tmp/out",
    })


def test_check_config_tts_accepts_minimal():
    check_config_tts(_minimal_tts_config())


def test_check_config_tts_rejects_bad_model():
    c = _minimal_tts_config()
    c.model = "wavenet"
    with pytest.raises(AssertionError):
        check_config_tts(c)


def test_check_config_tts_rejects_bad_audio():
    c = _minimal_tts_config()
    c.audio.num_mels = 1
    with pytest.raises(AssertionError):
        check_config_tts(c)


def test_shipped_configs_validate():
    """configs/ examples must load, validate, and build their models."""
    import os
    from tts_tpu.config import (check_config_speaker_encoder,
                                check_config_tts, check_config_vocoder)
    from tts_tpu.models.registry import setup_model
    from tts_tpu.models.vocoder.registry import (setup_discriminator,
                                                 setup_generator)

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    c1 = load_config(os.path.join(root, "tacotron2_ljspeech.json"))
    check_config_tts(c1)
    assert setup_model(130, 1, c1) is not None
    c2 = load_config(os.path.join(root, "glow_tts_ljspeech.json"))
    check_config_tts(c2)
    assert setup_model(130, 1, c2) is not None
    c3 = load_config(os.path.join(root, "multiband_melgan.json"))
    check_config_vocoder(c3)
    assert setup_generator(c3) is not None
    assert setup_discriminator(c3) is not None
    c4 = load_config(os.path.join(root, "speaker_encoder.json"))
    check_config_speaker_encoder(c4)
