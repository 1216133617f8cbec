"""Reference config files must load unchanged (capability parity with the
JSON-with-comments config surface)."""

import os

import pytest

REF_CONFIG = "/root/reference/tests/inputs/test_train_config.json"


@pytest.mark.skipif(not os.path.isfile(REF_CONFIG),
                    reason="reference checkout not mounted")
def test_reference_train_config_loads():
    from tts_tpu.config import check_config_tts, load_config
    from tts_tpu.models.registry import setup_model

    c = load_config(REF_CONFIG)
    assert c.model.lower() == "tacotron2"
    assert c.audio.sample_rate == 22050
    check_config_tts(c)
    model = setup_model(130, 1, c)
    assert model.r == c.r


@pytest.mark.skipif(not os.path.isdir("/root/reference/tests/inputs"),
                    reason="reference checkout not mounted")
def test_reference_vocoder_config_loads():
    from tts_tpu.config import load_config
    from tts_tpu.models.vocoder.registry import (setup_discriminator,
                                                 setup_generator)

    path = ("/root/reference/tests/inputs/"
            "test_vocoder_multiband_melgan_config.json")
    if not os.path.isfile(path):
        pytest.skip("vocoder config not present")
    c = load_config(path)
    gen = setup_generator(c)
    disc = setup_discriminator(c)
    assert gen is not None and disc is not None
