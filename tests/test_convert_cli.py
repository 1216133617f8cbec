"""Checkpoint migration CLI: reference .pth.tar -> loadable tts_tpu ckpt."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from tests.test_torch_parity_glow import _install_ref_mas_stub  # noqa: E402

_install_ref_mas_stub()


def test_convert_tacotron2(tmp_path):
    from TTS.tts.models.tacotron2 import Tacotron2 as RefTacotron2
    torch.manual_seed(0)
    ref = RefTacotron2(num_chars=50, num_speakers=1, r=2)
    pth = tmp_path / "ref.pth.tar"
    torch.save({"model": ref.state_dict(), "step": 1234}, pth)

    from tts_tpu.bin.convert_torch_checkpoint import main
    main(["--model_type", "tacotron2", "--torch_checkpoint", str(pth),
          "--out_dir", str(tmp_path / "out")])

    import glob
    import jax
    import jax.numpy as jnp
    from tts_tpu.train.checkpoint import load_checkpoint
    from tts_tpu.models.tacotron2 import Tacotron2

    ckpt_path = glob.glob(str(tmp_path / "out" / "*.ckpt"))[0]
    ckpt = load_checkpoint(ckpt_path)
    model = Tacotron2(num_chars=50, r=2)
    out = model.apply(
        {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]},
        jnp.zeros((1, 8), jnp.int32), jnp.array([8], jnp.int32),
        jnp.zeros((1, 12, 80)), jnp.array([12], jnp.int32),
        train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    assert out["postnet_outputs"].shape == (1, 12, 80)
    assert np.isfinite(np.asarray(out["postnet_outputs"])).all()


def test_convert_glow(tmp_path):
    from TTS.tts.models.glow_tts import GlowTts
    torch.manual_seed(0)
    ref = GlowTts(num_chars=50, hidden_channels=192, filter_channels=768,
                  filter_channels_dp=256, out_channels=80, kernel_size=3,
                  num_heads=2, num_layers_enc=6, dropout_p=0.1,
                  num_flow_blocks_dec=12, kernel_size_dec=5, dilation_rate=1,
                  num_block_layers=4, dropout_p_dec=0.05, num_speakers=0,
                  c_in_channels=0, num_splits=4, num_sqz=2,
                  sigmoid_scale=False, mean_only=True,
                  hidden_channels_enc=192, hidden_channels_dec=192,
                  use_encoder_prenet=True, encoder_type="transformer")
    pth = tmp_path / "glow.pth.tar"
    torch.save({"model": ref.state_dict()}, pth)

    from tts_tpu.bin.convert_torch_checkpoint import main
    main(["--model_type", "glow_tts", "--torch_checkpoint", str(pth),
          "--out_dir", str(tmp_path / "out"), "--num_chars", "50"])

    import glob
    import jax
    import jax.numpy as jnp
    from tts_tpu.train.checkpoint import load_checkpoint
    from tts_tpu.models.glow_tts import GlowTTS

    ckpt_path = glob.glob(str(tmp_path / "out" / "*.ckpt"))[0]
    ckpt = load_checkpoint(ckpt_path)
    model = GlowTTS(num_chars=50, rel_attn_window_size=None, mean_only=True)
    out = model.apply(
        {"params": ckpt["params"]},
        jnp.zeros((1, 8), jnp.int32), jnp.array([8], jnp.int32),
        y_max_length=32, noise_scale=0.0,
        rngs={"noise": jax.random.PRNGKey(0),
              "dropout": jax.random.PRNGKey(0)},
        method=GlowTTS.inference)
    assert out["model_outputs"].shape == (1, 32, 80)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
