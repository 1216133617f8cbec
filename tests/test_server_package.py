"""Packaging e2e (SURVEY.md §4 tier 10, ≙ reference
tests/test_server_package.sh:1-37): build a wheel with an embedded dummy
checkpoint, install it into a fresh venv, boot the zero-config server, hit
/api/tts, assert WAV frames come back."""

import json
import os
import shutil
import subprocess
import sys
import time
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_embedded_model(pkg_root):
    """Write a tiny random-init Tacotron2 checkpoint + config into
    <pkg_root>/tts_tpu/server/model/ (≙ setup.py:89-103 package-data)."""
    import jax
    import jax.numpy as jnp

    from tests.fixtures import SR
    from tts_tpu.config import AttrDict
    from tts_tpu.models.registry import setup_model
    from tts_tpu.text import num_symbols
    from tts_tpu.train.checkpoint import save_checkpoint

    cfg = {
        "model": "tacotron2", "run_name": "embedded",
        "audio": {
            "sample_rate": SR, "num_mels": 80, "fft_size": 1024,
            "hop_length": 256, "win_length": 1024, "preemphasis": 0.0,
            "min_level_db": -100, "ref_level_db": 20, "power": 1.5,
            "griffin_lim_iters": 5, "signal_norm": True,
            "symmetric_norm": True, "max_norm": 4.0, "clip_norm": True,
            "mel_fmin": 0.0, "mel_fmax": 8000.0, "do_trim_silence": False,
        },
        "r": 2, "num_speakers": 1, "use_phonemes": False,
        "text_cleaner": "english_cleaners", "max_decoder_steps": 20,
    }
    model = setup_model(num_symbols(False), 1, AttrDict(cfg))
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng},
                   jnp.zeros((1, 8), jnp.int32), jnp.array([8], jnp.int32),
                   jnp.zeros((1, 12, 80)), jnp.array([12], jnp.int32))
    model_dir = os.path.join(pkg_root, "tts_tpu", "server", "model")
    save_checkpoint(model_dir, params=v["params"],
                    batch_stats=v.get("batch_stats"), step=1, r=2)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg, f)


@pytest.mark.slow
def test_wheel_embedded_server_e2e(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copytree(os.path.join(REPO, "tts_tpu"), src / "tts_tpu",
                    ignore=shutil.ignore_patterns("__pycache__", "*.so"))
    for f in ("pyproject.toml", "README.md"):
        shutil.copy(os.path.join(REPO, f), src / f)
    _make_embedded_model(str(src))

    # build the wheel offline (no build isolation: setuptools is baked in)
    dist = tmp_path / "dist"
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(dist), "."],
        cwd=src, check=True, capture_output=True, text=True)
    wheels = list(dist.glob("tts_tpu-*.whl"))
    assert len(wheels) == 1, wheels

    # fresh venv; the wheel installs offline, and the baked-in deps (jax,
    # numpy, ...) are exposed through a .pth back-link because the "system"
    # interpreter is itself a venv (--system-site-packages would skip it)
    venv = tmp_path / "venv"
    subprocess.run([sys.executable, "-m", "venv", str(venv)], check=True)
    vpy = str(venv / "bin" / "python")
    parent_site = subprocess.run(
        [sys.executable, "-c",
         "import sysconfig; print(sysconfig.get_paths()['purelib'])"],
        check=True, capture_output=True, text=True).stdout.strip()
    venv_site = subprocess.run(
        [vpy, "-c",
         "import sysconfig; print(sysconfig.get_paths()['purelib'])"],
        check=True, capture_output=True, text=True).stdout.strip()
    with open(os.path.join(venv_site, "_parent_deps.pth"), "w") as f:
        f.write(parent_site + "\n")
    subprocess.run([vpy, "-m", "pip", "install", "--no-index", "--no-deps",
                    str(wheels[0])], check=True, capture_output=True,
                   text=True)

    # the installed package must be importable WITHOUT the repo on the path,
    # and the server must find its embedded model with zero args
    out = subprocess.run(
        [vpy, "-c",
         "import tts_tpu, os; assert 'site-packages' in tts_tpu.__file__, "
         "tts_tpu.__file__; "
         "from tts_tpu.server.server import embedded_model_paths; "
         "c, g = embedded_model_paths(); assert c and g, (c, g); print('ok')"],
        cwd=str(tmp_path), capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout

    env = dict(os.environ)
    env["TTS_TPU_FORCE_CPU"] = "1"
    env.pop("PYTHONPATH", None)
    port = 5114
    proc = subprocess.Popen(
        [vpy, "-m", "tts_tpu.server.server", "--port", str(port)],
        cwd=str(tmp_path), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 300
        wav_bytes = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server died: {proc.stdout.read()[-2000:]}")
            try:
                with urllib.request.urlopen(
                        f"http://localhost:{port}/api/tts?text=hello",
                        timeout=180) as r:
                    wav_bytes = r.read()
                break
            except (urllib.error.URLError, ConnectionError):
                time.sleep(1.0)
        assert wav_bytes is not None, "server never came up"
        assert wav_bytes[:4] == b"RIFF"
        assert len(wav_bytes) > 1000
    finally:
        proc.terminate()
        proc.wait(timeout=30)
