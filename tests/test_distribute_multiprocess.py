"""2-process jax.distributed smoke test through bin/distribute.py.

Covers the one distributed surface virtual-device tests can't: a real
process group (coordinator rendezvous, cross-process collectives,
host-local batch assembly). The reference's equivalent code was untested
(SURVEY.md §4; ≙ /root/reference/TTS/bin/distribute.py:13-67 +
TTS/tts/utils/distribute.py:60-116)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dp_step_matches_single_device():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the child asserts psum correctness and DP==single-device param equality
    out = subprocess.run(
        [sys.executable, "-m", "tts_tpu.bin.distribute",
         "--script", "_dist_smoke", "--num_processes", "2",
         "--port", "12517"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "dist_smoke OK: 2 processes" in out.stdout
