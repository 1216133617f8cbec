"""2-process jax.distributed smoke test through bin/distribute.py.

Covers the one distributed surface virtual-device tests can't: a real
process group (coordinator rendezvous, cross-process collectives,
host-local batch assembly). The reference's equivalent code was untested
(SURVEY.md §4; ≙ /root/reference/TTS/bin/distribute.py:13-67 +
TTS/tts/utils/distribute.py:60-116)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_smoke(num_processes: int, port: int):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the child asserts psum correctness, DP==single-device param equality,
    # and multihost checkpoint write/restore
    out = subprocess.run(
        [sys.executable, "-m", "tts_tpu.bin.distribute",
         "--script", "_dist_smoke", "--num_processes", str(num_processes),
         "--port", str(port)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert f"dist_smoke OK: {num_processes} processes" in out.stdout


def test_two_process_dp_step_matches_single_device():
    _run_smoke(2, 12517)


@pytest.mark.slow
def test_four_process_dp_step_matches_single_device():
    """World=4: the strongest group-size evidence this (single-host CPU)
    environment permits toward BASELINE.json's 1->4-host scaling north star
    (correctness half): 4-way psum, DP-step == single-device equality, and
    4-host checkpoint write/restore."""
    _run_smoke(4, 12519)
