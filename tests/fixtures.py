"""Synthetic LJSpeech-format fixture: tiny wavs + metadata.csv, generated on
the fly (replaces the reference's bundled tests/data/ljspeech sample)."""

import os

import numpy as np

from tts_tpu.audio.processor import write_wav

SR = 22050

SENTENCES = [
    "hello world",
    "this is a test",
    "the quick brown fox",
    "jumps over the lazy dog",
    "speech synthesis on tensor processing units",
    "four score and seven years ago",
    "a tiny dataset for unit tests",
    "goodbye and thanks for all the fish",
]


def make_ljspeech_fixture(root: str, n_items: int = 8, sr: int = SR,
                          base_dur: float = 0.3, dur_step: float = 0.05
                          ) -> str:
    """Create root/metadata.csv + root/wavs/*.wav; returns root.

    base_dur/dur_step control utterance lengths — the default keeps unit
    tests fast; test_train_e2e.py passes ~1 s durations for a
    realistic-length on-disk run (≙ the reference's bundled LJSpeech
    sample, tests/data/ljspeech)."""
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    lines = []
    for i in range(n_items):
        text = SENTENCES[i % len(SENTENCES)]
        dur = base_dur + dur_step * i
        t = np.arange(int(dur * sr)) / sr
        freq = 150 + 30 * i
        y = 0.3 * np.sin(2 * np.pi * freq * t)
        y += 0.05 * rng.standard_normal(len(t))
        name = f"LJ001-{i:04d}"
        write_wav(os.path.join(wav_dir, name + ".wav"), y.astype(np.float32), sr)
        lines.append(f"{name}|{text}|{text}")
    with open(os.path.join(root, "metadata.csv"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return root
