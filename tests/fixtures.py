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


def make_libritts_fixture(root: str, n_speakers: int = 2,
                          n_per_speaker: int = 4, sr: int = SR,
                          dur: float = 1.3) -> str:
    """Multi-speaker LibriTTS-format fixture: root/<spk>_000/*trans.tsv +
    wavs. Speaker identity is ACOUSTIC — each speaker has a distinct
    fundamental and amplitude — so a speaker encoder can separate them and a
    TTS model can learn level conditioning from d-vectors. Equal durations
    keep the collated batch a single XLA shape."""
    rng = np.random.default_rng(7)
    freqs = [150, 320, 520, 710][:n_speakers]
    amps = [0.5, 0.08, 0.25, 0.9][:n_speakers]
    for s in range(n_speakers):
        spk_dir = os.path.join(root, f"{s + 1}_000")
        os.makedirs(spk_dir, exist_ok=True)
        lines = []
        for i in range(n_per_speaker):
            utt_id = f"{s + 1}_000_{i:03d}"
            text = SENTENCES[(s * n_per_speaker + i) % len(SENTENCES)]
            t = np.arange(int(dur * sr)) / sr
            y = amps[s] * np.sin(2 * np.pi * freqs[s] * t)
            y += 0.6 * amps[s] * np.sin(2 * np.pi * 2 * freqs[s] * t)
            y += 0.01 * rng.standard_normal(len(t))
            write_wav(os.path.join(spk_dir, utt_id + ".wav"),
                      y.astype(np.float32), sr)
            lines.append(f"{utt_id}\t{text}\t{text}")
        with open(os.path.join(spk_dir, "fixture_trans.tsv"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
    return root


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
