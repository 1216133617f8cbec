"""Dataset mel/linear mean-var stats -> scale_stats.npy
(≙ /root/reference/TTS/bin/compute_statistics.py:40-82)."""

from __future__ import annotations

import argparse

import numpy as np


def compute_statistics(config: dict, out_path: str, max_items: int = 0) -> dict:
    from tts_tpu.audio import AudioProcessor
    from tts_tpu.data import load_meta_data

    # stats must be computed on unnormalized specs
    audio_cfg = dict(config["audio"])
    audio_cfg.update(signal_norm=False, stats_path=None)
    ap = AudioProcessor(**audio_cfg)
    items, _ = load_meta_data(config["datasets"], eval_split_size=0.0)
    if max_items:
        items = items[:max_items]

    mel_sum = mel_sq = lin_sum = lin_sq = 0.0
    n_frames = 0
    for text, wav_path, _ in items:
        wav = ap.load_wav(wav_path)
        mel = ap.melspectrogram(wav)
        linear = ap.spectrogram(wav)
        mel_sum = mel_sum + mel.sum(axis=0)
        mel_sq = mel_sq + (mel**2).sum(axis=0)
        lin_sum = lin_sum + linear.sum(axis=0)
        lin_sq = lin_sq + (linear**2).sum(axis=0)
        n_frames += mel.shape[0]

    mel_mean = mel_sum / n_frames
    mel_std = np.sqrt(np.maximum(mel_sq / n_frames - mel_mean**2, 1e-8))
    lin_mean = lin_sum / n_frames
    lin_std = np.sqrt(np.maximum(lin_sq / n_frames - lin_mean**2, 1e-8))

    stats = {
        "mel_mean": mel_mean.astype(np.float32),
        "mel_std": mel_std.astype(np.float32),
        "linear_mean": lin_mean.astype(np.float32),
        "linear_std": lin_std.astype(np.float32),
        "audio_config": {k: config["audio"][k]
                         for k in ("sample_rate", "num_mels", "fft_size",
                                   "hop_length", "win_length")
                         if k in config["audio"]},
    }
    np.save(out_path, stats, allow_pickle=True)
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--out_path", required=True)
    args = parser.parse_args(argv)

    from tts_tpu.config import load_config

    compute_statistics(load_config(args.config_path), args.out_path)
    print(f" > stats saved to {args.out_path}")


if __name__ == "__main__":
    main()
