"""Synthesis CLI (≙ /root/reference/TTS/bin/synthesize.py): text -> wav file,
prints RTF + time-per-step."""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("text")
    parser.add_argument("config_path")
    parser.add_argument("model_path")
    parser.add_argument("out_path", nargs="?", default="tts_output")
    parser.add_argument("--vocoder_path", default=None)
    parser.add_argument("--vocoder_config_path", default=None)
    parser.add_argument("--speaker_id", type=int, default=None)
    args = parser.parse_args(argv)
    if not args.text.strip():
        parser.error("text is empty")

    from tts_tpu.audio.processor import write_wav
    from tts_tpu.infer.synthesizer import Synthesizer

    synth = Synthesizer(args.model_path, args.config_path,
                        args.vocoder_path, args.vocoder_config_path)
    t0 = time.time()
    wav = synth.tts(args.text, speaker_id=args.speaker_id)
    dt = time.time() - t0
    audio_s = len(wav) / synth.ap.sample_rate
    print(f" > Run-time: {dt:.3f}s")
    print(f" > Real-time factor: {dt / max(audio_s, 1e-6):.4f}")

    os.makedirs(args.out_path, exist_ok=True)
    file_name = "_".join(args.text.split())[:40].replace(".", "") + ".wav"
    out_file = os.path.join(args.out_path, file_name)
    write_wav(out_file, wav, synth.ap.sample_rate)
    print(f" > Saved: {out_file}")


if __name__ == "__main__":
    main()
