"""Speaker-encoder training CLI (≙ /root/reference/TTS/bin/train_encoder.py)."""

from __future__ import annotations

import argparse

from tts_tpu.config import check_config_speaker_encoder, load_config
from tts_tpu.train.trainer_encoder import SpeakerEncoderTrainer
from tts_tpu.utils.generic import create_experiment_folder


def main(argv=None):
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--output_path", default="")
    parser.add_argument("--num_steps", type=int, default=1000000)
    args = parser.parse_args(argv)

    c = load_config(args.config_path)
    check_config_speaker_encoder(c)
    root = args.output_path or c.get("output_path", "runs")
    output_path = create_experiment_folder(root, c.get("run_name", "encoder"))
    trainer = SpeakerEncoderTrainer(c, output_path)
    trainer.train(args.num_steps)
    trainer.save_checkpoint()


if __name__ == "__main__":
    main()
