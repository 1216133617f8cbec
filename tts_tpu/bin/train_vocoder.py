"""GAN vocoder training CLI (≙ /root/reference/TTS/bin/train_vocoder.py)."""

from __future__ import annotations

import argparse

from tts_tpu.config import load_config
from tts_tpu.train.checkpoint import latest_checkpoint
from tts_tpu.train.trainer_vocoder import VocoderTrainer
from tts_tpu.utils.generic import create_experiment_folder


def main(argv=None):
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--restore_path", default="")
    parser.add_argument("--continue_path", default="")
    parser.add_argument("--output_path", default="")
    args = parser.parse_args(argv)

    c = load_config(args.config_path)
    if args.continue_path:
        output_path = args.continue_path
        restore = latest_checkpoint(output_path)
    else:
        root = args.output_path or c.get("output_path", "runs")
        output_path = create_experiment_folder(root, c.get("run_name", "vocoder"))
        restore = args.restore_path or None

    trainer = VocoderTrainer(c, output_path)
    if restore:
        trainer.restore(restore)
    trainer.fit()


if __name__ == "__main__":
    main()
