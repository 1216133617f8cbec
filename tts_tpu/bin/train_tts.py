"""Tacotron/Tacotron2 training CLI (≙ /root/reference/TTS/bin/train_tts.py:637-725).

Multi-host: run the SAME command on every host with --coordinator_address
(replaces the reference's per-GPU process launcher TTS/bin/distribute.py)."""

from __future__ import annotations

import argparse
import sys
import traceback

from tts_tpu.config import load_config
from tts_tpu.parallel.mesh import initialize_multihost, is_primary
from tts_tpu.train.checkpoint import latest_checkpoint
from tts_tpu.train.trainer_tts import TTSTrainer
from tts_tpu.utils.generic import (create_experiment_folder,
                                   remove_experiment_folder)


def main(argv=None):
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--restore_path", default="")
    parser.add_argument("--continue_path", default="",
                        help="resume newest checkpoint from this run dir")
    parser.add_argument("--output_path", default="")
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)

    initialize_multihost(args.coordinator_address, args.num_processes,
                         args.process_id)

    c = load_config(args.config_path)
    if args.continue_path:
        output_path = args.continue_path
        restore = latest_checkpoint(output_path)
    else:
        root = args.output_path or c.get("output_path", "runs")
        output_path = create_experiment_folder(root, c["run_name"]) \
            if is_primary() else root
        restore = args.restore_path or None

    trainer = TTSTrainer(c, output_path)
    if restore:
        trainer.restore(restore, reinit_layers=c.get("reinit_layers"))
    try:
        trainer.fit()
    except KeyboardInterrupt:
        remove_experiment_folder(output_path)
        sys.exit(1)
    except Exception:
        remove_experiment_folder(output_path)
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
