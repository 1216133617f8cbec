"""Train Tacotron2 (gradual-r) / Glow-TTS on the 32 REAL LJSpeech clips
bundled with the reference's tests, on the TPU, to overfit alignment.

The corpus is /root/reference/tests/data/ljspeech (32 utterances, 222 s of
real speech, standard LJSpeech metadata.csv layout) — the same data the
reference's own CI trains on (/root/reference/tests/test_tts_train.sh:5-13);
we read the audio in place (data, not code). This upgrades every previous
synthetic-audio convergence result to real speech: real durations, real
attention targets, real spectral statistics.

Design notes for the TPU (axon tunnel) environment:
- ONE batch shape per r: the full train split fits in a single batch, so each
  reduction factor compiles exactly one train-step executable (remote XLA
  compiles here cost tens of minutes; per-batch shapes would be fatal).
- `cache_features` + trainer dataset memoization make epoch 2+ host cost ~0,
  so wall time is compile + TPU steps, not 1200x STFT recompute.
- run_eval stays off during training (the eval step would be a second
  compile); quality metrics come from bin/eval_model on the saved
  checkpoints afterwards (runs fine on CPU).

Usage:
  python scripts/train_real_ljspeech.py --model tacotron2 --out runs_real
  python scripts/train_real_ljspeech.py --model glow --out runs_real
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_PATH = "/root/reference/tests/data/ljspeech"

AUDIO = {
    "sample_rate": 22050, "num_mels": 80, "fft_size": 1024,
    "hop_length": 256, "win_length": 1024, "preemphasis": 0.0,
    "min_level_db": -100, "ref_level_db": 20, "power": 1.5,
    "griffin_lim_iters": 30, "signal_norm": True, "symmetric_norm": True,
    "max_norm": 4.0, "clip_norm": True, "mel_fmin": 50.0, "mel_fmax": 7600.0,
    "spec_gain": 20.0, "do_trim_silence": True, "trim_db": 60.0,
}


def tacotron2_config(steps: int, batch_size: int) -> dict:
    # gradual r 7 -> 2 (two compiles); guided attention pushes the diagonal
    # early so the r=2 phase refines an already-aligned model
    r2_start = max(steps // 3, 1)
    return {
        "model": "tacotron2",
        "run_name": "taco2_real_lj",
        "audio": AUDIO,
        "batch_size": batch_size, "eval_batch_size": batch_size,
        "r": 2,
        "gradual_training": [[0, 7, batch_size], [r2_start, 2, batch_size]],
        "mixed_precision": True,
        "loss_masking": True, "seq_len_norm": False,
        "decoder_loss_alpha": 0.25, "postnet_loss_alpha": 0.25,
        "ga_alpha": 5.0,
        "attention_type": "original", "attention_norm": "softmax",
        "prenet_type": "original", "prenet_dropout": True,
        "location_attn": True, "windowing": False, "use_forward_attn": False,
        "double_decoder_consistency": False,
        "stopnet": True, "separate_stopnet": True,
        "run_eval": False, "run_test_sentences": False,
        "test_delay_epochs": 10**9,
        "print_step": 25, "save_step": max(steps // 6, 1),
        "checkpoint": True,
        "grad_clip": 5.0, "epochs": steps, "lr": 1e-3, "wd": 0.0,
        "noam_schedule": False,
        "use_phonemes": False, "text_cleaner": "english_cleaners",
        "enable_eos_bos_chars": False,
        "num_speakers": 1, "max_decoder_steps": 1000,
        "min_seq_len": 0, "max_seq_len": 10**9, "batch_group_size": 0,
        "cache_features": True,
        "datasets": [{"name": "ljspeech", "path": DATA_PATH,
                      "meta_file_train": "metadata.csv"}],
    }


def glow_config(steps: int, batch_size: int) -> dict:
    return {
        "model": "glow_tts",
        "run_name": "glow_real_lj",
        "audio": AUDIO,
        "batch_size": batch_size,
        "encoder_type": "transformer",
        "run_eval": False,
        "print_step": 25, "save_step": max(steps // 6, 1),
        "checkpoint": True,
        "grad_clip": 5.0, "epochs": steps, "lr": 1e-3, "wd": 0.0,
        "noam_schedule": False,
        "use_phonemes": False, "text_cleaner": "english_cleaners",
        "enable_eos_bos_chars": False,
        "num_speakers": 1,
        "min_seq_len": 0, "max_seq_len": 10**9,
        "cache_features": True, "save_best_every": 50,
        "datasets": [{"name": "ljspeech", "path": DATA_PATH,
                      "meta_file_train": "metadata.csv"}],
    }


def gan_config(steps: int, batch_size: int = 16) -> dict:
    """MB-MelGAN on the real clips (22 train / 10 eval wavs): one random
    16384-sample segment batch per epoch — static shapes, two compiles
    (warmup step + G+D step)."""
    return {
        "run_name": "mbmelgan_real_lj",
        "audio": AUDIO,
        "generator_model": "multiband_melgan_generator",
        "generator_model_params": {"base_channels": 384,
                                   "upsample_factors": [2, 8, 2, 2],
                                   "num_res_blocks": 4},
        "discriminator_model": "melgan_multiscale_discriminator",
        "discriminator_model_params": {"num_scales": 3},
        "mixed_precision": True,
        "batch_size": batch_size, "seq_len": 16384, "pad_short": 2000,
        "conv_pad": 0, "epochs": steps,
        "steps_to_start_discriminator": max(steps // 4, 1),
        "use_stft_loss": True, "use_subband_stft_loss": True,
        "use_mse_gan_loss": True, "use_feat_match_loss": False,
        "stft_loss_weight": 0.5, "subband_stft_loss_weight": 0.5,
        "mse_G_loss_weight": 2.5,
        "lr_gen": 1e-4, "lr_disc": 1e-4, "grad_clip": 10.0,
        "save_step": max(steps // 3, 1), "eval_split_size": 10,
        "save_best_every": 200,
        "use_cache": True,
        "data_path": os.path.join(DATA_PATH, "wavs"),
    }


def main(argv=None):
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["tacotron2", "glow", "gan"],
                   required=True)
    p.add_argument("--out", default="runs_real")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) — axon ignores "
                        "JAX_PLATFORMS, this uses jax.config instead")
    p.add_argument("--smoke", action="store_true",
                   help="2-step tiny-subset run to validate the pipeline")
    p.add_argument("--restore", default=None,
                   help="checkpoint to continue from")
    p.add_argument("--forward_attn", action="store_true",
                   help="tacotron2 mode: enable forward attention (no extra "
                        "params — restore-compatible with a non-forward "
                        "checkpoint; the reference's recipe for sharpening "
                        "a soft-but-monotonic alignment)")
    p.add_argument("--d_taps", type=int, default=10,
                   help="gan mode: discriminator downsample_kernel_mult "
                        "(10 = reference 41-tap, 5 = reduced 21-tap D)")
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tts_tpu.data import load_meta_data

    datasets = [{"name": "ljspeech", "path": DATA_PATH,
                 "meta_file_train": "metadata.csv"}]
    meta_train, meta_eval = load_meta_data(datasets)
    batch_size = len(meta_train)  # full-batch: ONE compiled shape per r
    print(f" | > real LJSpeech corpus: {len(meta_train)} train / "
          f"{len(meta_eval)} eval items, batch_size={batch_size}")

    if args.model == "tacotron2":
        steps = args.steps or (2 if args.smoke else 1200)
        c = tacotron2_config(steps, 2 if args.smoke else batch_size)
        from tts_tpu.train.trainer_tts import TTSTrainer as Trainer
    elif args.model == "glow":
        steps = args.steps or (2 if args.smoke else 700)
        c = glow_config(steps, 2 if args.smoke else batch_size)
        from tts_tpu.train.trainer_glow import GlowTTSTrainer as Trainer
    else:
        steps = args.steps or (2 if args.smoke else 3000)
        c = gan_config(steps, 4 if args.smoke else 16)
        if args.d_taps != 10:
            c["discriminator_model_params"]["downsample_kernel_mult"] = \
                args.d_taps
            c["run_name"] += f"_dtaps{args.d_taps}"
        from tts_tpu.train.trainer_vocoder import VocoderTrainer as Trainer
    if args.forward_attn and args.model == "tacotron2":
        c["use_forward_attn"] = True
        c["run_name"] += "_fa"
    if args.smoke and args.model == "gan":
        c["seq_len"] = 4096
        c["run_name"] += "_smoke"
    elif args.smoke:
        c["max_seq_len"] = 60  # only the shortest utterances
        c["run_name"] += "_smoke"
        if "gradual_training" in c:
            c["gradual_training"] = [[0, 7, 2], [1, 2, 2]]

    out_dir = os.path.join(args.out, c["run_name"])
    c["output_path"] = out_dir
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(c, f, indent=1)

    trainer = Trainer(c, out_dir)
    if args.restore:
        trainer.restore(args.restore)
    trainer.fit()

    from tts_tpu.train.checkpoint import latest_checkpoint
    print(f" | > done: {latest_checkpoint(out_dir)}")


if __name__ == "__main__":
    main()
