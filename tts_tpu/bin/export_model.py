"""Export CLI: checkpoint -> SavedModel / TFLite
(≙ /root/reference/TTS/bin/convert_melgan_tflite.py, convert_tacotron2_tflite.py
and the torch->TF converters — one tool because jax2tf stages the same jitted
function instead of a second implementation)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--format", choices=["tflite", "saved_model"],
                        default="tflite")
    parser.add_argument("--kind", choices=["vocoder", "tts"], default="vocoder")
    parser.add_argument("--frames", type=int, default=256,
                        help="fixed mel-frame count (vocoder) or text length "
                             "(tts) for the export signature")
    parser.add_argument("--y_max_length", type=int, default=400,
                        help="glow tts: static mel-frame budget")
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args(argv)

    from tts_tpu.config import load_config
    from tts_tpu.export import export_saved_model, export_tflite, max_abs_diff
    from tts_tpu.train.checkpoint import load_checkpoint

    c = load_config(args.config_path)
    ckpt = load_checkpoint(args.checkpoint_path)

    if args.kind == "vocoder":
        from tts_tpu.models.vocoder.fold import fold_weight_norm
        from tts_tpu.models.vocoder.registry import setup_generator

        gen = setup_generator(c)
        params = ckpt["params"]
        if getattr(gen, "use_weight_norm", False):
            params = fold_weight_norm(params)
            gen = gen.clone(use_weight_norm=False)
        n_mels = c["audio"].get("num_mels", 80)
        example = jnp.zeros((args.batch, args.frames, n_mels), jnp.float32)

        def fn(mel):
            out = gen.apply({"params": params}, mel)
            if hasattr(gen, "pqmf"):
                out = gen.pqmf.synthesis(out)
            return out
    else:
        from tts_tpu.models.registry import setup_model
        from tts_tpu.text import num_symbols

        model = setup_model(num_symbols(c.get("use_phonemes", False)),
                            c.get("num_speakers", 1), c)
        variables = {"params": ckpt["params"]}
        if ckpt.get("batch_stats"):
            variables["batch_stats"] = ckpt["batch_stats"]
        text = jnp.zeros((args.batch, args.frames), jnp.int32)
        lens = jnp.full((args.batch,), args.frames, jnp.int32)
        example = [text, lens]

        if c.get("model", "").lower() in ("glow_tts", "glowtts", "glow"):
            # duration-driven flow inversion at noise 0 (deterministic:
            # no rng staged, so TFLite needs no threefry legalization —
            # same staging tests/test_export.py:95-99 proves)
            from tts_tpu.models.glow_tts import GlowTTS

            def fn(t, tl):
                out = model.apply(
                    variables, t, tl, noise_scale=0.0,
                    y_max_length=args.y_max_length,
                    method=GlowTTS.inference)
                return out["model_outputs"]
        else:
            # no rngs: inference binds its own fixed dropout stream, and
            # staging a threefry rng would block TFLite legalization (same
            # staging tests/test_export.py:73-75 proves for the scan decoder)
            def fn(t, tl):
                return model.apply(
                    variables, t, tl, method=type(model).inference,
                )["postnet_outputs"]

    if args.format == "tflite":
        export_tflite(fn, example if isinstance(example, list) else [example],
                      args.output_path)
    else:
        export_saved_model(fn,
                           example if isinstance(example, list) else [example],
                           args.output_path)
    print(f" > exported {args.kind} ({args.format}) to {args.output_path}")


if __name__ == "__main__":
    main()
