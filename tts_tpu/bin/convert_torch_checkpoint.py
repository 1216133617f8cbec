"""Migrate a reference (Mozilla TTS, PyTorch) checkpoint into this framework.

Usage:
    python -m tts_tpu.bin.convert_torch_checkpoint \
        --model_type tacotron2 --config_path config.json \
        --torch_checkpoint model.pth.tar --out_dir ./converted

Covers every ported family: tacotron2, tacotron (v1), glow_tts, the
MelGAN-family generators (melgan / multiband_melgan / fullband_melgan),
pwgan, and speaker_encoder. The resulting checkpoint loads with train.checkpoint /
infer.Synthesizer and synthesizes with element-wise-parity outputs
(tests/test_torch_parity*.py).
"""

from __future__ import annotations

import argparse


def convert(model_type: str, torch_checkpoint: str, out_dir: str,
            config_path: str = None, num_chars: int = None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import unfreeze

    from tts_tpu.compat import torch_port
    from tts_tpu.train.checkpoint import save_checkpoint

    sd = torch_port.load_reference_checkpoint(torch_checkpoint)
    cfg = None
    if config_path:
        from tts_tpu.config import load_config
        cfg = load_config(config_path)

    model_type = model_type.lower()
    batch_stats = None
    extra = {}

    if model_type == "tacotron2":
        params, batch_stats = torch_port.port_tacotron2(sd)
    elif model_type == "tacotron":
        params, batch_stats = torch_port.port_tacotron(sd)
    elif model_type == "glow_tts":
        from tts_tpu.models.glow_tts import GlowTTS
        n_chars = num_chars or int(sd["encoder.emb.weight"].shape[0])
        model = GlowTTS(num_chars=n_chars, rel_attn_window_size=None,
                        mean_only=True)
        rng = jax.random.PRNGKey(0)
        template = model.init(
            {"params": rng, "dropout": rng, "noise": rng},
            jnp.zeros((1, 8), jnp.int32), jnp.array([8], jnp.int32),
            jnp.zeros((1, 12, 80)), jnp.array([12], jnp.int32), train=False)
        params = torch_port.port_glow_tts(sd, unfreeze(template["params"]))
    elif model_type in ("melgan", "multiband_melgan", "fullband_melgan"):
        factors = (2, 8, 2, 2) if model_type == "multiband_melgan" \
            else (8, 8, 2, 2)
        if cfg is not None and "generator_model_params" in cfg:
            factors = tuple(cfg["generator_model_params"].get(
                "upsample_factors", factors))
        params = torch_port.port_melgan(sd, upsample_factors=factors)
        extra["use_weight_norm"] = False  # folded at conversion
    elif model_type == "speaker_encoder":
        params = torch_port.port_speaker_encoder(sd)
    elif model_type == "wavernn":
        factors, res_blocks = (4, 8, 8), 10
        if cfg is not None:
            mp = cfg.get("wavernn_model_params", cfg)
            factors = tuple(mp.get("upsample_factors",
                                   cfg.get("upsample_factors", factors)))
            res_blocks = int(mp.get("res_blocks", res_blocks))
        params, batch_stats = torch_port.port_wavernn(
            sd, res_blocks=res_blocks, upsample_factors=factors)
    elif model_type == "pwgan":
        from tts_tpu.models.vocoder.pwgan import ParallelWaveganGenerator
        model = ParallelWaveganGenerator()
        rng = jax.random.PRNGKey(0)
        scale = int(np.prod(model.upsample_factors))
        template = model.init(rng, jnp.zeros((1, 8 * scale, 1)),
                              jnp.zeros((1, 8, 80)))
        params = torch_port.port_pwgan(sd, unfreeze(template["params"]))
    else:
        raise ValueError(f"unknown model_type {model_type!r}")

    path = save_checkpoint(out_dir, params=params, batch_stats=batch_stats,
                           step=0, config=dict(cfg) if cfg else extra or None,
                           prefix=f"converted_{model_type}")
    return path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_type", required=True,
                        choices=["tacotron2", "tacotron", "glow_tts",
                                 "melgan", "multiband_melgan",
                                 "fullband_melgan", "pwgan",
                                 "speaker_encoder", "wavernn"])
    parser.add_argument("--torch_checkpoint", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--config_path", default=None)
    parser.add_argument("--num_chars", type=int, default=None)
    args = parser.parse_args(argv)
    path = convert(args.model_type, args.torch_checkpoint, args.out_dir,
                   args.config_path, args.num_chars)
    print(f" > Converted -> {path}")


if __name__ == "__main__":
    main()
