"""Glow-TTS + MB-MelGAN serving throughput on the real chip.

Unlike the Tacotron2 scan decoder (sequential over frames), the Glow-TTS
inverse flow is parallel over the whole frame axis — the candidate headline
serving pipeline. Geometry matches bench.py: batch 64, 248 mel frames,
text length 128.
"""

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.glow_tts import GlowTTS
from tts_tpu.models.vocoder.fold import fold_weight_norm
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.ops.pallas.fused_melgan import (megakernel_generator_apply,
                                             pack_generator_params)

SR, HOP = 22050, 256
B = int(os.environ.get("BENCH_BATCH", "64"))
T_TEXT, T_MEL = 128, 248


def fence(x):
    return float(jnp.asarray(x).sum())


def main():
    rng = jax.random.PRNGKey(0)
    glow = GlowTTS(num_chars=128, mas_impl="jnp")
    text = jax.random.randint(rng, (B, T_TEXT), 1, 128)
    text_len = jnp.full((B,), T_TEXT, jnp.int32)
    gv = glow.init({"params": rng, "dropout": rng, "noise": rng},
                   text[:2], text_len[:2], jnp.zeros((2, T_MEL, 80)),
                   jnp.full((2,), T_MEL, jnp.int32), train=False)

    voc = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    vv = voc.init(rng, jnp.zeros((2, T_MEL, 80)))
    vp = fold_weight_norm(vv["params"])
    plain = voc.clone(use_weight_norm=False)
    packed = pack_generator_params(plain, vp, fuse_pqmf=True)

    @jax.jit
    def synthesize(gvars, vpacked, text, text_len):
        out = glow.apply(gvars, text, text_len, noise_scale=0.33,
                         y_max_length=T_MEL,
                         rngs={"noise": jax.random.PRNGKey(1)},
                         method=GlowTTS.inference)
        mel = out["model_outputs"].astype(jnp.float32)
        # whole-generator Pallas megakernel with in-kernel PQMF synthesis
        wav = megakernel_generator_apply(plain, vpacked, mel)
        return wav.shape[1], wav.sum()

    n_samples, s = synthesize(gv, packed, text, text_len)
    fence(s)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        n_samples, s = synthesize(gv, packed, text, text_len)
    fence(s)
    dt = (time.perf_counter() - t0) / iters
    audio_seconds = B * int(n_samples) / SR
    print(f"glow+mbmelgan(megakernel): {dt*1e3:.3f} ms/batch -> "
          f"{audio_seconds/dt:.1f} audio_s/s per chip")


if __name__ == "__main__":
    main()
