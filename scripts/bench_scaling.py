"""Data-parallel serving scaling: synthesized audio-seconds/s over an
N-device mesh (BASELINE.json north star: >=0.8 linear scaling 1->4 hosts).

Runs the flagship Glow-TTS + MB-MelGAN-megakernel pipeline through
infer/serving_dp.make_dp_serving with the utterance batch sharded over the
mesh's data axis, at per-device batch 128 (so N devices process N*128
utterances per step). On this box there is one real chip (N=1: prints the
1-chip line); on a pod slice / multi-host it measures the scaling table
directly — same program, after jax.distributed.initialize.

TTS_TPU_FORCE_CPU=1 validates the harness on 8 virtual CPU devices
(compile+execute only; CPU timings are not meaningful).
"""

import os
import time

import jax

if os.environ.get("TTS_TPU_FORCE_CPU"):
    os.environ.setdefault(
        "XLA_FLAGS",
        "--xla_force_host_platform_device_count=8")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.infer.serving_dp import make_dp_serving
from tts_tpu.models.glow_tts import GlowTTS
from tts_tpu.models.vocoder.fold import fold_weight_norm
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.ops.pallas.fused_melgan import (megakernel_generator_apply,
                                             pack_generator_params)
from tts_tpu.parallel.mesh import make_mesh

SR = 22050
PER_DEVICE_BATCH = int(os.environ.get("BENCH_BATCH", "128"))
T_TEXT, T_MEL = 128, 248


def fence(x):
    return float(jnp.asarray(x).sum())


def main():
    n_dev = len(jax.devices())
    interpret = bool(os.environ.get("TTS_TPU_FORCE_CPU"))
    B = PER_DEVICE_BATCH * n_dev

    rng = jax.random.PRNGKey(0)
    glow = GlowTTS(num_chars=128, mas_impl="jnp")
    text = jax.random.randint(rng, (B, T_TEXT), 1, 128)
    text_len = jnp.full((B,), T_TEXT, jnp.int32)
    gv = glow.init({"params": rng, "dropout": rng, "noise": rng},
                   text[:2], text_len[:2], jnp.zeros((2, T_MEL, 80)),
                   jnp.full((2,), T_MEL, jnp.int32), train=False)
    voc = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    vv = voc.init(rng, jnp.zeros((2, T_MEL, 80)))
    plain = voc.clone(use_weight_norm=False)
    packed = pack_generator_params(plain, fold_weight_norm(vv["params"]),
                                   fuse_pqmf=True)

    def synthesize(params, text, text_len):
        gvars, vpacked = params
        out = glow.apply(gvars, text, text_len, noise_scale=0.33,
                         y_max_length=T_MEL,
                         rngs={"noise": jax.random.PRNGKey(1)},
                         method=GlowTTS.inference)
        mel = out["model_outputs"].astype(jnp.float32)
        wav = megakernel_generator_apply(plain, vpacked, mel,
                                         interpret=interpret)
        return wav.sum()[None]  # (1,) so the out_spec has a shardable axis

    mesh = make_mesh((("data", -1),))
    dp = make_dp_serving(synthesize, mesh)
    params = (gv, packed)

    s = dp(params, text, text_len)
    fence(s)
    iters = 3 if interpret else 20
    t0 = time.perf_counter()
    for _ in range(iters):
        s = dp(params, text, text_len)
    fence(s)
    dt = (time.perf_counter() - t0) / iters
    n_samples = T_MEL * 256
    audio_seconds = B * n_samples / SR
    print(f"devices={n_dev} batch={B} ({PER_DEVICE_BATCH}/device): "
          f"{dt*1e3:.3f} ms/step -> {audio_seconds/dt:.1f} audio_s/s total, "
          f"{audio_seconds/dt/n_dev:.1f} per device")


if __name__ == "__main__":
    main()
