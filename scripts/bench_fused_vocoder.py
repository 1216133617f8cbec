"""Compare plain-XLA vs Pallas-fused MB-MelGAN serving on the real chip."""

import time

import numpy as np

import jax
import jax.numpy as jnp


jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.vocoder.fold import fold_weight_norm
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.models.vocoder.serving import fused_generator_apply

B, T = 64, 248


def fence(x):
    return float(jnp.asarray(x).sum())


def timeit(fn, args, iters=30, name=""):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:36s} {dt:8.3f} ms")
    return out, dt


def main():
    rng = jax.random.PRNGKey(0)
    voc = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    vv = voc.init(rng, jnp.zeros((2, T, 80)))
    vp = fold_weight_norm(vv["params"])
    plain = voc.clone(use_weight_norm=False)
    mel = jax.random.normal(rng, (B, T, 80))

    def f_plain(p, mel):
        sub = plain.apply({"params": p}, mel)
        return plain.pqmf.synthesis(sub)

    def f_fused(p, mel):
        sub = fused_generator_apply(voc, p, mel)
        return voc.pqmf.synthesis(sub)

    def f_fused_bf16(p, mel):
        sub = fused_generator_apply(voc, p, mel, compute_dtype=jnp.bfloat16)
        return voc.pqmf.synthesis(sub)

    out_p, t_p = timeit(jax.jit(f_plain), (vp, mel), name="plain XLA fwd+pqmf")
    out_f, t_f = timeit(jax.jit(f_fused), (vp, mel), name="fused Pallas fwd+pqmf")
    out_b, t_b = timeit(jax.jit(f_fused_bf16), (vp, mel),
                        name="fused Pallas bf16 fwd+pqmf")
    diff = float(jnp.max(jnp.abs(out_p - out_f)))
    diff_b = float(jnp.max(jnp.abs(out_p - out_b)))
    print(f"max |plain-fused| = {diff:.3e}  |plain-fused_bf16| = {diff_b:.3e}")
    print(f"speedup f32 = {t_p / t_f:.2f}x   bf16 = {t_p / t_b:.2f}x")

    # which one is closer to the truth? small-batch CPU f32 reference
    mel_s = mel[:2]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vp_c = jax.device_put(vp, cpu)
        want = np.asarray(jax.jit(f_plain)(vp_c, jax.device_put(mel_s, cpu)))
    got_p = np.asarray(jax.jit(f_plain)(vp, mel_s))
    got_f = np.asarray(jax.jit(f_fused)(vp, mel_s))
    print(f"vs CPU-f32: plain err={np.abs(got_p - want).max():.3e} "
          f"fused err={np.abs(got_f - want).max():.3e}")


if __name__ == "__main__":
    main()
