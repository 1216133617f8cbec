"""Megakernel variant shootout at bench shapes (batch 128, T=248):
base vs accum_taps (per-tap accumulated matmuls, no concat operands) vs
pretransposed (mel transpose hoisted out of the kernel) vs both."""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def main():
    import tts_tpu.ops.pallas.fused_melgan as fm
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator

    rng = jax.random.PRNGKey(0)
    B, T = 128, 248
    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    mel = jax.random.normal(rng, (B, T, 80))
    v = gen.init(rng, jnp.zeros((2, T, 80)))
    folded = fold_weight_norm(v["params"])
    packed = fm.pack_generator_params(gen, folded, fuse_pqmf=True)

    for at in (False, True):
        for pt in (False, True):
            @jax.jit
            def run(mel, packed, at=at, pt=pt):
                wav = fm.megakernel_generator_apply(
                    gen, packed, mel, accum_taps=at, pretransposed=pt)
                return wav.sum()
            t = timeit(run, mel, packed)
            print(f"accum={int(at)} pretrans={int(pt)}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
