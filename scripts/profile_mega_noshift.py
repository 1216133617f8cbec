"""Attribution probe: how much of the vocoder megakernel is the phase-block
true-time SHIFT data movement vs matmuls?

Monkeypatches _true_shift to identity (wrong numerics, identical matmul
count/shapes) and times against the real kernel at bench shapes.
"""

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
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
    import tts_tpu.ops.pallas.fused_melgan as fm

    rng = jax.random.PRNGKey(0)
    B, T = 128, 248
    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    mel = jax.random.normal(rng, (B, T, 80))
    v = gen.init(rng, jnp.zeros((2, T, 80)))
    folded = fold_weight_norm(v["params"])
    packed = fm.pack_generator_params(gen, folded, fuse_pqmf=True)

    @jax.jit
    def real(pk, mel):
        return fm.megakernel_generator_apply(gen, pk, mel).sum()

    t_real = timeit(real, packed, mel)
    print(f"real kernel   : {t_real*1e3:8.3f} ms")

    fm._true_shift = lambda x, sigma, t0, d, direction, mode: x

    @jax.jit
    def noshift(pk, mel):
        return fm.megakernel_generator_apply(gen, pk, mel).sum()

    t_ns = timeit(noshift, packed, mel)
    print(f"no-shift      : {t_ns*1e3:8.3f} ms")
    print(f"shift share   : {(t_real-t_ns)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
