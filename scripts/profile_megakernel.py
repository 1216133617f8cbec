"""Compare vocoder serving paths on the real chip at bench shapes:
current per-stack fused path vs the whole-generator megakernel.

Timing per CLAUDE.md: enqueue N iterations, fence once via scalar fetch.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def main():
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
    from tts_tpu.models.vocoder.serving import fused_generator_apply
    from tts_tpu.ops.pallas.fused_melgan import (megakernel_generator_apply,
                                                 pack_generator_params)

    rng = jax.random.PRNGKey(0)
    B, T = 64, 252
    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    mel = jax.random.normal(rng, (B, T, 80))
    v = gen.init(rng, jnp.zeros((2, T, 80)))
    folded = fold_weight_norm(v["params"])
    plain = gen.clone(use_weight_norm=False)
    packed = pack_generator_params(gen, folded)

    @jax.jit
    def current(params, mel):
        sub = fused_generator_apply(plain, params, mel)
        wav = plain.pqmf.synthesis(sub)
        return wav.sum()

    @jax.jit
    def mega(packed, mel):
        sub = megakernel_generator_apply(gen, packed, mel)
        wav = plain.pqmf.synthesis(sub)
        return wav.sum()

    packed_pq = pack_generator_params(gen, folded, fuse_pqmf=True)

    @jax.jit
    def mega_pq(packed, mel):
        return megakernel_generator_apply(gen, packed, mel).sum()

    # parity on-device
    a = jax.jit(lambda p, m: fused_generator_apply(plain, p, m))(folded, mel)
    b = jax.jit(
        lambda p, m: megakernel_generator_apply(gen, p, m))(packed, mel)
    print("max abs diff vs current path:", float(jnp.max(jnp.abs(a - b))))

    t_cur = timeit(current, folded, mel)
    t_mega = timeit(mega, packed, mel)
    t_pq = timeit(mega_pq, packed_pq, mel)
    print(f"current fused path    : {t_cur*1e3:8.3f} ms/batch")
    print(f"megakernel + XLA PQMF : {t_mega*1e3:8.3f} ms/batch")
    print(f"megakernel w/ PQMF in : {t_pq*1e3:8.3f} ms/batch")


if __name__ == "__main__":
    main()
