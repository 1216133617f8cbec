"""Probe: hybrid-precision megakernel (fp32 shifts, bf16 matmul operands)
vs fp32 at bench shapes (batch 128)."""

import functools
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
    from tts_tpu.ops.pallas.fused_melgan import (megakernel_generator_apply,
                                                 pack_generator_params)
    rng = jax.random.PRNGKey(0)
    B, T = 128, 248
    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    mel = jax.random.normal(rng, (B, T, 80))
    v = gen.init(rng, jnp.zeros((2, T, 80)))
    folded = fold_weight_norm(v["params"])
    packed = pack_generator_params(gen, folded, fuse_pqmf=True)
    packed_bf = pack_generator_params(gen, folded, dtype=jnp.bfloat16,
                                      fuse_pqmf=True)

    @functools.partial(jax.jit, static_argnames=("md",))
    def run(packed, mel, md):
        return megakernel_generator_apply(gen, packed, mel, matmul_dtype=md)

    ref = run(packed, mel, None)
    out = run(packed_bf, mel, jnp.bfloat16)
    print("hybrid max abs diff:", float(jnp.max(jnp.abs(ref - out))),
          " ref scale:", float(jnp.max(jnp.abs(ref))))
    t32 = timeit(lambda p, m: run(p, m, None).sum(), packed, mel)
    thy = timeit(lambda p, m: run(p, m, jnp.bfloat16).sum(), packed_bf, mel)
    print(f"megakernel fp32   B128: {t32*1e3:8.3f} ms")
    print(f"megakernel hybrid B128: {thy*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
