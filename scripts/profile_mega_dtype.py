"""Probe: vocoder megakernel compute dtype (fp32 vs bf16) at bench shapes,
plus a raw MXU rate probe (fp32 vs bf16 vs int8 matmul in a Pallas kernel).

Timing per CLAUDE.md: enqueue N iterations, fence once via scalar fetch.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def mxu_probe():
    """Raw matmul rate per dtype: CH distinct (M,K)x(K,N) products summed
    (distinct operands defeat CSE), one kernel dispatch."""
    M, K, N, CH = 512, 512, 2048, 64

    def make(dt, acc):
        def kernel(a_ref, b_ref, o_ref):
            acc_v = jnp.zeros((M, N), acc)
            for i in range(CH):
                acc_v += jnp.dot(a_ref[i], b_ref[i % 8],
                                 preferred_element_type=acc)
            o_ref[...] = acc_v

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), acc),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(a, b)
        return run

    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (CH, M, K))
    b = jax.random.normal(rng, (8, K, N))
    ai = jax.random.randint(rng, (CH, M, K), -127, 127, jnp.int8)
    bi = jax.random.randint(rng, (8, K, N), -127, 127, jnp.int8)
    flops = 2 * M * K * N * CH
    for name, dt, acc, (x, y) in [
            ("fp32", jnp.float32, jnp.float32, (a, b)),
            ("bf16", jnp.bfloat16, jnp.float32,
             (a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))),
            ("int8", jnp.int8, jnp.int32, (ai, bi))]:
        try:
            run = make(dt, acc)
            t = timeit(lambda x, y: run(x, y).sum(), x, y, iters=50)
            print(f"mxu {name}: {t*1e6:9.1f} us  {flops/t/1e12:7.1f} T(FL)OPS")
        except Exception as e:  # Mosaic may reject int8
            print(f"mxu {name}: FAILED: {type(e).__name__}: {str(e)[:200]}")


def mega_dtype():
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

    @functools.partial(jax.jit, static_argnames=("cd",))
    def run(packed, mel, cd):
        return megakernel_generator_apply(gen, packed, mel, compute_dtype=cd)

    ref = run(packed, mel, jnp.float32)
    out = run(packed_bf, mel, jnp.bfloat16)
    print("bf16 max abs diff:", float(jnp.max(jnp.abs(ref - out))),
          " ref scale:", float(jnp.max(jnp.abs(ref))))
    t32 = timeit(lambda p, m: run(p, m, jnp.float32).sum(), packed, mel)
    tbf = timeit(lambda p, m: run(p, m, jnp.bfloat16).sum(), packed_bf, mel)
    print(f"megakernel fp32 B128: {t32*1e3:8.3f} ms")
    print(f"megakernel bf16 B128: {tbf*1e3:8.3f} ms")


if __name__ == "__main__":
    mxu_probe()
    mega_dtype()
