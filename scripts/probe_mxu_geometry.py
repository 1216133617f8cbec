"""Probe the MXU cost model for the megakernel's matmul shapes: is time
proportional to N columns (streaming-bound) or to padded FLOPs?

Shapes mirror the vocoder stages: small M=C_out, small K=k*C_in, huge N=L.
Each timed kernel runs the SAME dot 16x on distinct operand slices
(defeats CSE) in one dispatch to amortize the ~1 ms tunnel overhead.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REP = 16


def timeit(fn, *args, iters=30):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def bench_shape(M, K, N):
    def kernel(w_ref, x_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.float32)
        for i in range(REP):
            acc += jnp.dot(w_ref[i], x_ref[i],
                           preferred_element_type=jnp.float32)
        o_ref[...] = acc

    @jax.jit
    def run(w, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(w, x)

    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (REP, M, K), jnp.float32)
    x = jax.random.normal(rng, (REP, K, N), jnp.float32)
    t = timeit(lambda w, x: run(w, x).sum(), w, x)
    per = t / REP
    flops = 2 * M * K * N
    print(f"M={M:4d} K={K:4d} N={N:6d}: {per*1e6:8.2f} us/dot  "
          f"{flops/per/1e12:6.1f} TFLOPS  {N/per*1e-9:6.2f} Gcol/s")


def main():
    # vocoder stage shapes (w1 matmuls): (C, 3C) x (3C, L)
    bench_shape(24, 72, 16128)     # s3 block
    bench_shape(48, 144, 8064)     # s2 block
    bench_shape(96, 288, 4032)     # s1 block
    bench_shape(192, 576, 504)     # s0 block
    # folded variants of s3: fold time by F into sublanes
    bench_shape(96, 288, 4032)     # s3 folded F=4 (square-ish)
    bench_shape(192, 576, 2016)    # s3 folded F=8
    # control: square-ish big
    bench_shape(256, 512, 8064)
    bench_shape(128, 128, 16128)


if __name__ == "__main__":
    main()
