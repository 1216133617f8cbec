"""Per-shape matmul cost on the real chip, tunnel-overhead-proof.

probe_mxu_geometry.py's REP=16 dots per dispatch still drowned in the ~1 ms
axon dispatch overhead (16 dots -> every shape "measured" ~62 us/dot). Here
each kernel runs ITERS=256 dots over rotating (w, x) index pairs (defeats
CSE without REP x operand memory) so dispatch overhead is <3% of the total.

Question this answers: what does a (M, K) x (K, N) dot REALLY cost at the
megakernel's shapes — is small-M padding waste being paid (fold would win)
or not (fold's FLOP replication loses, as the end-to-end A/B measured)?
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REP = 8
ITERS = 256


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def bench_shape(M, K, N, note=""):
    def kernel(w_ref, x_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.float32)
        for i in range(ITERS):
            # rotate over REP*REP distinct (w, x) pairs -> no CSE
            acc += jnp.dot(w_ref[i % REP], x_ref[(i * 3 + 1) % REP],
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
        )(w, x).sum()

    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (REP, M, K), jnp.float32)
    x = jax.random.normal(rng, (REP, K, N), jnp.float32)
    t = timeit(run, w, x, iters=10)
    per = t / ITERS
    flops = 2 * M * K * N
    print(f"M={M:4d} K={K:4d} N={N:6d}: {per*1e6:8.3f} us/dot  "
          f"{flops/per/1e12:6.1f} TFLOPS  {N/per*1e-9:6.2f} Gcol/s  {note}",
          flush=True)


def main():
    # stage-3 w1: unfolded vs folded g=4 (same logical work per 4 columns)
    bench_shape(24, 72, 15872, "s3 w1 unfolded")
    bench_shape(96, 144, 3968, "s3 w1 folded g4 d1")
    bench_shape(96, 240, 3968, "s3 w1 folded g4 d3")
    bench_shape(24, 48, 15872, "s3 w2 unfolded")
    bench_shape(96, 192, 3968, "s3 w2 folded g4")
    bench_shape(4, 168, 15872, "proj_out unfolded")
    bench_shape(16, 240, 3968, "proj_out folded g4")
    bench_shape(128, 128, 15872, "control full-M")
    bench_shape(128, 512, 3968, "control big")


if __name__ == "__main__":
    main()
