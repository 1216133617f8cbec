"""Clean MXU rate probe: int8 vs bf16, minimizing non-matmul work.

8 independent (1024,1024)x(1024,1024) dots per kernel, each writing its own
output slice (no accumulator adds), distinct operands (no CSE).
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

M = K = N = 1024
OPS = 8          # distinct operand tensors per side
REP = 64         # dots per dispatch: all (i, j) pairs are distinct -> no CSE


def timeit(fn, *args, iters=30):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def make(acc):
    def kernel(a_ref, b_ref, o_ref):
        for r in range(REP):
            i, j = r % OPS, (r // OPS) % OPS
            o_ref[:, i * N:(i + 1) * N] = jnp.dot(
                a_ref[i], b_ref[j], preferred_element_type=acc)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, OPS * N), acc),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(a, b)
    return run


def main():
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (OPS, M, K)).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (OPS, K, N)).astype(jnp.bfloat16)
    ai = jax.random.randint(rng, (OPS, M, K), -127, 127, jnp.int8)
    bi = jax.random.randint(rng, (OPS, K, N), -127, 127, jnp.int8)
    macs = M * K * N * REP
    for name, acc, (x, y) in [("bf16", jnp.float32, (a, b)),
                              ("int8", jnp.int32, (ai, bi))]:
        run = make(acc)
        t = timeit(lambda x, y: run(x, y).sum(), x, y)
        print(f"{name}: {t*1e6:9.1f} us  {2*macs/t/1e12:7.1f} T(FL)OPS")


if __name__ == "__main__":
    main()
