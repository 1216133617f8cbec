"""Confirm Mosaic's dot precision semantics on this chip: DEFAULT-precision
f32 x f32 vs explicit bf16 operands vs precision=HIGHEST."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

M, K, N = 512, 512, 1024


def make(precision, cast_bf16):
    def kernel(a_ref, b_ref, o_ref):
        a, b = a_ref[...], b_ref[...]
        if cast_bf16:
            a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(a, b, precision=precision,
                             preferred_element_type=jnp.float32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
    return run


def timeit(fn, *args, iters=50):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def main():
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (M, K))
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N))
    default = make(None, False)(a, b)
    bf16 = make(None, True)(a, b)
    highest = make(jax.lax.Precision.HIGHEST, False)(a, b)
    print("default vs bf16-cast max diff :", float(jnp.max(jnp.abs(default - bf16))))
    print("default vs HIGHEST  max diff  :", float(jnp.max(jnp.abs(default - highest))))
    for name, prec, cast in [("default-f32", None, False),
                             ("bf16-cast  ", None, True),
                             ("HIGHEST-f32", jax.lax.Precision.HIGHEST, False)]:
        run = make(prec, cast)
        t = timeit(lambda a, b: run(a, b).sum(), a, b)
        print(f"{name}: {t*1e6:8.1f} us")


if __name__ == "__main__":
    main()
