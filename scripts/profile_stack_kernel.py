"""Isolate the fused-stack kernel cost and its components on the chip."""

import time
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.vocoder.melgan import ResidualStack
from tts_tpu.ops.pallas.fused_resstack import (_fused_stack_packed,
                                               pack_stack_params,
                                               _shift_reflect_lanes)

B = 64


def fence(x):
    return float(jnp.asarray(x).sum())


def timeit(fn, args, iters=50, name=""):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.3f} ms")


def make_variant(shift_mode, compute_dtype):
    def leaky(v):
        return jnp.maximum(v, 0.2 * v)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, bout_ref, out_ref):
        x = x_ref[0].astype(compute_dtype)
        for blk in range(3):
            d = 3 ** blk
            y = leaky(x)
            if shift_mode == "roll":
                ym = pltpu.roll(y, d, axis=1)
                yp = pltpu.roll(y, y.shape[1] - d, axis=1)
            elif shift_mode == "none":
                ym, yp = y, y
            else:
                ym = _shift_reflect_lanes(y, d, +1)
                yp = _shift_reflect_lanes(y, d, -1)
            cat1 = jnp.concatenate([ym, y, yp], axis=0)
            h = (jnp.dot(w1_ref[blk].astype(compute_dtype), cat1,
                         preferred_element_type=jnp.float32)
                 + b1_ref[blk].astype(jnp.float32)[:, None])
            cat2 = jnp.concatenate([leaky(h).astype(compute_dtype), x], axis=0)
            x = (jnp.dot(w2_ref[blk].astype(compute_dtype), cat2,
                         preferred_element_type=jnp.float32)
                 + bout_ref[blk].astype(jnp.float32)[:, None]
                 ).astype(compute_dtype)
        out_ref[0] = x.astype(out_ref.dtype)

    @jax.jit
    def run(x, w1, b1, w2, bout):
        Bn, C, T = x.shape
        full = lambda s: pl.BlockSpec(s, lambda b: (0,) * len(s),
                                      memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bn, C, T), x.dtype),
            grid=(Bn,),
            in_specs=[pl.BlockSpec((1, C, T), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full(w1.shape), full(b1.shape), full(w2.shape),
                      full(bout.shape)],
            out_specs=pl.BlockSpec((1, C, T), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, w1, b1, w2, bout)

    return run


def main():
    rng = jax.random.PRNGKey(0)
    for C, T in [(24, 15872), (48, 7936), (96, 3968)]:
        stack = ResidualStack(C, 3, use_weight_norm=False)
        v = stack.init(rng, jnp.zeros((1, 64, C)))
        w1, b1, w2, bout = pack_stack_params(v["params"], 3)
        x = jax.random.normal(rng, (B, C, T))
        for mode in ["reflect", "roll", "none"]:
            timeit(make_variant(mode, jnp.float32), (x, w1, b1, w2, bout),
                   name=f"C={C} T={T} {mode} f32")
        timeit(make_variant("reflect", jnp.bfloat16),
               (x.astype(jnp.bfloat16), w1, b1, w2, bout),
               name=f"C={C} T={T} reflect bf16io")


if __name__ == "__main__":
    main()
