"""Pin down the vocoder megakernel's ~1.67 ms fixed base (proj_in-only at
batch 128): in-kernel transpose vs output write vs residual fixed cost.

Variants (all run proj_in's matmul only):
  v0 transpose + full-block write   (the stage-probe baseline)
  v1 transpose + tiny write         (isolate the output write)
  v2 pre-transposed + full write    (isolate the in-kernel transpose)
  v3 pre-transposed + tiny write    (matmul + fixed cost only)
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, T = 128, 248
C_OUT, T_OUT = 4, 248 * 64


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
    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    mel = jax.random.normal(rng, (B, T, 80))
    melT = jnp.swapaxes(mel, 1, 2)  # (B, 80, T)
    v = gen.init(rng, jnp.zeros((2, T, 80)))
    folded = fold_weight_norm(v["params"])
    w = fm.pack_proj_params(folded["proj_in"]["conv"]["kernel"])
    b = jnp.asarray(folded["proj_in"]["conv"]["bias"])

    def make(pre_transposed, tiny_write):
        def kernel(mel_ref, w_ref, b_ref, out_ref):
            if pre_transposed:
                x = mel_ref[0].astype(jnp.float32)
            else:
                x = jnp.transpose(mel_ref[0]).astype(jnp.float32)
            y = fm._conv_head(x, (0,), T, w_ref, b_ref, gen.proj_kernel,
                              jnp.float32)
            s = jnp.sum(y)
            if tiny_write:
                out_ref[0, :, :128] = jnp.full((C_OUT, 128), s, out_ref.dtype)
            else:
                out_ref[0] = jnp.full(out_ref.shape[1:], s, out_ref.dtype)

        blk_in = (1, 80, T) if pre_transposed else (1, T, 80)
        x_in = melT if pre_transposed else mel

        @jax.jit
        def run(x, w, b):
            o = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, C_OUT, T_OUT), jnp.float32),
                grid=(B,),
                in_specs=[pl.BlockSpec(blk_in, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(w.shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(b.shape, lambda i: (0,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, C_OUT, T_OUT), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(x, w, b)
            return o[:, :, :128].sum()
        return run, x_in

    for name, pt, tw in [("v0 transpose + full write", False, False),
                         ("v1 transpose + tiny write ", False, True),
                         ("v2 pre-T     + full write ", True, False),
                         ("v3 pre-T     + tiny write ", True, True)]:
        run, x_in = make(pt, tw)
        t = timeit(run, x_in, w, b)
        print(f"{name}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
