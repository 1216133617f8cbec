"""Ablate the fused serving pipeline to localize remaining latency."""

import time

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.vocoder.fold import fold_weight_norm
from tts_tpu.models.vocoder.melgan import _reflect_pad_t
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.models.vocoder.serving import _conv_transpose
from tts_tpu.ops.pallas.fused_resstack import (_fused_stack_packed,
                                               stack_params_from_tree)

B, T = 64, 248


def fence(x):
    return float(jnp.asarray(x).sum())


def timeit(fn, args, iters=30, name=""):
    out = fn(*args)
    fence(out[-1] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out[-1] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.3f} ms")
    return dt


def build(variant):
    rng = jax.random.PRNGKey(0)
    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    vv = gen.init(rng, jnp.zeros((2, T, 80)))
    p = fold_weight_norm(vv["params"])
    mel = jax.random.normal(rng, (B, T, 80))

    def fwd(p, c):
        k = gen.proj_kernel
        x = _reflect_pad_t(c, (k - 1) // 2)
        x = nn.Conv(gen.base_channels, (k,), padding="VALID").apply(
            {"params": p["proj_in"]["conv"]}, x)
        ch = gen.base_channels
        layout = "NWC"
        for i, factor in enumerate(gen.upsample_factors):
            ch //= 2
            x = nn.leaky_relu(x, 0.2)
            up = p[f"upsample_{i}"]
            x = _conv_transpose(x, up["kernel"], up["bias"], factor,
                                in_layout=layout, out_layout="NCW")
            layout = "NCW"
            if variant != "no_stacks":
                packed = stack_params_from_tree(p[f"resstack_{i}"], 3)
                x = _fused_stack_packed(x, *packed,
                                        compute_dtype=jnp.float32,
                                        transpose_in_kernel=False)
        if variant == "no_tail":
            return x.sum()
        x = jnp.swapaxes(x, 1, 2)
        x = nn.leaky_relu(x, 0.2)
        x = _reflect_pad_t(x, (k - 1) // 2)
        x = nn.Conv(gen.out_channels, (k,), padding="VALID").apply(
            {"params": p["proj_out"]["conv"]}, x)
        x = jnp.tanh(x)
        if variant == "no_pqmf":
            return x.sum()
        return gen.pqmf.synthesis(x).sum()

    return jax.jit(fwd), (p, mel)


def main():
    for variant in ["full", "no_stacks", "no_tail", "no_pqmf"]:
        fn, args = build(variant)
        timeit(fn, args, name=f"variant={variant}")

    # isolated conv_transpose x8 at stage-1 geometry, both layouts
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (B, 192, 496))   # NCW
    kern = jax.random.normal(rng, (16, 192, 96)) * 0.05
    bias = jnp.zeros((96,))
    timeit(jax.jit(lambda x: _conv_transpose(x, kern, bias, 8, "NCW", "NCW").sum()),
           (x,), name="convT x8 NCW->NCW (192->96)")
    xw = jnp.swapaxes(x, 1, 2)
    timeit(jax.jit(lambda x: _conv_transpose(x, kern, bias, 8, "NWC", "NWC").sum()),
           (xw,), name="convT x8 NWC->NWC (192->96)")


if __name__ == "__main__":
    main()
