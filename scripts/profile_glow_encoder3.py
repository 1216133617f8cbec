"""True per-part Glow encoder costs via in-graph k-slope (B=128, T=128).

profile_glow_encoder2.py: whole encoder truly costs 2.37 ms vs ~0.67 ms
FLOP roofline, with only ~0.12 ms/transformer-layer marginal — so ~1.6 ms
hides in the 'fixed' parts. This times k-replicated sub-graphs (embed,
prenet, one attention block, one FFN block, duration predictor,
projections) to find it."""

import math
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, T, C = 128, 128, 192


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def slope(make_run, xs):
    ts = {}
    for k in (1, 5):
        run = make_run(k)
        ts[k] = timeit(run, *xs)
    return (ts[5] - ts[1]) / 4


def main():
    from tts_tpu.models.glow.encoder import DurationPredictor
    from tts_tpu.models.glow.flows import ConvLayerNorm
    from tts_tpu.models.glow.transformer import (FFN,
                                                 RelativePositionMultiHeadAttention)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, C))
    x_mask = jnp.ones((B, T, 1))
    m = x_mask[..., 0]
    attn_mask = (m[:, None, :, None] * m[:, None, None, :]) > 0

    def bench(name, module, args, rngs=None):
        v = module.init({"params": rng, "dropout": rng}, *args, train=False)

        def make_run(k):
            @jax.jit
            def run(v, *args):
                acc = 0.0
                for i in range(k):
                    a0 = args[0] + i * 1e-6  # distinct inputs defeat CSE
                    out = module.apply(v, a0, *args[1:], train=False)
                    acc += out.sum()
                return acc
            return run

        s = slope(make_run, (v,) + args)
        print(f"{name:28s}: {s*1e3:7.3f} ms true", flush=True)

    bench("prenet (ConvLayerNorm x3)",
          ConvLayerNorm(C, C, kernel_size=5, num_layers=3, dropout_rate=0.5),
          (x, x_mask))
    bench("attention block",
          RelativePositionMultiHeadAttention(C, 2, rel_attn_window_size=4,
                                             dropout_rate=0.1),
          (x, attn_mask))
    bench("FFN block", FFN(C, 768, 3, 0.1), (x, x_mask))
    bench("duration predictor", DurationPredictor(256), (x, x_mask))

    # layernorm + residual + mask glue, isolated
    import flax.linen as nn

    class Glue(nn.Module):
        @nn.compact
        def __call__(self, x, x_mask, train=False):
            y = nn.LayerNorm(epsilon=1e-4)(x)
            return y * x_mask

    bench("layernorm+mask", Glue(), (x, x_mask))


if __name__ == "__main__":
    main()
