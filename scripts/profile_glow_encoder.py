"""Glow-TTS encoder breakdown at bench shapes (B=128, T_text=128).

FLOP model: ~105 GFLOP/batch (6 transformer layers: qkvo 4.8 + attn 1.6 +
FFN 9.7 GF each; prenet convs 5.7 GF) -> ~0.67 ms at the measured 157
TFLOP/s, vs ~3.5 ms measured in the pipeline (CLAUDE.md breakdown): ~5x off
roofline. Times encoder-only graphs over varying layer counts / toggles
(random weights; timing only) — the per-layer increment separates
attention+FFN cost from prenet/projection/duration cost.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, T_TEXT = 128, 128


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def bench_encoder(name, **enc_kwargs):
    from tts_tpu.models.glow.encoder import GlowTTSEncoder

    rng = jax.random.PRNGKey(0)
    enc = GlowTTSEncoder(num_chars=128, **enc_kwargs)
    text = jax.random.randint(rng, (B, T_TEXT), 1, 128)
    tl = jnp.full((B,), T_TEXT, jnp.int32)
    v = enc.init({"params": rng, "dropout": rng}, text[:2], tl[:2],
                 train=False)

    @jax.jit
    def run(v, text, tl):
        o_mean, o_log_scale, o_dur_log, _ = enc.apply(v, text, tl,
                                                      train=False)
        return o_mean.sum() + o_log_scale.sum() + o_dur_log.sum()

    t = timeit(run, v, text, tl)
    print(f"{name:32s}: {t*1e3:7.3f} ms", flush=True)
    return t


def main():
    base = bench_encoder("full (6 layers)")
    for n in (4, 2, 1):
        bench_encoder(f"{n} layers", num_layers=n)
    bench_encoder("6 layers, no prenet", use_prenet=False)
    bench_encoder("6 layers, no rel-window",
                  rel_attn_window_size=None)
    bench_encoder("6 layers, 1 head", num_heads=1)
    bench_encoder("gatedconv encoder", encoder_type="gatedconv")


if __name__ == "__main__":
    main()
