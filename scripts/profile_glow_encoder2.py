"""True in-graph Glow encoder cost: run the encoder k times (distinct
inputs, one jit) — the slope over k is the real per-call device time, free
of the ~1-3 ms per-dispatch tunnel overhead that poisons isolated
measurements (CLAUDE.md: 'only trust in-graph totals')."""

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


def main():
    from tts_tpu.models.glow.encoder import GlowTTSEncoder

    rng = jax.random.PRNGKey(0)
    enc = GlowTTSEncoder(num_chars=128)
    tl = jnp.full((B,), T_TEXT, jnp.int32)
    v = enc.init({"params": rng, "dropout": rng},
                 jax.random.randint(rng, (2, T_TEXT), 1, 128), tl[:2],
                 train=False)

    results = {}
    for k in (1, 4):
        texts = jax.random.randint(rng, (k, B, T_TEXT), 1, 128)

        @jax.jit
        def run(v, texts):
            acc = 0.0
            for i in range(texts.shape[0]):
                m, s, d, _ = enc.apply(v, texts[i], tl, train=False)
                acc += m.sum() + s.sum() + d.sum()
            return acc

        t = timeit(run, v, texts)
        results[k] = t
        print(f"k={k}: {t*1e3:7.3f} ms", flush=True)
    slope = (results[4] - results[1]) / 3
    print(f"true per-encoder cost: {slope*1e3:.3f} ms "
          f"(dispatch floor ~{(results[1]-slope)*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
