"""Fused Glow-encoder kernel vs flax XLA at bench shapes (B=128, T=128),
k-slope timing (in-graph replication; dispatch floor ~1.3 ms excluded)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, T = 128, 128


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
    from tts_tpu.ops.pallas.fused_glow_encoder import (
        fused_glow_encoder_apply, pack_glow_encoder_params)

    rng = jax.random.PRNGKey(0)
    enc = GlowTTSEncoder(num_chars=128)
    tl = jnp.full((B,), T, jnp.int32)
    text = jax.random.randint(rng, (B, T), 1, 128)
    v = enc.init({"params": rng, "dropout": rng}, text[:2], tl[:2],
                 train=False)
    params = v["params"]
    packed = pack_glow_encoder_params(enc, params)

    # on-device numeric check once
    want = enc.apply({"params": params}, text, tl, train=False)
    got = fused_glow_encoder_apply(enc, params, packed, text, tl)
    diff = max(float(jnp.abs(jnp.asarray(g) - jnp.asarray(w)).max())
               for g, w in zip(got[:3], want[:3]))
    print(f"max|fused - flax| on-device: {diff:.2e}", flush=True)

    def slope(make_run):
        ts = {}
        for k in (1, 4):
            run = make_run(k)
            ts[k] = timeit(run, text)
        return (ts[4] - ts[1]) / 3, ts[1]

    def flax_run(k):
        @jax.jit
        def run(text):
            acc = 0.0
            for i in range(k):
                m, s, d, _ = enc.apply({"params": params},
                                       (text + i) % 127 + 1, tl, train=False)
                acc += m.sum() + s.sum() + d.sum()
            return acc
        return run

    s, t1 = slope(flax_run)
    print(f"flax XLA       : {s*1e3:7.3f} ms true (k=1 {t1*1e3:.3f})",
          flush=True)

    import sys
    combos = [(8, 2), (8, 1), (8, 4), (16, 2), (4, 2)]
    if len(sys.argv) > 1:
        combos = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]
    for ipb, ag in combos:
        def fused_run(k, ipb=ipb, ag=ag):
            @jax.jit
            def run(text):
                acc = 0.0
                for i in range(k):
                    m, s, d, _ = fused_glow_encoder_apply(
                        enc, params, packed, (text + i) % 127 + 1, tl,
                        ipb=ipb, att_group=ag)
                    acc += m.sum() + s.sum() + d.sum()
                return acc
            return run

        s, t1 = slope(fused_run)
        print(f"fused ipb={ipb:2d} ag={ag}: {s*1e3:7.3f} ms true "
              f"(k=1 {t1*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
