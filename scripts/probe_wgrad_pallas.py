"""Pallas vs XLA wgrad for the MelGAN discriminator grouped convs (B=32,
seg=64 -> L0=16384). Companion to probe_disc_wgrad.py; VERDICT r2 item 3."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.ops.pallas.grouped_conv_grad import (_conv_impl,
                                                  grouped_conv_wgrad)

B, L0 = 32, 64 * 256

LAYERS = [
    ("down_0   41 16->64 g16   ", L0, 16, 64, 41, 4, 16),
    ("down_1   41 64->256 g64  ", L0 // 4, 64, 256, 41, 4, 64),
    ("down_2   41 256->1024 g256", L0 // 16, 256, 1024, 41, 4, 256),
    ("down_3   41 1024->1024 g256", L0 // 64, 1024, 1024, 41, 4, 256),
]


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    tot_x, tot_p = 0.0, 0.0
    for tag, L, cin, cout, k, s, g in LAYERS:
        x = jax.random.normal(rng, (B, L, cin))
        w = jax.random.normal(rng, (k, cin // g, cout)) * 0.02
        dy = jax.random.normal(rng, _conv_impl(x, w, s, g).shape)

        def xla_wgrad(x, dy, s=s, g=g, w=w):
            return jax.grad(
                lambda w: (_conv_impl(x, w, s, g) * dy).sum())(w)

        # in-graph REP with varied inputs so per-dispatch tunnel overhead
        # (~2.6 ms) amortizes and CSE can't collapse the copies
        REP = 8

        def rep(fn):
            def run(x, dy):
                def body(i, acc):
                    scale = 1.0 + 0.001 * i.astype(jnp.float32)
                    return acc + fn(x * scale, dy)
                return jax.lax.fori_loop(
                    0, REP, body, jnp.zeros((k, cin // g, cout)))
            return jax.jit(run)

        gw = rep(xla_wgrad)
        pw = rep(lambda x, dy: grouped_conv_wgrad(x, dy, k, s, g))
        # exactness on device (summed over REP scaled copies)
        err = float(jnp.abs(gw(x, dy) - pw(x, dy)).max())
        scale = float(jnp.abs(gw(x, dy)).max())
        print(f"{tag} max_abs_err {err:.2e} (scale {scale:.1e})")
        tot_x += timeit(f"{tag} XLA wgrad x{REP}", gw, x, dy) / REP
        tot_p += timeit(f"{tag} Pallas wgrad x{REP}", pw, x, dy) / REP
    print(f"\nPER-PASS TOTAL XLA {tot_x*1e3:.2f} ms  "
          f"Pallas {tot_p*1e3:.2f} ms")


if __name__ == "__main__":
    main()
