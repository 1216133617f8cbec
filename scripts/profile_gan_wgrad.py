"""grad[D real+fake] with conv_lowering='conv' vs 'pallas_wgrad' (B=32,
seg=64). The D update is 131.4 of the 160.7 ms GAN step
(scripts/profile_gan_step.py); the Pallas wgrad kernel saves ~2.4 ms per
down_0..2 layer pass (probe_wgrad_pallas.py). VERDICT r2 item 3."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, SEG, HOP = 32, 64, 256


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    from tts_tpu.models.vocoder.melgan import MelganMultiscaleDiscriminator

    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (B, SEG * HOP, 1)) * 0.1
    fake = jax.random.normal(rng, (B, SEG * HOP, 1)) * 0.1

    for lowering in ("conv", "pallas_wgrad"):
        disc = MelganMultiscaleDiscriminator(conv_lowering=lowering)
        dv = disc.init(rng, audio)["params"]

        def d_loss(pd, y, y_hat, disc=disc):
            sr, _ = disc.apply({"params": pd}, y)
            sf, _ = disc.apply({"params": pd}, y_hat)
            return (sum(jnp.mean((1.0 - s) ** 2) for s in sr)
                    + sum(jnp.mean(s ** 2) for s in sf))

        g = jax.jit(jax.grad(d_loss))
        timeit(f"grad[D real+fake] {lowering}", g, dv, audio, fake)


if __name__ == "__main__":
    main()
