"""Glow-TTS serving breakdown at bench shapes (batch 128): encoder vs
inverse flow decoder. ~1 ms tunnel overhead per isolated measurement."""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, T_TEXT, T_MEL = 128, 128, 248


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def main():
    from tts_tpu.models.glow_tts import GlowTTS

    rng = jax.random.PRNGKey(0)
    glow = GlowTTS(num_chars=128, mas_impl="jnp")
    text = jax.random.randint(rng, (B, T_TEXT), 1, 128)
    text_len = jnp.full((B,), T_TEXT, jnp.int32)
    gv = glow.init({"params": rng, "dropout": rng, "noise": rng},
                   text[:2], text_len[:2], jnp.zeros((2, T_MEL, 80)),
                   jnp.full((2,), T_MEL, jnp.int32), train=False)
    z = jax.random.normal(rng, (B, T_MEL, 80))
    y_mask = jnp.ones((B, T_MEL, 1))

    def enc_call(mdl, text, tl):
        o_mean, o_log_scale, o_dur_log, x_mask = mdl.encoder(
            text, tl, g=None, train=False)
        return o_mean.sum() + o_dur_log.sum()

    def dec_call(mdl, z, y_mask):
        mel, _, _ = mdl.decoder(z, y_mask, g=None, reverse=True, train=False)
        return mel.sum()

    @jax.jit
    def enc_only(gv, text, tl):
        return glow.apply(gv, text, tl, method=enc_call)

    @jax.jit
    def dec_only(gv, z, y_mask):
        return glow.apply(gv, z, y_mask, method=dec_call)

    @jax.jit
    def full(gv, text, tl):
        out = glow.apply(gv, text, tl, noise_scale=0.33, y_max_length=T_MEL,
                         rngs={"noise": jax.random.PRNGKey(1)},
                         method=GlowTTS.inference)
        return out["model_outputs"].sum()

    print(f"encoder+durations : {timeit(enc_only, gv, text, text_len)*1e3:7.3f} ms")
    print(f"inverse flow alone: {timeit(dec_only, gv, z, y_mask)*1e3:7.3f} ms")
    print(f"full glow inference: {timeit(full, gv, text, text_len)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
