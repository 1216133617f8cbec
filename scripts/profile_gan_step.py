"""Stage breakdown of the MB-MelGAN GAN train step (160.7 ms/step measured
at B=32, seg=64 frames — ~40x the ~4 ms FLOP roofline; find the offender).

Isolated rows carry ~1 ms tunnel overhead each; trust relative sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, SEG, HOP, N_MELS = 32, 64, 256, 80


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: None, out)
    s = jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    from tts_tpu.losses.vocoder_losses import generator_loss
    from tts_tpu.models.vocoder.melgan import MelganMultiscaleDiscriminator
    from tts_tpu.models.vocoder.multiband_melgan import \
        MultibandMelganGenerator

    rng = jax.random.PRNGKey(0)
    gen = MultibandMelganGenerator()
    disc = MelganMultiscaleDiscriminator()
    mel = jax.random.normal(rng, (B, SEG, N_MELS))
    audio = jax.random.normal(rng, (B, SEG * HOP, 1)) * 0.1
    gv = gen.init(rng, mel)["params"]
    dv = disc.init(rng, audio)["params"]

    # 1. G forward (subbands)
    @jax.jit
    def g_fwd(p, mel):
        return gen.apply({"params": p}, mel)
    timeit("G fwd (subbands)", g_fwd, gv, mel)

    # 2. G fwd + PQMF synthesis
    @jax.jit
    def g_fwd_pqmf(p, mel):
        return gen.pqmf.synthesis(gen.apply({"params": p}, mel))
    timeit("G fwd + pqmf", g_fwd_pqmf, gv, mel)

    # 3. D forward
    @jax.jit
    def d_fwd(p, y):
        return disc.apply({"params": p}, y)
    timeit("D fwd", d_fwd, dv, audio)

    # 4. STFT losses only (G loss without disc terms)
    @jax.jit
    def stft_only(p, mel, y):
        y_hat_sub = gen.apply({"params": p}, mel)
        y_hat = gen.pqmf.synthesis(y_hat_sub)[:, :y.shape[1]]
        losses = generator_loss(y_hat, y, use_subband_stft_loss=True,
                                y_hat_sub=y_hat_sub,
                                y_sub=gen.pqmf.analysis(y))
        return losses["G_loss"]
    timeit("G fwd + STFT/subband losses", stft_only, gv, mel, audio)

    # 5. grad of (4): G bwd through STFT losses
    g5 = jax.jit(jax.grad(lambda p, mel, y: stft_only.__wrapped__(p, mel, y)))
    timeit("grad[G fwd + STFT losses]", g5, gv, mel, audio)

    # 6. grad of G adversarial path (G fwd -> D fwd -> hinge), D frozen
    def adv(p, mel, y):
        y_hat_sub = gen.apply({"params": p}, mel)
        y_hat = gen.pqmf.synthesis(y_hat_sub)[:, :y.shape[1]]
        scores = disc.apply({"params": dv}, y_hat)
        if isinstance(scores, tuple):
            scores = scores[0]
        return sum(jnp.mean((1.0 - s) ** 2) for s in scores)
    g6 = jax.jit(jax.grad(adv))
    timeit("grad[G -> D adversarial]", g6, gv, mel, audio)

    # 7. grad of D on real+fake (D update path)
    def d_loss(pd, y, y_hat):
        sr = disc.apply({"params": pd}, y)
        sf = disc.apply({"params": pd}, y_hat)
        sr = sr[0] if isinstance(sr, tuple) else sr
        sf = sf[0] if isinstance(sf, tuple) else sf
        return (sum(jnp.mean((1.0 - s) ** 2) for s in sr)
                + sum(jnp.mean(s ** 2) for s in sf))
    y_hat_const = g_fwd_pqmf(gv, mel)[:, :audio.shape[1]]
    g7 = jax.jit(jax.grad(d_loss))
    timeit("grad[D real+fake]", g7, dv, audio, y_hat_const)


if __name__ == "__main__":
    main()
