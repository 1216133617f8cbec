"""GAN-D algorithmic lever (VERDICT r4 item 7): reduced-tap discriminator.

The D backward is AT the VPU MAC roofline (CLAUDE.md: Pallas wgrad/dgrad
kernels, grouped 1x4 contractions unusable on the MXU), so layout work is
closed — the only remaining lever is REMOVING MACs. The downsample convs'
41 taps (df*10+1, reference melgan_discriminator.py:44) are the dominant
MAC term; downsample_kernel_mult=5 -> 21 taps halves them.

This probe measures the full MB-MelGAN G+D bf16 step at B=32/seg=64 for
mult=10 (reference geometry, 77.8 ms/step measured 2026-08-21) vs mult=5.
Quality evidence comes separately from training both variants on the real
LJSpeech clips (scripts/train_real_ljspeech.py --model gan --d_taps 5) and
comparing G loss curves.

Usage: python scripts/probe_gan_d_taps.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_MELS = 80


def _fence(x):
    return float(jnp.sum(x))


def _time_steps(run_one, iters=10, warmup=2, reps=3):
    for _ in range(warmup):
        out = run_one()
    _fence(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run_one()
        _fence(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2], times


def bench(mult: int):
    from tts_tpu.models.vocoder.melgan import MelganMultiscaleDiscriminator
    from tts_tpu.models.vocoder.multiband_melgan import \
        MultibandMelganGenerator
    from tts_tpu.train.gan import create_gan_states, make_gan_train_step
    from tts_tpu.train.optim import make_optimizer

    rng = jax.random.PRNGKey(0)
    hop, seg_frames, gan_b = 256, 64, 32
    gen = MultibandMelganGenerator()
    disc = MelganMultiscaleDiscriminator(downsample_kernel_mult=mult)
    batch = {
        "audio": jax.random.normal(rng, (gan_b, seg_frames * hop, 1)) * 0.1,
        "mel": jax.random.normal(rng, (gan_b, seg_frames, N_MELS)),
    }
    sg, sd = create_gan_states(gen, disc, batch, rng,
                               make_optimizer(lr=1e-4),
                               make_optimizer(lr=1e-4))
    step = make_gan_train_step(gen, disc, hop_len=hop, conv_pad=0,
                               train_disc=True, use_pqmf=True,
                               mixed_precision=True)
    holder = {"sg": sg, "sd": sd}

    def run_one():
        holder["sg"], holder["sd"], losses = step(
            holder["sg"], holder["sd"], batch, batch, rng)
        return losses["G_loss"]

    med, times = _time_steps(run_one)
    print(f"mult={mult} (ks={4*mult+1} taps): {med*1e3:8.2f} ms/step bf16 "
          f"(reps: {[round(t*1e3,2) for t in times]})", flush=True)
    return med


if __name__ == "__main__":
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    t10 = bench(10)
    t5 = bench(5)
    print(f"speedup: {t10/t5:.2f}x  ({t10*1e3:.1f} -> {t5*1e3:.1f} ms/step)")
