"""Training-step throughput on the real chip (VERDICT r1 item 2).

Times the three jitted hot loops at realistic shapes:
  1. Tacotron2 teacher-forced train step  (≙ ref train_tts.py:144-301)
  2. Glow-TTS train step with the Pallas MAS in-graph
     (≙ ref train_glow_tts.py + monotonic_align/__init__.py:34-49 — the
      reference pays a GPU->CPU->GPU round trip per step here)
  3. MB-MelGAN GAN G+D step               (≙ ref train_vocoder.py:97-281)

Timing: enqueue N steps, fence once by fetching a scalar (axon tunnel —
block_until_ready does not fence; see CLAUDE.md). Prints steps/s and
mel-frames/s per step shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, T_TEXT, T_MEL = 32, 128, 512
N_MELS = 80


def _fence(x):
    return float(jnp.sum(x)) if hasattr(x, "dtype") else float(x)


def _time_steps(run_one, iters=10, warmup=2, reps=3):
    """Median of ``reps`` independent timed loops (run-to-run spread on
    this tunnel is ~3-12%, CLAUDE.md — single loops are not defensible);
    prints the spread alongside each caller's median."""
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
    med = times[len(times) // 2]
    print(f"    [reps={reps}: min {times[0]*1e3:.2f} med {med*1e3:.2f} "
          f"max {times[-1]*1e3:.2f} ms]", flush=True)
    return med


def taco2_batch(rng, r=2):
    k1, k2 = jax.random.split(rng)
    return {
        "text": jax.random.randint(k1, (B, T_TEXT), 0, 128),
        "text_lengths": jnp.full((B,), T_TEXT, jnp.int32),
        "mel": jax.random.normal(k2, (B, T_MEL, N_MELS)),
        "mel_lengths": jnp.full((B,), T_MEL, jnp.int32),
        "stop_targets": jnp.zeros((B, T_MEL // r)).at[:, -1].set(1.0),
    }


def bench_tacotron2(mixed_precision=False):
    from tts_tpu.models.tacotron2 import Tacotron2
    from tts_tpu.train.optim import make_optimizer
    from tts_tpu.train.state import create_train_state, make_train_step

    rng = jax.random.PRNGKey(0)
    batch = taco2_batch(rng)
    model = Tacotron2(num_chars=128, r=2)
    tx = make_optimizer(lr=1e-4, grad_clip=5.0)
    state = create_train_state(model, rng, batch, tx)
    step = make_train_step(model, jit=True, mixed_precision=mixed_precision)

    holder = {"state": state}

    def run_one():
        holder["state"], losses = step(holder["state"], batch, rng)
        return losses["loss"]

    t = _time_steps(run_one)
    report("tacotron2_bf16" if mixed_precision else "tacotron2", t)


def bench_glow():
    from tts_tpu.models.glow_tts import GlowTTS, apply_ddi, glow_tts_loss
    from tts_tpu.train.optim import make_optimizer

    import optax

    rng = jax.random.PRNGKey(0)
    batch = taco2_batch(rng, r=2)
    model = GlowTTS(num_chars=128)
    variables = model.init({"params": rng, "dropout": rng},
                           batch["text"], batch["text_lengths"],
                           batch["mel"], batch["mel_lengths"])
    variables = apply_ddi(model, variables, batch, rng)
    params = variables["params"]
    tx = make_optimizer(lr=1e-4, grad_clip=5.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, batch["text"],
                              batch["text_lengths"], batch["mel"],
                              batch["mel_lengths"], rngs={"dropout": rng})
            losses = glow_tts_loss(out, batch["text_lengths"])
            return losses["loss"], losses
        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    holder = {"p": params, "o": opt_state}

    def run_one():
        holder["p"], holder["o"], losses = step(holder["p"], holder["o"],
                                                batch, rng)
        return losses["loss"]

    t = _time_steps(run_one)
    report("glow_tts+MAS", t)


def bench_encoder():
    """Speaker-encoder GE2E step (≙ ref train_encoder.py:91-123): N=8
    speakers x M=4 utters, 1.6 s voice windows at 80 mels (VERDICT r2
    item 9 — the only trainer never benched on TPU)."""
    import optax

    from tts_tpu.losses.ge2e import GE2ELoss
    from tts_tpu.models.speaker_encoder import SpeakerEncoder
    from tts_tpu.train.optim import make_optimizer

    rng = jax.random.PRNGKey(0)
    N, M, T, D = 8, 4, 138, 80            # 1.6 s at hop 256 / 22050 Hz
    mels = jax.random.normal(rng, (N * M, T, D))
    model = SpeakerEncoder(input_dim=D)
    loss_mod = GE2ELoss()
    enc_p = model.init(rng, mels)["params"]
    loss_p = loss_mod.init(rng, jnp.zeros((N, M, model.proj_dim)))["params"]
    params = {"enc": enc_p, "loss": loss_p}
    tx = make_optimizer(lr=1e-4, grad_clip=3.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, mels):
        def loss_fn(p):
            emb = model.apply({"params": p["enc"]}, mels)
            return loss_mod.apply({"params": p["loss"]},
                                  emb.reshape(N, M, -1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    holder = {"p": params, "o": opt_state}

    def run_one():
        holder["p"], holder["o"], loss = step(holder["p"], holder["o"], mels)
        return loss

    t = _time_steps(run_one)
    print(f"speaker_encoder: {t*1e3:8.2f} ms/step  {1/t:6.2f} steps/s  "
          f"({N}x{M} utters, T={T})", flush=True)


def bench_gan(conv_lowering="auto", mixed_precision=False):
    from tts_tpu.models.vocoder.melgan import MelganMultiscaleDiscriminator
    from tts_tpu.models.vocoder.multiband_melgan import \
        MultibandMelganGenerator
    from tts_tpu.train.gan import create_gan_states, make_gan_train_step
    from tts_tpu.train.optim import make_optimizer

    rng = jax.random.PRNGKey(0)
    hop = 256
    seg_frames = 64                       # 16384-sample segments (ref config)
    gan_b = 32
    gen = MultibandMelganGenerator()
    disc = MelganMultiscaleDiscriminator(conv_lowering=conv_lowering)
    batch = {
        "audio": jax.random.normal(rng, (gan_b, seg_frames * hop, 1)) * 0.1,
        "mel": jax.random.normal(rng, (gan_b, seg_frames, N_MELS)),
    }
    sg, sd = create_gan_states(gen, disc, batch, rng,
                               make_optimizer(lr=1e-4),
                               make_optimizer(lr=1e-4))
    step = make_gan_train_step(gen, disc, hop_len=hop, conv_pad=0,
                               train_disc=True, use_pqmf=True,
                               mixed_precision=mixed_precision)
    holder = {"sg": sg, "sd": sd}

    def run_one():
        holder["sg"], holder["sd"], losses = step(holder["sg"], holder["sd"],
                                                  batch, batch, rng)
        return losses["G_loss"]

    t = _time_steps(run_one)
    frames = gan_b * seg_frames
    tag = "gan G+D" if conv_lowering == "auto" else f"gan {conv_lowering}"
    if mixed_precision:
        tag += " bf16"
    print(f"{tag:15s}: {t*1e3:8.2f} ms/step  {1/t:6.2f} steps/s  "
          f"{frames/t:9.0f} mel-frames/s  (B={gan_b}, seg={seg_frames}f)",
          flush=True)


def report(name, t):
    frames = B * T_MEL
    print(f"{name:15s}: {t*1e3:8.2f} ms/step  {1/t:6.2f} steps/s  "
          f"{frames/t:9.0f} mel-frames/s  (B={B}, T_mel={T_MEL})", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "taco2"):
        bench_tacotron2()
    if which in ("all", "taco2_bf16"):
        bench_tacotron2(mixed_precision=True)
    if which in ("all", "glow"):
        bench_glow()
    if which in ("all", "gan"):
        bench_gan()
    if which in ("all", "gan_pallas"):
        bench_gan(conv_lowering="pallas_wgrad")
    if which in ("all", "gan_bf16"):
        bench_gan(mixed_precision=True)
    if which in ("all", "encoder"):
        bench_encoder()
