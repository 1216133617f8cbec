"""Benchmark: synthesized audio-seconds per second per chip (mel + vocoder).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The pipeline measured is the flagship serving path: batched Glow-TTS
parallel inverse-flow mel decode -> Multiband-MelGAN vocoder (weight norm
folded at load, whole-generator Pallas megakernel with in-kernel PQMF
synthesis) -> waveform, jitted on one chip. The parallel flow decode beats
the Tacotron2 autoregressive scan at batch 128 (29.7k vs 25.4k audio-s/s
measured 2026-08-19); set BENCH_PIPELINE=taco2 for the autoregressive
pipeline. The reference publishes no numbers (BASELINE.md); its implicit
production bar is real-time (RTF=1.0) single-stream synthesis, so
vs_baseline = audio_seconds_per_second / 1.0.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the heavy XLA compiles (minutes for the
# vocoder graph) are reused across bench invocations on this machine
jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

SR = 22050
HOP = 256


def build_vocoder(t_mel, rng):
    """Multiband-MelGAN, weight norm folded into plain kernels, packed for
    the whole-generator Pallas megakernel with in-kernel PQMF synthesis."""
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
    from tts_tpu.ops.pallas.fused_melgan import pack_generator_params

    voc = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    voc_vars = voc.init(rng, jnp.zeros((2, t_mel, 80)))
    voc_params = fold_weight_norm(voc_vars["params"])
    voc_plain = voc.clone(use_weight_norm=False)
    voc_packed = pack_generator_params(voc_plain, voc_params, fuse_pqmf=True)
    return voc_plain, voc_packed


def build_glow_pipeline(batch=128, t_text=128, t_mel=248):
    """Flagship: Glow-TTS parallel inverse-flow decode + vocoder megakernel.
    Geometry matches the Tacotron2 pipeline (248 mel frames, text len 128)."""
    from tts_tpu.models.glow_tts import GlowTTS
    from tts_tpu.ops.pallas.fused_melgan import megakernel_generator_apply

    rng = jax.random.PRNGKey(0)
    glow = GlowTTS(num_chars=128, mas_impl="jnp")
    text = jax.random.randint(rng, (batch, t_text), 1, 128)
    text_len = jnp.full((batch,), t_text, jnp.int32)
    gv = glow.init({"params": rng, "dropout": rng, "noise": rng},
                   text[:2], text_len[:2], jnp.zeros((2, t_mel, 80)),
                   jnp.full((2,), t_mel, jnp.int32), train=False)
    voc_plain, voc_packed = build_vocoder(t_mel, rng)

    @jax.jit
    def synthesize(gvars, voc_packed, text, text_len):
        out = glow.apply(gvars, text, text_len, noise_scale=0.33,
                         y_max_length=t_mel,
                         rngs={"noise": jax.random.PRNGKey(1)},
                         method=GlowTTS.inference)
        mel = out["model_outputs"].astype(jnp.float32)
        wav = megakernel_generator_apply(voc_plain, voc_packed, mel)
        return wav.shape[1], wav.sum()

    return synthesize, (gv, voc_packed, text, text_len)


def build_pipeline(batch=64, t_text=128, steps=124, r=2):
    from tts_tpu.models.tacotron2 import Tacotron2

    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(num_chars=128, r=r)
    text = jax.random.randint(rng, (batch, t_text), 0, 128)
    text_len = jnp.full((batch,), t_text, jnp.int32)
    mel0 = jnp.zeros((2, steps * r, 80))
    mel_len = jnp.full((2,), steps * r, jnp.int32)
    taco_vars = taco.init({"params": rng, "dropout": rng}, text[:2],
                          text_len[:2], mel0, mel_len)
    from tts_tpu.ops.pallas.fused_taco2_decode import pack_decoder_params
    packed = pack_decoder_params(taco_vars["params"], t_in=t_text)

    from tts_tpu.infer.fast_decode import taco2_fused_inference
    from tts_tpu.ops.pallas.fused_melgan import megakernel_generator_apply
    voc_plain, voc_packed = build_vocoder(steps * r, rng)

    @jax.jit
    def synthesize(taco_vars, packed, voc_packed, text, text_len):
        # Pallas whole-decode kernel (bf16, weights VMEM-resident) + fused
        # BiLSTM encoder; numerics match the flax scan decode at eval
        out = taco2_fused_inference(taco, taco_vars, text, text_len,
                                    max_decoder_steps=steps, packed=packed)
        mel = out["postnet_outputs"].astype(jnp.float32)
        # whole-generator Pallas megakernel (one kernel: proj/upsamples/
        # stacks/PQMF synthesis, VMEM-resident) -> waveform
        wav = megakernel_generator_apply(voc_plain, voc_packed, mel)
        # scalar checksum: fetched once after the loop; forces full
        # materialization while letting tunnel RTT amortize out
        return wav.shape[1], wav.sum()

    return synthesize, (taco_vars, packed, voc_packed, text, text_len)


# Real sentences for BENCH_PIPELINE=corpus: varied lengths, run through the
# actual text frontend. Kept <=41 symbols so predicted durations (6 frames
# per symbol — the duration-bias pin log(7) below, expm1 -> 6, matching the
# LJSpeech speech rate of ~86 frames/s at ~14 chars/s) fit the 248-frame
# budget without tail truncation: 41*6 = 246 <= 248.
CORPUS = [
    "A birch canoe slid on the smooth planks.",
    "Glue the sheet to the dark blue paper.",
    "It's easy to tell the depth of a well.",
    "These days a chicken leg is a rare dish.",
    "Rice is often served in round bowls.",
    "The juice of lemons makes fine punch.",
    "The box was thrown beside the truck.",
    "Take the winding path.",
    "Four hours of steady work faced us.",
    "Large size in stockings is hard to sell.",
    "The boy was there when the sun rose.",
    "Hold the hammer near the end.",
    "The source of the huge river is clear.",
    "He ran half way.",
    "Help the woman get back to her feet.",
    "A pot of tea helps to pass the evening.",
]


def build_glow_corpus_pipeline(batch=128, t_text=64, t_mel=248):
    """Honest serving workload: real sentences through the text frontend,
    per-item text lengths, stop behavior == predicted durations, and audio
    accounted over VALID frames only (padding is not counted). This is the
    number a user gets for length-realistic batches; the default fixed-shape
    pipeline is the FLOP-utilization ceiling."""
    import numpy as np

    from tts_tpu.infer.synthesis import text_to_seqvec
    from tts_tpu.models.glow_tts import GlowTTS
    from tts_tpu.ops.pallas.fused_melgan import megakernel_generator_apply
    from tts_tpu.text import num_symbols

    rng = jax.random.PRNGKey(0)
    cfg = {"use_phonemes": False, "text_cleaner": "english_cleaners"}
    seqs = [text_to_seqvec(s, cfg) for s in CORPUS]
    assert max(len(s) for s in seqs) <= t_text
    text_np = np.zeros((batch, t_text), np.int32)
    len_np = np.zeros((batch,), np.int32)
    for i in range(batch):
        s = seqs[i % len(seqs)]
        text_np[i, :len(s)] = s
        len_np[i] = len(s)
    text, text_len = jnp.asarray(text_np), jnp.asarray(len_np)

    glow = GlowTTS(num_chars=num_symbols(False), mas_impl="jnp")
    gv = glow.init({"params": rng, "dropout": rng, "noise": rng},
                   text[:2], text_len[:2], jnp.zeros((2, t_mel, 80)),
                   jnp.full((2,), t_mel, jnp.int32), train=False)
    ckpt = os.environ.get("BENCH_GLOW_CKPT")
    if ckpt:
        # params trained on the real LJSpeech clips (scripts/
        # train_real_ljspeech.py --model glow): the LEARNED duration head on
        # real encoder states drives the workload shape instead of the
        # 6-frames/symbol pin below (VERDICT r4 item 2); tree geometry is
        # identical to this build (verified round 5)
        from tts_tpu.train.checkpoint import load_checkpoint
        # device_put: checkpoints restore as HOST numpy; without it every
        # jitted call re-uploads the params through the tunnel (measured:
        # 71 audio-s/s instead of ~15k — the CLAUDE.md serving trap)
        gv = jax.device_put({"params": load_checkpoint(ckpt)["params"]})
    else:
        # random-init durations are degenerate (expm1 of ~0 -> 0-2 frames);
        # pin the duration head to exactly 6 frames/char — the LJSpeech
        # speech rate (86 frames/s at ~14 chars/s) — so lengths match a
        # trained model
        from flax.core import unfreeze
        gv = unfreeze(gv)
        dp = gv["params"]["encoder"]["duration_predictor"]["proj"]
        dp["kernel"] = jnp.zeros_like(dp["kernel"])
        dp["bias"] = jnp.full_like(dp["bias"], jnp.log(6.5))  # ceil(expm1) -> 6; log(7.0) realizes 7 on TPU (expm1(log(7)) = 6.00001 there, ceil bumps it — measured 2026-08-22), truncating 41-char items at the 248 clip
    voc_plain, voc_packed = build_vocoder(t_mel, rng)

    @jax.jit
    def synthesize(gvars, voc_packed, text, text_len):
        out = glow.apply(gvars, text, text_len, noise_scale=0.33,
                         y_max_length=t_mel,
                         rngs={"noise": jax.random.PRNGKey(1)},
                         method=GlowTTS.inference)
        mel = out["model_outputs"].astype(jnp.float32)
        wav = megakernel_generator_apply(voc_plain, voc_packed, mel)
        valid_samples = jnp.sum(out["mel_lengths"]) * HOP
        return valid_samples, wav.sum()

    return synthesize, (gv, voc_packed, text, text_len)


def main():
    # batch 64 balances throughput with XLA compile time (the bench must
    # finish within the driver's budget; batch 128 compiles ~2x longer for
    # ~+30% throughput)
    # batch 128 fills the MXU's 128 sublane rows: the Pallas whole-decode
    # kernel's per-step time is ~flat from 64 -> 128 (64 rows pad to half
    # tiles), so decode cost per audio-second nearly halves. Measured:
    # 21.1k audio-s/s @64 -> 24.7k @128; compile (persistent-cached) fits
    # the driver budget.
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps, r = 124, 2
    pipeline = os.environ.get("BENCH_PIPELINE", "glow")
    if pipeline == "corpus":
        # real sentences, per-item lengths, padding NOT counted as audio
        fn, args = build_glow_corpus_pipeline(batch=batch, t_mel=steps * r)
    elif pipeline == "glow":
        fn, args = build_glow_pipeline(batch=batch, t_mel=steps * r)
    else:
        fn, args = build_pipeline(batch=batch, steps=steps, r=r)
    n_samples, s = fn(*args)
    float(s)  # compile + sync
    # NOTE: on this setup block_until_ready does not synchronize through the
    # device tunnel; fetching a scalar is the only reliable fence. We enqueue
    # `iters` executions and fence once at the end.
    #
    # Variance methodology (round 4): one timed loop is a single sample of a
    # noisy tunnel + chip; we take `reps` independent timed loops and report
    # the MEDIAN, with the spread (max-min over reps, as % of median) in the
    # JSON line so run-to-run drift questions are answerable. Measured
    # spread on this machine is ~3-12% (CLAUDE.md).
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            n_samples, s = fn(*args)
        float(s)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    dt = times[len(times) // 2] if reps % 2 else (
        times[reps // 2 - 1] + times[reps // 2]) / 2
    spread_pct = 100.0 * (times[-1] - times[0]) / dt

    if pipeline == "corpus":
        # n_samples is already the batch total of VALID samples
        audio_seconds = int(n_samples) / SR
    else:
        audio_seconds = batch * int(n_samples) / SR
    throughput = audio_seconds / dt
    print(json.dumps({
        "metric": "synthesized_audio_seconds_per_s_per_chip",
        "value": round(float(throughput), 3),
        "unit": "audio_s/s",
        "vs_baseline": round(float(throughput) / 1.0, 3),
        "reps": reps,
        "spread_pct": round(spread_pct, 2),
    }))


if __name__ == "__main__":
    main()
