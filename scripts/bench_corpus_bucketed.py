"""Length-bucketed batched corpus serving: the claw-back measurement.

CLAUDE.md's un-pinned corpus record (16.2k audio-s/s with the learned
duration head) showed real trained speech rate ~4 frames/char fills only
~54% of the fixed 248-frame budget — the uncounted padding frames cost
real compute. The production fix (already shipped for single-stream in
Synthesizer._vocode's 32-frame mel buckets) is to bucket the BATCH
pipeline's t_mel by predicted length. This script measures that claw-back
at B=128 corpus serving:

  fixed:    every item pays the full --fixed_t_mel frame budget;
  bucketed: items are routed (host-side, exact under the duration pin:
            y_len = ceil(rate*text_len/2)*2) to the smallest compiled
            (B_bucket, t_bucket) pipeline that fits them.

The duration head is pinned to --rate frames/char (default 4 — the
measured real-LJSpeech trained rate, silence-trimmed; CLAUDE.md). With a
trained checkpoint the routing pass would be the ~3.5 ms encoder+duration
stage; under the pin it is algebraic, which times the same downstream
pipelines. Audio seconds are counted over VALID frames only in BOTH
variants, same as BENCH_PIPELINE=corpus.

Run on the chip:  python scripts/bench_corpus_bucketed.py
CPU smoke:        python scripts/bench_corpus_bucketed.py --platform cpu \
                      --batch 16 --iters 1 --reps 1
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SR, HOP = 22050, 256


def build_glow(rate: float, rng):
    from flax.core import unfreeze

    from tts_tpu.models.glow_tts import GlowTTS
    from tts_tpu.text import num_symbols

    glow = GlowTTS(num_chars=num_symbols(False), mas_impl="jnp")
    gv = glow.init({"params": rng, "dropout": rng, "noise": rng},
                   jnp.zeros((2, 8), jnp.int32), jnp.full((2,), 8, jnp.int32),
                   jnp.zeros((2, 16, 80)), jnp.full((2,), 16, jnp.int32),
                   train=False)
    # pin: ceil(expm1(log(rate+0.5))) == rate ROBUSTLY; log(rate+1) realizes rate+1 on TPU (its expm1 rounds a hair high: expm1(log(5)) = 4.0001 there)
    gv = unfreeze(gv)
    dp = gv["params"]["encoder"]["duration_predictor"]["proj"]
    dp["kernel"] = jnp.zeros_like(dp["kernel"])
    dp["bias"] = jnp.full_like(dp["bias"], jnp.log(rate + 0.5))
    return glow, gv


def build_pipeline(glow, seqs, t_text, t_mel, rng):
    """One compiled (B, t_text, t_mel) Glow + megakernel pipeline over the
    given item list; returns (fn, static_args)."""
    from bench import build_vocoder
    from tts_tpu.ops.pallas.fused_melgan import megakernel_generator_apply

    batch = len(seqs)
    text_np = np.zeros((batch, t_text), np.int32)
    len_np = np.zeros((batch,), np.int32)
    for i, s in enumerate(seqs):
        text_np[i, :len(s)] = s
        len_np[i] = len(s)
    text, text_len = jnp.asarray(text_np), jnp.asarray(len_np)
    voc_plain, voc_packed = build_vocoder(t_mel, rng)

    interp = jax.default_backend() != "tpu"  # CPU smoke: interpret kernel

    @jax.jit
    def synthesize(gvars, voc_packed, text, text_len):
        out = glow.apply(gvars, text, text_len, noise_scale=0.33,
                         y_max_length=t_mel,
                         rngs={"noise": jax.random.PRNGKey(1)},
                         method=glow.__class__.inference)
        mel = out["model_outputs"].astype(jnp.float32)
        wav = megakernel_generator_apply(voc_plain, voc_packed, mel,
                                         interpret=interp)
        valid_samples = jnp.sum(out["mel_lengths"]) * HOP
        return valid_samples, wav.sum()

    return synthesize, (voc_packed, text, text_len)


def time_variant(fns_args, gv, iters, reps):
    """Median-of-reps wall time for one pass over every pipeline in the
    variant; fence by fetching every pipeline's checksum (block_until_ready
    does not fence through the axon tunnel — CLAUDE.md)."""
    sums = [fn(gv, *args)[1] for fn, args in fns_args]  # compile + warm
    for s in sums:
        float(s)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            sums = [fn(gv, *args)[1] for fn, args in fns_args]
        for s in sums:
            float(s)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    dt = times[len(times) // 2] if reps % 2 else (
        times[reps // 2 - 1] + times[reps // 2]) / 2
    spread = 100.0 * (times[-1] - times[0]) / dt
    valid = sum(int(fn(gv, *args)[0]) for fn, args in fns_args)
    return dt, spread, valid / SR


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rate", type=float, default=4.0,
                   help="pinned frames/char (4 = measured trained rate)")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--t_text", type=int, default=64)
    p.add_argument("--fixed_t_mel", type=int, default=248)
    p.add_argument("--buckets", default="96,168",
                   help="comma list of bucketed t_mel budgets (ascending)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from bench import CORPUS
    from tts_tpu.infer.synthesis import text_to_seqvec

    cfg = {"use_phonemes": False, "text_cleaner": "english_cleaners"}
    base = [text_to_seqvec(s, cfg) for s in CORPUS]
    seqs = [base[i % len(base)] for i in range(args.batch)]
    assert max(len(s) for s in seqs) <= args.t_text

    buckets = sorted(int(b) for b in args.buckets.split(","))
    rng = jax.random.PRNGKey(0)
    glow, gv = build_glow(args.rate, rng)
    gv = jax.device_put(gv)

    # host-side routing (exact under the pin; trained ckpts would run the
    # encoder+duration stage here instead)
    def pred_len(s):
        return int(math.ceil(args.rate * len(s) / 2.0) * 2)

    groups = {b: [] for b in buckets}
    for s in seqs:
        fit = [b for b in buckets if b >= pred_len(s)]
        assert fit, (f"item with predicted length {pred_len(s)} exceeds the "
                     f"largest bucket {buckets[-1]}")
        groups[fit[0]].append(s)

    t0 = time.perf_counter()
    fixed = [build_pipeline(glow, seqs, args.t_text, args.fixed_t_mel, rng)]
    dt_f, sp_f, audio_f = time_variant(fixed, gv, args.iters, args.reps)
    print(f"fixed t_mel={args.fixed_t_mel}: {audio_f / dt_f:,.0f} audio-s/s "
          f"({dt_f * 1e3:.2f} ms/pass, spread {sp_f:.1f}%, "
          f"compile+run {time.perf_counter() - t0:.0f}s)", flush=True)

    t0 = time.perf_counter()
    bucketed = [build_pipeline(glow, g, args.t_text, b, rng)
                for b, g in groups.items() if g]
    sizes = {b: len(g) for b, g in groups.items() if g}
    dt_b, sp_b, audio_b = time_variant(bucketed, gv, args.iters, args.reps)
    print(f"bucketed {sizes}: {audio_b / dt_b:,.0f} audio-s/s "
          f"({dt_b * 1e3:.2f} ms/pass, spread {sp_b:.1f}%, "
          f"compile+run {time.perf_counter() - t0:.0f}s)", flush=True)

    print(json.dumps({
        "metric": "corpus_bucketed_audio_s_per_s",
        "rate_frames_per_char": args.rate,
        "fixed": round(audio_f / dt_f, 1),
        "bucketed": round(audio_b / dt_b, 1),
        "clawback_x": round((audio_b / dt_b) / (audio_f / dt_f), 3),
        "buckets": sizes,
        "spread_pct": [round(sp_f, 1), round(sp_b, 1)],
    }))


if __name__ == "__main__":
    main()
