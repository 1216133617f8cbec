"""Per-bucket FULL-batch corpus serving (the production bucketing form).

bench_corpus_bucketed.py measured the single-pass mixed split — partition
one 128-item batch into per-bucket sub-batches — as a NEGATIVE (18.4k vs
fixed 20.8k at rate 4): the (112, t192) + (16, t96) pair loses more to
sublane padding and per-dispatch tunnel overhead than the shorter frame
budgets save. A production server instead fills FULL 128-item batches per
bucket shape from the request queue. This script measures that: each
bucket pipeline runs at B=128 with items of its own class, and corpus
throughput is the mixture-weighted aggregate

    sum_b n_b/128 * audio_b  /  sum_b n_b/128 * dt_b

where n_b is the bucket's item count in a 128-item corpus draw.

Imports build_pipeline/build_glow from bench_corpus_bucketed UNCHANGED so
the fixed-(128,248) compile cache entry from that script is reused
(persistent-cache keys hash source locations — CLAUDE.md).
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

SR = 22050


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rate", type=float, default=4.0)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--t_text", type=int, default=64)
    p.add_argument("--fixed_t_mel", type=int, default=248)
    p.add_argument("--buckets", default="96,168")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from bench import CORPUS
    from bench_corpus_bucketed import build_glow, build_pipeline, time_variant
    from tts_tpu.infer.synthesis import text_to_seqvec

    cfg = {"use_phonemes": False, "text_cleaner": "english_cleaners"}
    base = [text_to_seqvec(s, cfg) for s in CORPUS]
    seqs = [base[i % len(base)] for i in range(args.batch)]
    buckets = sorted(int(b) for b in args.buckets.split(","))

    rng = jax.random.PRNGKey(0)
    glow, gv = build_glow(args.rate, rng)
    gv = jax.device_put(gv)

    def pred_len(s):
        return int(math.ceil(args.rate * len(s) / 2.0) * 2)

    groups = {b: [] for b in buckets}
    for s in seqs:
        fit = [b for b in buckets if b >= pred_len(s)]
        assert fit, f"predicted length {pred_len(s)} exceeds {buckets[-1]}"
        groups[fit[0]].append(s)

    # fixed baseline (cache hit if bench_corpus_bucketed ran on this machine)
    t0 = time.perf_counter()
    fixed = [build_pipeline(glow, seqs, args.t_text, args.fixed_t_mel, rng)]
    dt_f, sp_f, audio_f = time_variant(fixed, gv, args.iters, args.reps)
    print(f"fixed t_mel={args.fixed_t_mel}: {audio_f / dt_f:,.0f} audio-s/s "
          f"({dt_f * 1e3:.2f} ms/pass, spread {sp_f:.1f}%, "
          f"compile+run {time.perf_counter() - t0:.0f}s)", flush=True)

    # per-bucket full batches: replicate the bucket's items to B
    agg_audio = agg_dt = 0.0
    detail = {}
    for b, g in groups.items():
        if not g:
            continue
        full = [g[i % len(g)] for i in range(args.batch)]
        t0 = time.perf_counter()
        pipe = [build_pipeline(glow, full, args.t_text, b, rng)]
        dt_b, sp_b, audio_b = time_variant(pipe, gv, args.iters, args.reps)
        frac = len(g) / args.batch
        agg_audio += frac * audio_b
        agg_dt += frac * dt_b
        detail[b] = {"n": len(g), "ms": round(dt_b * 1e3, 2),
                     "audio_s": round(audio_b, 2),
                     "tput": round(audio_b / dt_b, 1),
                     "spread_pct": round(sp_b, 1)}
        print(f"bucket t_mel={b} (n={len(g)}, full B={args.batch}): "
              f"{audio_b / dt_b:,.0f} audio-s/s ({dt_b * 1e3:.2f} ms/pass, "
              f"spread {sp_b:.1f}%, compile+run "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)

    tput_bucketed = agg_audio / agg_dt
    print(json.dumps({
        "metric": "corpus_bucketed_full_audio_s_per_s",
        "rate_frames_per_char": args.rate,
        "fixed": round(audio_f / dt_f, 1),
        "bucketed_full": round(tput_bucketed, 1),
        "clawback_x": round(tput_bucketed / (audio_f / dt_f), 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
