"""Assemble EVAL_REAL_LJSPEECH.json — the committed evidence artifact for the
real-LJSpeech training runs (VERDICT r4 item 1).

Inputs: the runs_real/ directory produced by scripts/train_real_ljspeech.py
(+ its *_train.log files) and the per-model eval JSONs produced by
scripts/eval_real_ljspeech.py. Output: one JSON at the repo root that
tests/test_real_ljspeech_results.py asserts thresholds over.

Usage:
  python scripts/collect_real_lj_evidence.py \
      --taco2 /tmp/eval_taco2.json --glow /tmp/eval_glow.json \
      [--runs runs_real] [--out EVAL_REAL_LJSPEECH.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def final_avg(log_path: str, key: str):
    """Last `| > avg_<key>: <float>` value in a trainer console log."""
    if not os.path.exists(log_path):
        return None
    val = None
    pat = re.compile(rf"avg_{re.escape(key)}: (-?\d+\.\d+)")
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                val = float(m.group(1))
    return val


def series(log_path: str, key: str):
    if not os.path.exists(log_path):
        return []
    pat = re.compile(rf"avg_{re.escape(key)}: (-?\d+\.\d+)")
    out = []
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                out.append(float(m.group(1)))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--taco2", required=True, help="eval JSON for tacotron2")
    p.add_argument("--taco2_fa", default=None,
                   help="eval JSON for the forward-attention continuation; "
                        "rows are appended to the tacotron2 series with a "
                        "forward_attn marker")
    p.add_argument("--glow", required=True, help="eval JSON for glow")
    p.add_argument("--runs", default=os.path.join(REPO, "runs_real"))
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "EVAL_REAL_LJSPEECH.json"))
    args = p.parse_args(argv)

    with open(args.taco2) as f:
        taco2 = json.load(f)
    with open(args.glow) as f:
        glow = json.load(f)
    if args.taco2_fa:
        with open(args.taco2_fa) as f:
            fa = json.load(f)
        for row in fa["results"]:
            row["forward_attn"] = True
        taco2["results"].extend(fa["results"])
        taco2["forward_attn_continuation"] = fa["run_dir"]

    glow["dur_loss_final"] = final_avg(
        os.path.join(args.runs, "glow_train.log"), "loss_dur")
    glow["log_mle_final"] = final_avg(
        os.path.join(args.runs, "glow_train.log"), "log_mle")
    taco2["ga_loss_final"] = final_avg(
        os.path.join(args.runs, "taco2_train.log"), "ga_loss")

    out = {
        "corpus": "/root/reference/tests/data/ljspeech (32 real clips, "
                  "222 s — the reference CI's own training data)",
        "tacotron2": taco2,
        "glow_tts": glow,
    }

    for key, name in (("gan", "gan_train.log"),
                      ("gan_d5_reduced_taps", "gan_d5_train.log")):
        gan_log = os.path.join(args.runs, name)
        if os.path.exists(gan_log):
            g_losses = series(gan_log, "G_loss")
            out[key] = {
                "G_loss_first": g_losses[0] if g_losses else None,
                "G_loss_final": g_losses[-1] if g_losses else None,
                "D_loss_final": final_avg(gan_log, "D_loss"),
                "stft_mag_final": final_avg(gan_log, "G_stft_loss_mag"),
            }

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f" | > wrote {args.out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
