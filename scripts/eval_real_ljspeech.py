"""Objective quality metrics for the real-LJSpeech-trained checkpoints
(companion to scripts/train_real_ljspeech.py): runs bin/eval_model.evaluate()
over the saved checkpoint series and reports, per checkpoint,

- held-out metrics (the 1-utterance eval split load_meta_data carves out):
  teacher-forced mel L1 / max-abs-err / MCD / alignment diagonal score;
- corpus metrics (all 32 utterances via a meta_file_val override): the
  overfit-evidence view of the same metrics.

≙ the reference's eval pass on its bundled-LJSpeech CI run
(/root/reference/TTS/bin/train_tts.py:317-476). Defaults to CPU — eval is
forward-only; keep the TPU free for training jobs.

Usage:
  python scripts/eval_real_ljspeech.py --run_dir runs_real/taco2_real_lj \
      [--out EVAL_REAL_LJSPEECH.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default="cpu")
    p.add_argument("--checkpoints", default=None,
                   help="comma-separated steps (default: all saved)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tts_tpu.bin.eval_model import evaluate

    config_path = os.path.join(args.run_dir, "config.json")
    with open(config_path) as f:
        config = json.load(f)

    ckpts = sorted(
        glob.glob(os.path.join(args.run_dir, "checkpoint_*.ckpt")),
        key=lambda p: int(re.search(r"_(\d+)\.ckpt$", p).group(1)))
    ckpts = [c for c in ckpts if "disc" not in os.path.basename(c)]
    if args.checkpoints:
        want = {int(s) for s in args.checkpoints.split(",")}
        ckpts = [c for c in ckpts
                 if int(re.search(r"_(\d+)\.ckpt$", c).group(1)) in want]

    # corpus-view config: meta_file_val = the full metadata.csv so evaluate()
    # scores every utterance (mostly train items -> overfit evidence)
    corpus_cfg = dict(config)
    corpus_cfg["datasets"] = [dict(config["datasets"][0],
                                   meta_file_val="metadata.csv")]
    corpus_cfg_path = os.path.join(args.run_dir, "config_eval_corpus.json")
    with open(corpus_cfg_path, "w") as f:
        json.dump(corpus_cfg, f)

    results = []
    for ckpt in ckpts:
        step = int(re.search(r"_(\d+)\.ckpt$", ckpt).group(1))
        held = evaluate(config_path, ckpt, num_items=8)
        corpus = evaluate(corpus_cfg_path, ckpt, num_items=32)
        keys = ("n_items", "mel_l1", "mel_max_abs_err", "mcd_db",
                "alignment_diagonal_score", "attn_monotonicity",
                "attn_coverage")
        row = {"step": step,
               "heldout": {k: held[k] for k in keys if k in held},
               "corpus": {k: corpus[k] for k in keys if k in corpus}}
        results.append(row)
        print(json.dumps(row))

    out = {"run_dir": args.run_dir, "model": config.get("model", "glow_tts"),
           "results": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f" | > wrote {args.out}")
    return out


if __name__ == "__main__":
    main()
