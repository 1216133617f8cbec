"""Model evaluation CLI: objective quality metrics for a checkpoint.

Turnkey eval harness (VERDICT r1 item 6) so a real-dataset quality run needs
no new code the day the data appears: teacher-forced mel L1 / max-abs-err,
mel-cepstral distortion (MCD), alignment diagonality, and optional
checkpoint-vs-checkpoint output parity (the BASELINE.json metric: mel
max-abs-err, atol 1e-3). ≙ the reference's eval pass + measures
(/root/reference/TTS/bin/train_tts.py:317-476,
/root/reference/TTS/tts/utils/measures.py:1-15).

Usage:
  python -m tts_tpu.bin.eval_model --config_path c.json --checkpoint m.ckpt \
      [--ref_checkpoint other.ckpt] [--num_items 32] [--out metrics.json]
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

import numpy as np


def mel_cepstral_distortion(mel_ref: np.ndarray, mel_hat: np.ndarray,
                            n_coeffs: int = 13) -> float:
    """MCD (dB) over DCT-II cepstra of log-mel frames, coefficients 1..n
    (c0 excluded, standard Kubichek form). Inputs (T, n_mels) in log domain
    or any monotone scale — the DCT is applied directly."""
    from scipy.fft import dct
    c_ref = dct(mel_ref, type=2, axis=-1, norm="ortho")[:, 1:n_coeffs + 1]
    c_hat = dct(mel_hat, type=2, axis=-1, norm="ortho")[:, 1:n_coeffs + 1]
    diff = c_ref - c_hat
    return float((10.0 / np.log(10.0)) * np.mean(
        np.sqrt(2.0 * np.sum(diff * diff, axis=-1))))


def _teacher_forced(model, variables, batch, rng) -> Dict[str, np.ndarray]:
    import jax
    out = model.apply(variables, batch["text"], batch["text_lengths"],
                      batch["mel"], batch["mel_lengths"], train=False,
                      rngs={"dropout": rng}, mutable=False)
    if isinstance(out, tuple):
        out = out[0]
    return jax.tree_util.tree_map(np.asarray, out)


def evaluate(config_path: str, checkpoint: str,
             ref_checkpoint: Optional[str] = None,
             num_items: int = 32, data_path: Optional[str] = None) -> Dict:
    import jax
    import jax.numpy as jnp

    from tts_tpu.audio import AudioProcessor
    from tts_tpu.config import load_config
    from tts_tpu.data import TTSDataset, load_meta_data
    from tts_tpu.models.registry import setup_model
    from tts_tpu.text import num_symbols
    from tts_tpu.train.checkpoint import load_checkpoint
    from tts_tpu.utils.measures import alignment_diagonal_score

    c = load_config(config_path)
    if data_path:
        c["datasets"][0]["path"] = data_path
    ap = AudioProcessor(**c.audio)
    meta_train, meta_eval = load_meta_data(c["datasets"])
    items = (meta_eval or meta_train)[:num_items]
    model = setup_model(num_symbols(c.get("use_phonemes", False)),
                        c.get("num_speakers", 1), c)
    ckpt = load_checkpoint(checkpoint)
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    # checkpoints restore as HOST numpy; without device_put every batch
    # re-uploads the full param tree through the tunnel (~2 s/call on TPU —
    # same trap as Synthesizer.__init__, measured 2026-08-21)
    variables = jax.device_put(variables)
    r = ckpt.get("meta", {}).get("r", c.get("r", 1)) or 1
    if hasattr(model, "r") and model.r != r:
        model = model.clone(r=r)

    ds = TTSDataset(ap, items, outputs_per_step=getattr(model, "r", 1),
                    text_cleaner=c.get("text_cleaner", "english_cleaners"),
                    use_phonemes=c.get("use_phonemes", False),
                    min_seq_len=0, max_seq_len=float("inf"))
    rng = jax.random.PRNGKey(0)

    metrics = {"mel_l1": [], "mel_max_abs_err": [], "mcd": [],
               "alignment_score": [], "n_items": 0}
    parity = []
    ref_variables = None
    if ref_checkpoint:
        ref_ckpt = load_checkpoint(ref_checkpoint)
        ref_variables = {"params": ref_ckpt["params"]}
        if ref_ckpt.get("batch_stats"):
            ref_variables["batch_stats"] = ref_ckpt["batch_stats"]
        ref_variables = jax.device_put(ref_variables)

    for batch in ds.batches(batch_size=min(8, len(items)), shuffle=False):
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k != "item_idxs"}
        out = _teacher_forced(model, variables, jb, rng)
        mel_hat = out.get("postnet_outputs", out.get("model_outputs"))
        if mel_hat is None and "y_mean" in out:
            # flow model: no direct mel prediction in the forward pass —
            # reconstruct by running the MAS-aligned latent means through
            # the inverse flow (GlowTTS.decode_mean)
            from tts_tpu.models.glow_tts import GlowTTS
            mel_hat = np.asarray(model.apply(
                variables, jnp.asarray(out["y_mean"]),
                jnp.asarray(out["y_mask"]), method=GlowTTS.decode_mean))
        mel_ref = np.asarray(jb["mel"])
        lens = np.asarray(jb["mel_lengths"])
        for b in range(mel_ref.shape[0]):
            t = int(lens[b]) // getattr(model, "r", 1) \
                * getattr(model, "r", 1)
            t = min(t, mel_hat.shape[1])  # flow models floor T to num_sqz
            ref_b, hat_b = mel_ref[b, :t], mel_hat[b, :t]
            metrics["mel_l1"].append(float(np.abs(ref_b - hat_b).mean()))
            metrics["mel_max_abs_err"].append(
                float(np.abs(ref_b - hat_b).max()))
            metrics["mcd"].append(mel_cepstral_distortion(ref_b, hat_b))
            metrics["n_items"] += 1
        if "alignments" in out:
            # score each item over its VALID decoder steps only: with real
            # (bucketless) length spreads, padded steps carry garbage
            # attention and dilute the batch-mean score (measured round 5:
            # 0.27 batch-padded vs valid-sliced on the same taco2
            # checkpoint with ga_loss 4e-5). Also record the two properties
            # that directly witness a LEARNED alignment independent of
            # softmax sharpness: argmax-path monotonicity and text coverage
            # (a diffuse-but-correct attention scores low on per-step max
            # while walking the full text monotonically).
            al = np.asarray(out["alignments"])
            tlens = np.asarray(jb["text_lengths"])
            r_model = getattr(model, "r", 1)
            for b in range(al.shape[0]):
                steps_valid = max(int(lens[b]) // r_model, 1)
                a = al[b, :steps_valid, :max(int(tlens[b]), 1)]
                metrics["alignment_score"].append(
                    alignment_diagonal_score(a[None]))
                arg = a.argmax(-1)
                mono = float((np.diff(arg) >= 0).mean()) if len(arg) > 1 \
                    else 1.0
                metrics.setdefault("attn_monotonicity", []).append(mono)
                metrics.setdefault("attn_coverage", []).append(
                    float((arg.max() - arg.min() + 1) / a.shape[1]))
        if ref_variables is not None:
            ref_out = _teacher_forced(model, ref_variables, jb, rng)
            ref_mel = ref_out.get("postnet_outputs",
                                  ref_out.get("model_outputs"))
            parity.append(float(np.abs(ref_mel - mel_hat).max()))

    result = {
        "checkpoint": checkpoint,
        "n_items": metrics["n_items"],
        "mel_l1": float(np.mean(metrics["mel_l1"])),
        "mel_max_abs_err": float(np.max(metrics["mel_max_abs_err"])),
        "mcd_db": float(np.mean(metrics["mcd"])),
        "alignment_diagonal_score":
            float(np.mean(metrics["alignment_score"]))
            if metrics["alignment_score"] else None,
    }
    for k in ("attn_monotonicity", "attn_coverage"):
        if metrics.get(k):
            result[k] = float(np.mean(metrics[k]))
    if parity:
        result["vs_ref_max_abs_diff"] = float(np.max(parity))
        result["vs_ref_allclose_1e3"] = bool(np.max(parity) <= 1e-3)
    return result


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--ref_checkpoint", default=None,
                        help="second checkpoint for output-parity comparison")
    parser.add_argument("--data_path", default=None)
    parser.add_argument("--num_items", type=int, default=32)
    parser.add_argument("--out", default=None, help="write metrics JSON here")
    args = parser.parse_args(argv)

    result = evaluate(args.config_path, args.checkpoint,
                      ref_checkpoint=args.ref_checkpoint,
                      num_items=args.num_items, data_path=args.data_path)
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
