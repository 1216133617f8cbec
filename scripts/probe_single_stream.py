"""Stage breakdown of one warm single-stream request (VERDICT r2 item 1).

bench_single_stream.py measured steady 2345 ms/request (RTF 0.70) — ~100x
the expected device compute. Time each stage of Synthesizer.tts to find
where the 2.3 s lives: text frontend, jitted taco2 inference dispatch +
fetch, vocoder dispatch + fetch, host numpy.

Usage: python scripts/probe_single_stream.py   (after bench_single_stream.py
has built /tmp/rtf_model; builds it otherwise)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODEL_DIR = "/tmp/rtf_model"
SENTENCE = ("The quick brown fox jumps over the lazy dog, "
            "and the rain in Spain stays mainly in the plain.")


def main():
    from tts_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from bench_single_stream import build_models
    ckpt, cfg, vckpt, vcfg = build_models()

    from tts_tpu.infer.synthesis import (bucket_text_length, run_model,
                                         text_to_seqvec)
    from tts_tpu.infer.synthesizer import Synthesizer
    synth = Synthesizer(ckpt, cfg, vckpt, vcfg)
    synth.tts(SENTENCE)  # warm everything
    synth.tts(SENTENCE)

    # 1. text frontend
    t0 = time.perf_counter()
    for _ in range(5):
        seq = text_to_seqvec(SENTENCE, synth.tts_config)
    t_text = (time.perf_counter() - t0) / 5
    print(f"text frontend        : {t_text*1e3:8.1f} ms ({len(seq)} symbols)")

    n = len(seq)
    b = bucket_text_length(n)
    seq_p = np.pad(seq, (0, b - n))
    inputs = jnp.asarray(seq_p)[None]
    tl = jnp.asarray([n], jnp.int32)

    # 2. taco2 inference: dispatch+fetch (what synthesis() does: pulls
    #    postnet_outputs, mel_lengths, alignments to host)
    def model_call():
        return run_model(synth.model, synth.variables, inputs,
                         synth.tts_config, text_lengths=tl)
    out = model_call()
    t0 = time.perf_counter()
    for _ in range(5):
        out = model_call()
        np.asarray(out["postnet_outputs"])
        np.asarray(out["mel_lengths"])
        np.asarray(out["alignments"])
    t_model = (time.perf_counter() - t0) / 5
    print(f"taco2 jit + 3 fetches: {t_model*1e3:8.1f} ms")

    # 2b. dispatch + single scalar fetch only (isolates fetch RTT count)
    t0 = time.perf_counter()
    for _ in range(5):
        out = model_call()
        float(out["postnet_outputs"].sum())
    t_model1 = (time.perf_counter() - t0) / 5
    print(f"taco2 jit + 1 fetch  : {t_model1*1e3:8.1f} ms")

    # 3. vocoder on the real mel
    mel = np.asarray(out["postnet_outputs"])[0]
    n_valid = int(np.asarray(out["mel_lengths"])[0])
    if n_valid > 0:
        mel = mel[:n_valid]
    print(f"mel frames           : {mel.shape[0]}")
    synth._vocode(mel)
    t0 = time.perf_counter()
    for _ in range(5):
        wav = synth._vocode(mel)
    t_voc = (time.perf_counter() - t0) / 5
    print(f"vocoder (_vocode)    : {t_voc*1e3:8.1f} ms")

    # 4. full request for reference
    t0 = time.perf_counter()
    for _ in range(3):
        synth.tts(SENTENCE)
    t_full = (time.perf_counter() - t0) / 3
    print(f"full tts()           : {t_full*1e3:8.1f} ms")
    print(f"unaccounted          : "
          f"{(t_full - t_text - t_model - t_voc)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
