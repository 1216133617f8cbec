"""Cold-start breakdown: where do the ~73 s (warm persistent cache) go?

Run as a FRESH process (the whole point). Stages timed:
  imports (jax/flax) -> device init (first backend touch) -> tts_tpu imports
  -> Synthesizer load (checkpoint read + device_put) -> first request
  (compile or persistent-cache hit) -> second request (steady state).

Needs the model pair from bench_single_stream.build_models() in
/tmp/rtf_model (run that first if missing).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
MODEL_DIR = "/tmp/rtf_model"

t0 = time.perf_counter()


def mark(name):
    print(f"{name:28s}: {time.perf_counter() - t0:7.1f} s cumulative",
          flush=True)


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
mark("import jax")

jax.devices()
mark("device init (jax.devices)")

from tts_tpu.infer.synthesizer import Synthesizer  # noqa: E402

mark("import tts_tpu.Synthesizer")

if not os.path.exists(os.path.join(MODEL_DIR, "checkpoint_1.ckpt")):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from bench_single_stream import build_models
    build_models()
    mark("(built models first)")

syn = Synthesizer(
    os.path.join(MODEL_DIR, "checkpoint_1.ckpt"),
    os.path.join(MODEL_DIR, "config.json"),
    os.path.join(MODEL_DIR, "vocoder", "checkpoint_1.ckpt"),
    os.path.join(MODEL_DIR, "vocoder", "config.json"))
mark("Synthesizer load")

wav = syn.tts("The quick brown fox jumps over the lazy dog.")
mark("first request")

wav = syn.tts("The quick brown fox jumps over the lazy dog.")
mark("second request")
print(f"audio samples: {len(wav)}")
