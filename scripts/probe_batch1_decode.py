"""Why is batch-1 Tacotron2 jitted inference ~2 s/call through the tunnel?

probe_single_stream.py: taco2 jit+fetch 1975 ms at B=1 while CLAUDE.md
records 3.0 ms for the B=8 decode. Separate device time from tunnel
per-dispatch overhead: time each batch size both per-call-fenced and
enqueue-N-fence-once (amortized). If amortized ~ms but fenced ~2 s, the
cost is tunnel dispatch/fetch, not XLA execution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp

from tts_tpu.models.tacotron2 import Tacotron2

T_TEXT, STEPS, R = 96, 124, 2


def main():
    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(num_chars=128, r=R, max_decoder_steps=STEPS)
    text8 = jax.random.randint(rng, (8, T_TEXT), 1, 128)
    tl8 = jnp.full((8,), T_TEXT - 5, jnp.int32)
    v = taco.init({"params": rng, "dropout": rng}, text8[:2], tl8[:2],
                  jnp.zeros((2, STEPS * R, 80)),
                  jnp.full((2,), STEPS * R, jnp.int32))

    @jax.jit
    def infer(v, text, tl, rng):
        out = taco.apply(v, text, tl, rngs={"dropout": rng},
                         method=Tacotron2.inference)
        return out["postnet_outputs"].sum()

    for B in (1, 2, 8):
        text, tl = text8[:B], tl8[:B]
        s = infer(v, text, tl, rng)
        float(s)  # compile+sync
        # per-call fenced
        t0 = time.perf_counter()
        for _ in range(5):
            float(infer(v, text, tl, rng))
        fenced = (time.perf_counter() - t0) / 5
        # enqueue 10, fence once
        t0 = time.perf_counter()
        for _ in range(10):
            s = infer(v, text, tl, rng)
        float(s)
        amort = (time.perf_counter() - t0) / 10
        print(f"B={B}: fenced {fenced*1e3:8.1f} ms   "
              f"amortized {amort*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
