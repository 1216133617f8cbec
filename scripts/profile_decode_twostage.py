"""Folded (2T, T*A) band vs two-stage conv+dense location product in the
fused Tacotron2 decode kernel at B=128 (VERDICT r2 item 4; ablation record
in scripts/profile_decode_ablate.py: energy block 10.8 us of 57.9 us/step,
banded loc matmul 8.9 us)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.tacotron2 import Tacotron2
from tts_tpu.ops.pallas.fused_taco2_decode import (fused_decode,
                                                   pack_decoder_params)

B, T_TEXT, STEPS, R = 128, 128, 124, 2


def main():
    rng = jax.random.PRNGKey(0)
    model = Tacotron2(num_chars=128, r=R)
    text = jax.random.randint(rng, (B, T_TEXT), 1, 128)
    tl = jnp.full((B,), T_TEXT, jnp.int32)
    v = model.init({"params": rng, "dropout": rng}, text[:2], tl[:2],
                   jnp.zeros((2, STEPS * R, 80)),
                   jnp.full((2,), STEPS * R, jnp.int32))

    from tts_tpu.infer.fast_decode import taco2_fused_encode
    enc, pi, mask = taco2_fused_encode(model, v, text, tl)

    outs = {}
    for two_stage in (False, True):
        packed = pack_decoder_params(v["params"], t_in=T_TEXT,
                                     two_stage=two_stage)

        @jax.jit
        def run(enc, pi, mask, packed, ts=two_stage):
            f, s, a = fused_decode(enc, pi, mask, packed, steps=STEPS, r=R,
                                   two_stage=ts)
            return f.sum() + s.sum() + a.sum()

        s = run(enc, pi, mask, packed)
        float(s)
        t0 = time.perf_counter()
        for _ in range(20):
            s = run(enc, pi, mask, packed)
        float(s)
        dt = (time.perf_counter() - t0) / 20
        outs[two_stage] = float(s)
        print(f"two_stage={two_stage}: {dt*1e3:7.2f} ms "
              f"({dt/STEPS*1e6:5.1f} us/step)  checksum {float(s):.1f}",
              flush=True)
    print(f"checksum diff {abs(outs[True]-outs[False]):.3e}")


if __name__ == "__main__":
    main()
