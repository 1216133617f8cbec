"""Megakernel per-op fixed-cost hypothesis: same TOTAL frames, different
(B, T) splits. probe_matmul_shapes measured in-kernel dots at 1x/2x/3.3x
FLOPs taking the SAME wall time, and items_per_block=4 (sequential items
per grid step) measured SLOWER — so if per-grid-step op COUNT is the
binding cost, (64, 496) should beat (128, 248) at equal total work, and
fusing items into wider lanes is the first positive layout lever.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.vocoder.fold import fold_weight_norm
from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
from tts_tpu.ops.pallas.fused_melgan import (megakernel_generator_apply,
                                             pack_generator_params)


def main():
    rng = jax.random.PRNGKey(0)
    voc = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    voc_vars = voc.init(rng, jnp.zeros((2, 248, 80)))
    params = fold_weight_norm(voc_vars["params"])
    plain = voc.clone(use_weight_norm=False)
    packed = pack_generator_params(plain, params, fuse_pqmf=True)

    for B, T in ((128, 248), (64, 496), (32, 992), (16, 1984)):
        mel = jax.random.normal(rng, (B, T, 80))

        @jax.jit
        def run(packed, mel):
            return megakernel_generator_apply(plain, packed, mel).sum()

        s = run(packed, mel)
        float(s)
        t0 = time.perf_counter()
        for _ in range(20):
            s = run(packed, mel)
        float(s)
        dt = (time.perf_counter() - t0) / 20
        print(f"B={B:4d} T={T:5d}: {dt*1e3:7.2f} ms "
              f"({dt/B*1e6:6.1f} us/item, total frames {B*T})", flush=True)


if __name__ == "__main__":
    main()
