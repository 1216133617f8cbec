"""Batch-scaling probe for the flagship Glow serving pipeline.

The old "batch 256 not attempted" note reasoned from the Tacotron2 decode
kernel's VMEM ceiling; the Glow path has no such kernel — encoder/flow are
XLA and the vocoder megakernel is grid-stepped per item. If time/batch
grows sub-linearly from 128 -> 256, throughput rises for free.

Measures the full pipeline (glow inference + megakernel vocoder) at
B=128 and B=256, 3 reps each, reporting per-batch ms and audio-s/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bench import SR, build_glow_pipeline

T_MEL = 248


def main():
    for batch in (128, 256):
        fn, args = build_glow_pipeline(batch=batch, t_mel=T_MEL)
        n_samples, s = fn(*args)
        float(s)  # compile + fence
        reps, iters = 3, 20
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                n_samples, s = fn(*args)
            float(s)
            times.append((time.perf_counter() - t0) / iters)
        times.sort()
        dt = times[reps // 2]
        audio_s = batch * int(n_samples) / SR
        print(f"B={batch:4d}: {dt*1e3:7.2f} ms/batch "
              f"(min {times[0]*1e3:.2f} max {times[-1]*1e3:.2f}) "
              f"-> {audio_s/dt:9.0f} audio-s/s", flush=True)


if __name__ == "__main__":
    main()
