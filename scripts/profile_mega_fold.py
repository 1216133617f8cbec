"""Folded (superphase-group) vs unfolded megakernel at bench shapes (B128).

The fold targets the measured 2.3x MXU-utilization gap: stages 2-3 +
proj_out + pqmf run at 10-20% tile utilization unfolded
(scripts/model_mega_passes.py predicts 2729 -> ~1900 tile passes folded)."""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def main():
    import numpy as np

    import tts_tpu.ops.pallas.fused_melgan as fm
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import \
        MultibandMelganGenerator

    rng = jax.random.PRNGKey(0)
    B, T = 128, 248
    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    mel = jax.random.normal(rng, (B, T, 80))
    v = gen.init(rng, jnp.zeros((2, T, 80)))
    folded = fold_weight_norm(v["params"])
    print("fold_start_stage:", fm.fold_start_stage(gen))

    import sys
    variants = {"unfolded": {}, "fold": {"fold": True},
                "stacked": {"stacked": True}}
    which = sys.argv[1:] or ["unfolded", "stacked"]
    outs = {}
    for name in which:
        kw = variants[name]
        packed = fm.pack_generator_params(gen, folded, fuse_pqmf=True, **kw)

        @jax.jit
        def run(mel, packed):
            return fm.megakernel_generator_apply(gen, packed, mel)

        wav = run(mel, packed)
        outs[name] = np.asarray(jax.device_get(wav[:2]))

        @jax.jit
        def runsum(mel, packed):
            return fm.megakernel_generator_apply(gen, packed, mel).sum()

        t = timeit(runsum, mel, packed)
        print(f"{name:9s}: {t*1e3:7.3f} ms / batch {B}", flush=True)

    base = which[0]
    for name in which[1:]:
        diff = np.abs(outs[name] - outs[base]).max()
        print(f"max|{name} - {base}| on-device: {diff:.2e}")


if __name__ == "__main__":
    main()
