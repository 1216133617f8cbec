"""iSTFT-head generator forward speed vs the MB-MelGAN serving paths.

The megakernel record (CLAUDE.md): MB-MelGAN B=64 plain XLA 10.9 ms ->
megakernel+fused PQMF 3.8 ms; at B=128/t=248 the megakernel is ~5.4 ms and
measured to be bound by the small-C late-stage matmul rate. The iSTFT head
deletes those stages (body stops at x64 time, C=128), so its PLAIN XLA
forward is the apples-to-apples test of the algorithmic lever.

Run: python scripts/probe_istft_gen.py   (B/T via env ISTFT_B / ISTFT_T)
"""

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B = int(os.environ.get("ISTFT_B", "128"))
T = int(os.environ.get("ISTFT_T", "248"))
REP, ITERS = 3, 20


def timeit(name, fn, *args):
    out = fn(*args)
    float(out.sum())  # fence through the tunnel (CLAUDE.md)
    times = []
    for _ in range(REP):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        float(out.sum())
        times.append((time.perf_counter() - t0) / ITERS * 1e3)
    times.sort()
    med = times[REP // 2]
    print(f"{name}: {med:.2f} ms/batch (spread "
          f"{100 * (times[-1] - times[0]) / med:.1f}%)", flush=True)
    return med


def main():
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (B, T, 80))

    # 1. iSTFT-head generator, plain XLA
    from tts_tpu.models.vocoder.istft_melgan import ISTFTMelganGenerator
    gen = ISTFTMelganGenerator()
    gv = jax.device_put(gen.init(rng, mel[:2]))
    istft_fwd = jax.jit(lambda v, m: gen.apply(v, m))
    t_istft = timeit(f"istft_melgan plain XLA B{B} T{T}", istft_fwd, gv, mel)

    # 2. MB-MelGAN megakernel (the serving record) at the same shape
    from bench import build_vocoder
    from tts_tpu.ops.pallas.fused_melgan import megakernel_generator_apply
    voc_plain, voc_packed = build_vocoder(T, rng)
    voc_packed = jax.device_put(voc_packed)
    mega = jax.jit(lambda p, m: megakernel_generator_apply(voc_plain, p, m))
    t_mega = timeit(f"mb_melgan megakernel B{B} T{T}", mega, voc_packed, mel)

    # 3. MB-MelGAN plain XLA (+ polyphase PQMF) — the no-Pallas baseline
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
    voc = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    vp = fold_weight_norm(voc.init(rng, mel[:2])["params"])
    voc_nf = voc.clone(use_weight_norm=False)
    vp = jax.device_put({"params": vp})
    plain = jax.jit(lambda v, m: voc_nf.pqmf.synthesis(voc_nf.apply(v, m)))
    t_plain = timeit(f"mb_melgan plain XLA+PQMF B{B} T{T}", plain, vp, mel)

    print(f"speedup vs megakernel: {t_mega / t_istft:.2f}x, "
          f"vs plain MB path: {t_plain / t_istft:.2f}x")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()

