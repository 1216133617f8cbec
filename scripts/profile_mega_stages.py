"""Attribution probe for the vocoder megakernel at bench shapes (batch 128):
time truncated variants (stop after proj_in / each stage / proj_out / pqmf)
and report incremental per-stage cost."""

import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    import tts_tpu.ops.pallas.fused_melgan as fm
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator

    rng = jax.random.PRNGKey(0)
    B, T = 128, 248
    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    mel = jax.random.normal(rng, (B, T, 80))
    v = gen.init(rng, jnp.zeros((2, T, 80)))
    folded = fold_weight_norm(v["params"])
    packed = fm.pack_generator_params(gen, folded, fuse_pqmf=True)
    factors = tuple(gen.upsample_factors)
    nrb, pk, ns = gen.num_res_blocks, gen.proj_kernel, 0.2
    pqmf = gen.pqmf
    _, q = fm.pack_pqmf_synthesis_params(pqmf)
    taps = int(np.asarray(pqmf._syn_poly).shape[0])
    P_full = int(np.prod(factors))
    out_ch = pqmf.N

    def make_kernel(stop: int):
        # stop: 0 = proj_in only; 1..4 = after stage k; 5 = +proj_out/tanh;
        # 6 = full (+pqmf tail)
        def kernel(mel_ref, *refs):
            w_refs, out_ref = refs[:-1], refs[-1]
            cd = jnp.float32
            x = jnp.transpose(mel_ref[0]).astype(cd)
            sigma: Tuple[int, ...] = (0,)
            x = fm._conv_head(x, sigma, T, w_refs[0], w_refs[1], pk, cd)
            x = x.astype(cd)
            idx = 2
            for i in range(len(factors)):
                if stop <= i:
                    break
                wa, wb, ub = w_refs[idx], w_refs[idx + 1], w_refs[idx + 2]
                w1, b1, w2, bout = w_refs[idx + 3:idx + 7]
                idx += 7
                x, sigma = fm._upsample_body(x, sigma, T, wa, wb, ub,
                                             factors[i], ns, cd)
                x = fm._stack_body_pb(x, sigma, T, w1, b1, w2, bout, nrb,
                                      3, ns, cd)
            if stop >= 5:
                idx = 2 + 7 * len(factors)
                y = fm._leaky(x, ns)
                y = fm._conv_head(y, sigma, T, w_refs[idx], w_refs[idx + 1],
                                  pk, cd)
                y = jnp.tanh(y)
                if stop >= 6:
                    y = fm._pqmf_tail(y.astype(cd), sigma, T, w_refs[idx + 2],
                                      taps, q, cd)
                out_ref[0] = y.astype(out_ref.dtype)
            else:
                # broadcast the partial activation's checksum over the block
                # (scatter is unsupported; the full-block write cost is the
                # same in every variant so increments stay comparable)
                out_ref[0] = jnp.full(out_ref.shape[1:], jnp.sum(x),
                                      out_ref.dtype)

        return kernel

    def build(stop):
        t_out = T * P_full

        @jax.jit
        def run(mel, *ws):
            full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                          memory_space=pltpu.VMEM)
            o = pl.pallas_call(
                make_kernel(stop),
                out_shape=jax.ShapeDtypeStruct((B, out_ch, t_out), mel.dtype),
                grid=(B,),
                in_specs=[pl.BlockSpec((1, T, 80), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)]
                         + [full(w) for w in ws],
                out_specs=pl.BlockSpec((1, out_ch, t_out),
                                       lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(mel, *ws)
            return o.sum()
        return run

    prev = 0.0
    names = ["proj_in", "+stage0(f2,C192)", "+stage1(f8,C96)",
             "+stage2(f2,C48)", "+stage3(f2,C24)", "+proj_out+tanh",
             "+pqmf tail"]
    for stop, name in enumerate(names):
        t = timeit(build(stop), mel, *packed)
        print(f"{name:18s}: {t*1e3:7.3f} ms  (+{(t-prev)*1e3:6.3f})")
        prev = t


if __name__ == "__main__":
    main()
