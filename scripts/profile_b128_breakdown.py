"""Per-stage breakdown of the flagship serving pipeline at BENCH shapes
(batch 128). Isolated-stage timings carry ~1 ms fixed tunnel overhead each
(CLAUDE.md) — use for relative attribution, trust the full-graph total.
"""

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
    from tts_tpu.models.tacotron2 import Tacotron2
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
    from tts_tpu.infer.fast_decode import (taco2_fused_encode,
                                           taco2_fused_inference)
    from tts_tpu.ops.pallas.fused_taco2_decode import (fused_decode,
                                                       pack_decoder_params)
    from tts_tpu.ops.pallas.fused_melgan import (megakernel_generator_apply,
                                                 pack_generator_params,
                                                 _fused_generator,
                                                 to_true_time)

    rng = jax.random.PRNGKey(0)
    B, T_TEXT, STEPS, R = 128, 128, 124, 2
    T_MEL = STEPS * R
    taco = Tacotron2(num_chars=128, r=R)
    text = jax.random.randint(rng, (B, T_TEXT), 0, 128)
    text_len = jnp.full((B,), T_TEXT, jnp.int32)
    taco_vars = taco.init({"params": rng, "dropout": rng}, text[:2],
                          text_len[:2], jnp.zeros((2, 32, 80)),
                          jnp.full((2,), 32, jnp.int32))
    packed = pack_decoder_params(taco_vars["params"], t_in=T_TEXT)

    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    v = gen.init(rng, jnp.zeros((2, 32, 80)))
    folded = fold_weight_norm(v["params"])
    voc_packed = pack_generator_params(gen, folded, fuse_pqmf=True)

    mel = jax.random.normal(rng, (B, T_MEL, 80))
    enc0, pi0, mask0 = jax.jit(
        lambda tv, t, tl: taco2_fused_encode(taco, tv, t, tl))(
            taco_vars, text, text_len)

    @jax.jit
    def encode_only(tv, text, text_len):
        enc, pi, mask = taco2_fused_encode(taco, tv, text, text_len)
        return enc.sum() + pi.sum()

    @jax.jit
    def decode_only(enc, pi, mask, pk):
        frames, stop, al = fused_decode(enc, pi, mask, pk, steps=STEPS, r=R,
                                        n_mels=80,
                                        compute_dtype=jnp.bfloat16)
        return frames.sum()

    @jax.jit
    def postnet_only(tv, mel):
        def post(mdl, dec_out):
            return dec_out + mdl.postnet(dec_out, train=False)
        return taco.apply(tv, dec_out=mel, method=post).sum()

    @jax.jit
    def full_decode(tv, pk, text, text_len):
        out = taco2_fused_inference(taco, tv, text, text_len,
                                    max_decoder_steps=STEPS, packed=pk)
        return out["postnet_outputs"].sum()

    @jax.jit
    def mega_pb_only(pk, mel):
        pqmf = gen.pqmf
        import numpy as np
        from tts_tpu.ops.pallas.fused_melgan import pack_pqmf_synthesis_params
        _, q = pack_pqmf_synthesis_params(pqmf)
        taps = int(np.asarray(pqmf._syn_poly).shape[0])
        pb = _fused_generator(mel, pk, factors=tuple(gen.upsample_factors),
                              num_res_blocks=gen.num_res_blocks,
                              proj_kernel=gen.proj_kernel,
                              out_channels=pqmf.N, pqmf_taps=taps, pqmf_q=q)
        return pb.sum()

    @jax.jit
    def mega_full(pk, mel):
        return megakernel_generator_apply(gen, pk, mel).sum()

    print(f"encoder (emb+convs+BiLSTM+pi): "
          f"{timeit(encode_only, taco_vars, text, text_len)*1e3:7.3f} ms")
    print(f"fused decode kernel alone    : "
          f"{timeit(decode_only, enc0, pi0, mask0, packed)*1e3:7.3f} ms")
    print(f"postnet alone                : "
          f"{timeit(postnet_only, taco_vars, mel)*1e3:7.3f} ms")
    print(f"enc+decode+postnet total     : "
          f"{timeit(full_decode, taco_vars, packed, text, text_len)*1e3:7.3f} ms")
    print(f"megakernel (phase-block out) : "
          f"{timeit(mega_pb_only, voc_packed, mel)*1e3:7.3f} ms")
    print(f"megakernel + to_true_time    : "
          f"{timeit(mega_full, voc_packed, mel)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
