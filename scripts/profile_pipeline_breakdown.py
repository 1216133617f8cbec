"""Per-stage breakdown of the flagship serving pipeline at bench shapes.

Each stage is timed as its own jitted graph with the N-iteration
enqueue-then-fence pattern (CLAUDE.md: block_until_ready does not fence
through the axon tunnel; scalar fetch does, and its ~25 ms RTT amortizes
over iters).
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
    from tts_tpu.infer.fast_decode import taco2_fused_inference
    from tts_tpu.ops.pallas.fused_melgan import (megakernel_generator_apply,
                                                 pack_generator_params)

    rng = jax.random.PRNGKey(0)
    B, T_TEXT, STEPS, R = 64, 128, 124, 2
    taco = Tacotron2(num_chars=128, r=R)
    text = jax.random.randint(rng, (B, T_TEXT), 0, 128)
    text_len = jnp.full((B,), T_TEXT, jnp.int32)
    taco_vars = taco.init({"params": rng, "dropout": rng}, text[:2],
                          text_len[:2], jnp.zeros((2, 32, 80)),
                          jnp.full((2,), 32, jnp.int32))
    from tts_tpu.ops.pallas.fused_taco2_decode import pack_decoder_params
    packed = pack_decoder_params(taco_vars["params"], t_in=T_TEXT)

    gen = MultibandMelganGenerator(upsample_factors=(2, 8, 2, 2))
    v = gen.init(rng, jnp.zeros((2, 32, 80)))
    folded = fold_weight_norm(v["params"])
    plain = gen.clone(use_weight_norm=False)
    voc_packed = pack_generator_params(gen, folded)

    T_MEL = STEPS * R
    mel = jax.random.normal(rng, (B, T_MEL, 80))
    sub = jax.random.normal(rng, (B, T_MEL * 64, 4))

    @jax.jit
    def decode_only(tv, pk, text, text_len):
        out = taco2_fused_inference(taco, tv, text, text_len,
                                    max_decoder_steps=STEPS, packed=pk)
        return out["postnet_outputs"].sum()

    @jax.jit
    def mega_only(pk, mel):
        return megakernel_generator_apply(gen, pk, mel).sum()

    @jax.jit
    def pqmf_only(sub):
        return plain.pqmf.synthesis(sub).sum()

    print(f"decode (enc+decode+postnet): "
          f"{timeit(decode_only, taco_vars, packed, text, text_len)*1e3:7.3f} ms")
    print(f"megakernel (no PQMF)       : "
          f"{timeit(mega_only, voc_packed, mel)*1e3:7.3f} ms")
    print(f"PQMF synthesis alone       : {timeit(pqmf_only, sub)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
