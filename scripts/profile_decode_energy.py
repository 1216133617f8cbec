"""Probe: decode kernel with energy_dtype=bf16 vs f32 at bench shapes
(batch 128): time + numeric drift on frames/alignments."""

import functools
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
    from tts_tpu.infer.fast_decode import taco2_fused_encode
    from tts_tpu.ops.pallas.fused_taco2_decode import (fused_decode,
                                                       pack_decoder_params)

    rng = jax.random.PRNGKey(0)
    B, T_TEXT, STEPS, R = 128, 128, 124, 2
    taco = Tacotron2(num_chars=128, r=R)
    text = jax.random.randint(rng, (B, T_TEXT), 0, 128)
    text_len = jnp.full((B,), T_TEXT, jnp.int32)
    taco_vars = taco.init({"params": rng, "dropout": rng}, text[:2],
                          text_len[:2], jnp.zeros((2, 32, 80)),
                          jnp.full((2,), 32, jnp.int32))
    packed = pack_decoder_params(taco_vars["params"], t_in=T_TEXT)
    enc, pi, mask = jax.jit(
        lambda tv, t, tl: taco2_fused_encode(taco, tv, t, tl))(
            taco_vars, text, text_len)

    @functools.partial(jax.jit, static_argnames=("ed",))
    def run(enc, pi, mask, pk, ed):
        return fused_decode(enc, pi, mask, pk, steps=STEPS, r=R, n_mels=80,
                            compute_dtype=jnp.bfloat16, energy_dtype=ed)

    f32 = run(enc, pi, mask, packed, jnp.float32)
    bf = run(enc, pi, mask, packed, jnp.bfloat16)
    print("frames max|d|:", float(jnp.max(jnp.abs(f32[0] - bf[0]))),
          " frame scale:", float(jnp.max(jnp.abs(f32[0]))))
    print("align  max|d|:", float(jnp.max(jnp.abs(f32[2] - bf[2]))))
    t32 = timeit(lambda *a: run(*a, jnp.float32)[0].sum(),
                 enc, pi, mask, packed)
    tbf = timeit(lambda *a: run(*a, jnp.bfloat16)[0].sum(),
                 enc, pi, mask, packed)
    print(f"decode energy f32 : {t32*1e3:8.3f} ms  ({t32/STEPS*1e6:5.1f} us/step)")
    print(f"decode energy bf16: {tbf*1e3:8.3f} ms  ({tbf/STEPS*1e6:5.1f} us/step)")


if __name__ == "__main__":
    main()
