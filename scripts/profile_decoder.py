"""Tacotron2 autoregressive decode latency: dtype and batch scaling."""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.tacotron2 import Tacotron2

STEPS, R, T_TEXT = 124, 2, 128


def fence(x):
    return float(jnp.asarray(x).sum())


def timeit(fn, args, iters=30, name=""):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.3f} ms")


def main():
    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(num_chars=128, r=R)
    mel0 = jnp.zeros((2, STEPS * R, 80))
    v32 = taco.init({"params": rng, "dropout": rng},
                    jnp.zeros((2, T_TEXT), jnp.int32),
                    jnp.full((2,), T_TEXT, jnp.int32), mel0,
                    jnp.full((2,), STEPS * R, jnp.int32))
    v16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v32)

    def decode(vars_, text, text_len):
        out = taco.apply(vars_, text, text_len,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         method=taco.inference, max_decoder_steps=STEPS,
                         use_windowing=False)
        return out["postnet_outputs"].astype(jnp.float32).sum()

    f = jax.jit(decode)
    for B in (8, 64):
        text = jax.random.randint(rng, (B, T_TEXT), 0, 128)
        tl = jnp.full((B,), T_TEXT, jnp.int32)
        timeit(f, (v16, text, tl), name=f"decode B={B} bf16 params")
        timeit(f, (v32, text, tl), name=f"decode B={B} f32 params")




def bench_fused():
    from tts_tpu.infer.fast_decode import taco2_fused_inference
    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(num_chars=128, r=R)
    mel0 = jnp.zeros((2, STEPS * R, 80))
    v32 = taco.init({"params": rng, "dropout": rng},
                    jnp.zeros((2, T_TEXT), jnp.int32),
                    jnp.full((2,), T_TEXT, jnp.int32), mel0,
                    jnp.full((2,), STEPS * R, jnp.int32))
    B = 64
    text = jax.random.randint(rng, (B, T_TEXT), 0, 128)
    tl = jnp.full((B,), T_TEXT, jnp.int32)

    from tts_tpu.ops.pallas.fused_taco2_decode import pack_decoder_params
    packed = pack_decoder_params(v32["params"], t_in=T_TEXT)
    for name, cd in (("bf16", jnp.bfloat16),):
        fn = jax.jit(lambda v, t, l, pk, cd=cd: taco2_fused_inference(
            taco, v, t, l, max_decoder_steps=STEPS, packed=pk,
            compute_dtype=cd)["postnet_outputs"].astype(jnp.float32).sum())
        timeit(fn, (v32, text, tl, packed), name=f"FUSED decode B={B} {name}")

    # numeric check vs scan decode on a small slice
    out_scan = taco.apply(v32, text[:4], tl[:4], max_decoder_steps=STEPS,
                          use_windowing=False,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          method=Tacotron2.inference)
    out_fused = taco2_fused_inference(taco, v32, text[:4], tl[:4],
                                      max_decoder_steps=STEPS,
                                      compute_dtype=jnp.bfloat16)
    d = float(jnp.max(jnp.abs(out_scan["postnet_outputs"]
                              - out_fused["postnet_outputs"])))
    a = float(jnp.max(jnp.abs(out_scan["alignments"]
                              - out_fused["alignments"])))
    print(f"fused-vs-scan on TPU: mel maxdiff={d:.3e} align maxdiff={a:.3e}")


if __name__ == "__main__":
    import sys
    if "fused" in sys.argv:
        bench_fused()
