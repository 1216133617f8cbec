"""bf16 ACTIVATION-STORAGE probe for the Glow-TTS serving pipeline.

All matmuls already run at the bf16 MXU rate regardless of dtype
(probe_precision.py), but the HBM-bound encoder (each sublayer ~2.5x its
FLOP roofline, profile_glow_encoder3.py) still moves f32 activations
between fusion islands. Casting params to bf16 makes most intermediate
activations bf16 -> halves that traffic. Measures full inference pipeline
time + numeric drift vs f32 at bench geometry (B=128, t_text=128, 248
mel frames).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.glow_tts import GlowTTS

B, T_TEXT, T_MEL = 128, 128, 248


def main():
    rng = jax.random.PRNGKey(0)
    glow = GlowTTS(num_chars=128, mas_impl="jnp")
    text = jax.random.randint(rng, (B, T_TEXT), 1, 128)
    tl = jnp.full((B,), T_TEXT, jnp.int32)
    gv = glow.init({"params": rng, "dropout": rng, "noise": rng},
                   text[:2], tl[:2], jnp.zeros((2, T_MEL, 80)),
                   jnp.full((2,), T_MEL, jnp.int32), train=False)

    def cast(tree, dt):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree)

    # encoder-only variant: the encoder is the HBM-bound stage (each sublayer
    # ~2.5x its FLOP roofline); the flow decoder is at its matmul roofline
    # AND numerically sensitive (inverse flow amplifies bf16 error), so cast
    # only the encoder subtree.
    from flax.core import unfreeze
    gv_enc = unfreeze(gv)
    gv_enc["params"] = dict(gv_enc["params"])
    gv_enc["params"]["encoder"] = cast(gv_enc["params"]["encoder"],
                                       jnp.bfloat16)

    outs = {}
    for name, variables in (("f32", gv),
                            ("bf16", cast(gv, jnp.bfloat16)),
                            ("enc_bf16", gv_enc)):
        @jax.jit
        def run(v, text, tl):
            out = glow.apply(v, text, tl, noise_scale=0.33,
                             y_max_length=T_MEL,
                             rngs={"noise": jax.random.PRNGKey(1)},
                             method=GlowTTS.inference)
            return out["model_outputs"].astype(jnp.float32)

        mel = run(variables, text, tl)
        float(mel.sum())
        t0 = time.perf_counter()
        for _ in range(20):
            mel = run(variables, text, tl)
        float(mel.sum())
        dt = (time.perf_counter() - t0) / 20
        outs[name] = jax.device_get(mel)
        print(f"{name:5s}: {dt*1e3:7.2f} ms/batch", flush=True)
    import numpy as np
    scale = np.abs(outs["f32"]).max()
    for name in ("bf16", "enc_bf16"):
        d = np.abs(outs["f32"] - outs[name]).max()
        print(f"{name}: max_abs_diff {d:.4e} (scale {scale:.3e})")


if __name__ == "__main__":
    main()
