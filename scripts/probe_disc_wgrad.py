"""Per-layer fwd/dgrad/wgrad cost of the MelGAN discriminator convs.

grad[D real+fake] is 131.4 of 160.7 ms in the GAN step at B=32/seg=64
(scripts/profile_gan_step.py). Before writing any Pallas wgrad kernel
(VERDICT r2 item 3), find WHICH conv shape and WHICH gradient (dx vs dW)
XLA lowers badly. Shapes are scale-0 of MelganMultiscaleDiscriminator
(melgan.py:239-292): near-depthwise grouped convs, kernel 41, stride 4.

Isolated rows carry ~1 ms tunnel overhead each; trust relative sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B = 32
L0 = 64 * 256  # seg=64 frames * hop


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def conv(x, w, stride, groups):
    pad = (w.shape[0] - 1) // 2
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NWC", "WIO", "NWC"))
    return lax.conv_general_dilated(x, w, (stride,), [(pad, pad)],
                                    feature_group_count=groups,
                                    dimension_numbers=dn)


LAYERS = [
    # (tag, L, cin, cout, k, stride, groups)
    ("conv_in  15 1->16  dense", L0, 1, 16, 15, 1, 1),
    ("down_0   41 16->64 g16  ", L0, 16, 64, 41, 4, 16),
    ("down_1   41 64->256 g64 ", L0 // 4, 64, 256, 41, 4, 64),
    ("down_2   41 256->1024 g256", L0 // 16, 256, 1024, 41, 4, 256),
    ("down_3   41 1024->1024 g256", L0 // 64, 1024, 1024, 41, 4, 256),
    ("conv_post1 5 1024->1024 dense", L0 // 256, 1024, 1024, 5, 1, 1),
]


def main():
    rng = jax.random.PRNGKey(0)
    total = {"fwd": 0.0, "dx": 0.0, "dw": 0.0}
    for tag, L, cin, cout, k, s, g in LAYERS:
        x = jax.random.normal(rng, (B, L, cin))
        w = jax.random.normal(rng, (k, cin // g, cout)) * 0.02

        f = jax.jit(lambda x, w, s=s, g=g: conv(x, w, s, g))
        gx = jax.jit(jax.grad(lambda x, w, s=s, g=g: conv(x, w, s, g).sum(),
                              argnums=0))
        gw = jax.jit(jax.grad(lambda x, w, s=s, g=g: conv(x, w, s, g).sum(),
                              argnums=1))
        total["fwd"] += timeit(f"{tag} fwd", f, x, w)
        total["dx"] += timeit(f"{tag} dgrad(dx)", gx, x, w)
        total["dw"] += timeit(f"{tag} wgrad(dW)", gw, x, w)
    print(f"\nTOTAL (scale-0, one pass): fwd {total['fwd']*1e3:.1f} "
          f"dx {total['dx']*1e3:.1f} dW {total['dw']*1e3:.1f} ms")


if __name__ == "__main__":
    main()
