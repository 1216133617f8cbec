"""Stage-by-stage MB-MelGAN latency breakdown on the real chip.

Times each pipeline piece separately (proj_in, each upsample stage's
transposed conv and residual stack, proj_out+PQMF) plus the full forward,
using the enqueue-N-then-fence-once method from CLAUDE.md (block_until_ready
does not fence through the axon tunnel).
"""

import time

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.vocoder.melgan import ResidualStack, WNConv
from tts_tpu.models.vocoder.pqmf import PQMF

B = 64
T0 = 248  # mel frames (bench geometry: steps=124, r=2)
FACTORS = (2, 8, 2, 2)
BASE = 384


def timeit(fn, args, iters=30, name=""):
    out = fn(*args)
    s = float(jnp.asarray(out).sum()) if not isinstance(out, tuple) else float(out[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.asarray(out).sum()) if not isinstance(out, tuple) else float(out[-1])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    results = {}

    # per-stage: leaky_relu -> ConvTranspose(2f, f) -> ResidualStack
    class Stage(nn.Module):
        ch: int
        factor: int

        @nn.compact
        def __call__(self, x):
            x = nn.leaky_relu(x, 0.2)
            x = nn.ConvTranspose(self.ch, kernel_size=(2 * self.factor,),
                                 strides=(self.factor,), padding="SAME",
                                 name="up")(x)
            return ResidualStack(self.ch, 3, use_weight_norm=False,
                                 name="rs")(x)

    class UpOnly(nn.Module):
        ch: int
        factor: int

        @nn.compact
        def __call__(self, x):
            x = nn.leaky_relu(x, 0.2)
            return nn.ConvTranspose(self.ch, kernel_size=(2 * self.factor,),
                                    strides=(self.factor,), padding="SAME")(x)

    class RSOnly(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x):
            return ResidualStack(self.ch, 3, use_weight_norm=False)(x)

    total = 0.0
    # proj_in
    x = jax.random.normal(rng, (B, T0, 80))
    m = WNConv(BASE, 7, use_weight_norm=False)
    v = m.init(rng, x[:1])
    total += timeit(jax.jit(lambda v, x: m.apply(v, x)), (v, x),
                    name=f"proj_in  (B,{T0},80)->(.,{BASE})")

    t, ch = T0, BASE
    for i, f in enumerate(FACTORS):
        ch //= 2
        x = jax.random.normal(rng, (B, t, ch * 2))
        up = UpOnly(ch, f)
        uv = up.init(rng, x[:1])
        total += timeit(jax.jit(lambda v, x, up=up: up.apply(v, x)), (uv, x),
                        name=f"up{i} x{f}  (B,{t},{ch*2})->(B,{t*f},{ch})")
        t *= f
        y = jax.random.normal(rng, (B, t, ch))
        rs = RSOnly(ch)
        rv = rs.init(rng, y[:1])
        total += timeit(jax.jit(lambda v, x, rs=rs: rs.apply(v, x)), (rv, y),
                        name=f"resstack{i}  (B,{t},{ch})")

    # proj_out + tanh + pqmf synthesis
    y = jax.random.normal(rng, (B, t, 24))
    m2 = WNConv(4, 7, use_weight_norm=False)
    v2 = m2.init(rng, y[:1])
    pq = PQMF(N=4)

    def tail(v, x):
        s = jnp.tanh(m2.apply(v, x))
        return pq.synthesis(s)

    total += timeit(jax.jit(tail), (v2, y), name=f"proj_out+tanh+pqmf  (B,{t},24)")

    print(f"{'SUM of stages':44s} {total:8.3f} ms")

    # full forward, folded weight norm
    from tts_tpu.models.vocoder.fold import fold_weight_norm
    from tts_tpu.models.vocoder.multiband_melgan import MultibandMelganGenerator
    voc = MultibandMelganGenerator(upsample_factors=FACTORS)
    vv = voc.init(rng, jnp.zeros((2, T0, 80)))
    vp = fold_weight_norm(vv["params"])
    voc_plain = voc.clone(use_weight_norm=False)
    mel = jax.random.normal(rng, (B, T0, 80))

    def full(p, mel):
        sub = voc_plain.apply({"params": p}, mel)
        return voc_plain.pqmf.synthesis(sub)

    timeit(jax.jit(full), (vp, mel), name="FULL mbmelgan fwd+pqmf (folded)")


if __name__ == "__main__":
    main()
