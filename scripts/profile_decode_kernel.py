"""Ablate the fused decode kernel's per-step components on the chip."""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tts_tpu.models.tacotron2 import Tacotron2
from tts_tpu.ops.pallas.fused_taco2_decode import pack_decoder_params

STEPS, R, T_TEXT, B = 124, 2, 128, 64


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
    print(f"{name:40s} {dt:8.3f} ms  ({dt/STEPS*1e3:6.1f} us/step)")


def make(variant, enc, pi, mask, packed, H=1024, n_mels=80):
    cd = jnp.bfloat16
    big = {"pw1", "pw2", "awih", "awhh", "qk", "kba", "kbc", "dwih", "dwhh",
           "projw"}
    names = ["pw1", "pw2", "awih", "awhh", "ab", "qk", "kba", "kbc", "v",
             "dwih", "dwhh", "db", "projw", "projb", "stopw", "stopb"]
    ops = [packed[n].astype(cd) if n in big else packed[n] for n in names]
    enc = enc.astype(cd)
    pi = pi.astype(cd)

    def kernel(enc_ref, pi_ref, mask_ref, pw1_ref, pw2_ref, awih_ref,
               awhh_ref, ab_ref, qk_ref, kba_ref, kbc_ref, v_ref, dwih_ref,
               dwhh_ref, db_ref, projw_ref, projb_ref, stopw_ref, stopb_ref,
               frames_ref):
        Bk, T, D = enc_ref.shape
        encv = enc_ref[:]
        piv = pi_ref[:]
        maskf = mask_ref[:]

        def dot(a, b):
            return jnp.dot(a.astype(cd), b.astype(cd),
                           preferred_element_type=jnp.float32)

        def lstm(x, h, c, wih, whh, b):
            gates = dot(x, wih[:]) + dot(h, whh[:]) + b[:].astype(jnp.float32)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            nc = f * c + i * g
            return (o * jnp.tanh(nc)).astype(cd), nc.astype(cd)

        def body(step, carry):
            (h1, c1, h2, c2, context, align, cum, last_frame) = carry
            p = jnp.maximum(dot(last_frame, pw1_ref[:]), 0.0).astype(cd)
            p = jnp.maximum(dot(p, pw2_ref[:]), 0.0).astype(cd)
            x1 = jnp.concatenate([p, context], axis=-1)
            h1, c1 = lstm(x1, h1, c1, awih_ref, awhh_ref, ab_ref)
            if variant in ("full", "noloc", "notanh"):
                pq = dot(h1, qk_ref[:])
                if variant == "noloc":
                    loc = jnp.zeros((Bk, T, pq.shape[-1]), jnp.float32)
                else:
                    loc = (jax.lax.dot_general(
                               align.astype(cd), kba_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
                           + jax.lax.dot_general(
                               cum.astype(cd), kbc_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32))
                e_in = pq[:, None, :] + piv.astype(jnp.float32) + loc
                if variant != "notanh":
                    e_in = jnp.tanh(e_in)
                energies = jnp.sum(
                    e_in * v_ref[:].astype(jnp.float32)[None, None], axis=-1)
                energies = jnp.where(maskf > 0, energies, jnp.float32(-1e9))
                align_new = jax.nn.softmax(energies, axis=-1)
                cum = cum + align_new
                context = jnp.sum(align_new[:, :, None].astype(cd) * encv,
                                  axis=1).astype(cd)
            else:  # "noattn"
                align_new = align
            x2 = jnp.concatenate([h1, context], axis=-1)
            h2, c2 = lstm(x2, h2, c2, dwih_ref, dwhh_ref, db_ref)
            proj_in = jnp.concatenate([h2, context], axis=-1)
            frames_full = dot(proj_in, projw_ref[:]) \
                + projb_ref[:].astype(jnp.float32)
            frames = frames_full[:, : R * n_mels]
            last_frame = frames[:, -n_mels:].astype(cd)
            frames_ref[pl.ds(step, 1)] = frames[None]
            return (h1, c1, h2, c2, context, align_new, cum, last_frame)

        carry0 = (jnp.zeros((Bk, H), cd), jnp.zeros((Bk, H), cd),
                  jnp.zeros((Bk, H), cd), jnp.zeros((Bk, H), cd),
                  jnp.zeros((Bk, enc_ref.shape[2]), cd),
                  jnp.zeros((Bk, T), jnp.float32),
                  jnp.zeros((Bk, T), jnp.float32),
                  jnp.zeros((Bk, n_mels), cd))
        jax.lax.fori_loop(0, STEPS, body, carry0, unroll=False)

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def run():
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((STEPS, B, R * n_mels),
                                           jnp.float32),
            in_specs=[vm()] * 19,
            out_specs=vm(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(enc, pi, mask.astype(jnp.float32), *ops)
        return out.sum()

    return run


def main():
    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(num_chars=128, r=R)
    v = taco.init({"params": rng, "dropout": rng},
                  jnp.zeros((2, T_TEXT), jnp.int32),
                  jnp.full((2,), T_TEXT, jnp.int32),
                  jnp.zeros((2, STEPS * R, 80)),
                  jnp.full((2,), STEPS * R, jnp.int32))
    enc = jax.random.normal(rng, (B, T_TEXT, 512)) * 0.1
    pi = jax.random.normal(rng, (B, T_TEXT, 128)) * 0.1
    mask = jnp.ones((B, T_TEXT), bool)
    packed = pack_decoder_params(v["params"], t_in=T_TEXT)
    for variant in ["full", "noloc", "notanh", "noattn"]:
        timeit(make(variant, enc, pi, mask, packed), (),
               name=f"kernel variant={variant}")


if __name__ == "__main__":
    main()
