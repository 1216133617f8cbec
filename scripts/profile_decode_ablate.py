"""Attribution probe for the fused Tacotron2 decode kernel at batch 128:
time stage-ablated variants (wrong numerics, same loop structure) to find
where the ~20 us/step above the pure-matmul roofline goes.

Variants (cumulative ablations would confound; each removes ONE piece):
  full        — the real kernel
  no_energy   — skip loc matmul + tanh + reduce (alignment = stale)
  no_loc      — keep tanh+reduce on pq+pi only (removes the banded matmul)
  no_prenet   — feed last_frame zeros directly (removes 2 small matmuls)
  no_ctx      — skip the context multiply-reduce (context = stale)
  no_stop     — skip stopnet reduce
  no_writes   — skip per-step output writes (accumulate into carry)
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

STEPS, R, M = 124, 2, 80


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def make_kernel(H, ablate):
    cd = jnp.bfloat16

    def kernel(enc_ref, pi_ref, mask_ref, pw1_ref, pw2_ref, aw_ref, ab_ref,
               qk_ref, kb_ref, v_ref, dw_ref, db_ref, projw_ref, projb_ref,
               stopw_ref, stopb_ref, frames_ref, stop_ref, align_ref):
        B, T, D = enc_ref.shape
        enc = enc_ref[:].astype(cd)
        pi = pi_ref[:].astype(cd)
        neg = jnp.float32(-1e9)
        maskf = mask_ref[:]

        def dot(a, b):
            return jnp.dot(a.astype(cd), b.astype(cd),
                           preferred_element_type=jnp.float32)

        def lstm(x, h, c, w_ref, b_ref):
            gates = dot(jnp.concatenate([x, h], axis=-1), w_ref[:]) \
                + b_ref[:].astype(jnp.float32)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            new_c = f * c + i * g
            return (o * jnp.tanh(new_c)).astype(cd), new_c.astype(cd)

        def body(step, carry):
            (h1, c1, h2, c2, context, align, cum, last_frame, acc) = carry
            if ablate == "no_prenet":
                p = jnp.zeros((B, pw2_ref.shape[1]), cd)
            else:
                p = jnp.maximum(dot(last_frame, pw1_ref[:]), 0.0).astype(cd)
                p = jnp.maximum(dot(p, pw2_ref[:]), 0.0).astype(cd)
            x1 = jnp.concatenate([p, context], axis=-1)
            h1, c1 = lstm(x1, h1, c1, aw_ref, ab_ref)
            pq = dot(h1, qk_ref[:])
            if ablate == "no_energy":
                align_new = align
            else:
                if ablate == "no_loc":
                    e_in = jnp.tanh(pq[:, None, :] + pi.astype(jnp.float32))
                else:
                    loc = jax.lax.dot_general(
                        jnp.concatenate([align, cum], axis=-1).astype(cd),
                        kb_ref[:].astype(cd), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    e_in = jnp.tanh(pq[:, None, :] + pi.astype(jnp.float32)
                                    + loc)
                energies = jnp.sum(
                    e_in * v_ref[:].astype(jnp.float32)[None, None], axis=-1)
                energies = jnp.where(maskf > 0, energies, neg)
                align_new = jax.nn.softmax(energies, axis=-1)
            cum = cum + align_new
            if ablate != "no_ctx":
                context = jnp.sum(
                    align_new[:, :, None].astype(cd) * enc, axis=1).astype(cd)
            x2 = jnp.concatenate([h1, context], axis=-1)
            h2, c2 = lstm(x2, h2, c2, dw_ref, db_ref)
            proj_in = jnp.concatenate([h2, context], axis=-1)
            frames_full = dot(proj_in, projw_ref[:]) \
                + projb_ref[:].astype(jnp.float32)
            if ablate == "no_stop":
                stop = frames_full[:, 0]
            else:
                stop_in = jnp.concatenate(
                    [h2.astype(jnp.float32), frames_full], axis=-1)
                stop = jnp.sum(
                    stop_in * stopw_ref[:].astype(jnp.float32)[None],
                    axis=-1) + stopb_ref[0].astype(jnp.float32)
            frames = frames_full[:, : R * M]
            last_frame = frames[:, -M:].astype(cd)
            if ablate == "no_writes":
                acc = acc + frames
            else:
                frames_ref[pl.ds(step, 1)] = frames[None].astype(jnp.float32)
                stop_ref[pl.ds(step, 1)] = stop[None].astype(jnp.float32)
                align_ref[pl.ds(step, 1)] = align_new[None].astype(jnp.float32)
            return (h1, c1, h2, c2, context, align_new, cum, last_frame, acc)

        A = pi.shape[-1]
        carry0 = (jnp.zeros((B, H), cd), jnp.zeros((B, H), cd),
                  jnp.zeros((B, H), cd), jnp.zeros((B, H), cd),
                  jnp.zeros((B, D), cd),
                  jnp.zeros((B, T), jnp.float32), jnp.zeros((B, T), jnp.float32),
                  jnp.zeros((B, M), cd), jnp.zeros((B, R * M), jnp.float32))
        out = jax.lax.fori_loop(0, STEPS, body, carry0, unroll=False)
        if ablate == "no_writes":
            frames_ref[pl.ds(0, 1)] = out[-1][None]

    return kernel


def main():
    from tts_tpu.models.tacotron2 import Tacotron2
    from tts_tpu.infer.fast_decode import taco2_fused_encode
    from tts_tpu.ops.pallas.fused_taco2_decode import pack_decoder_params

    rng = jax.random.PRNGKey(0)
    B, T_TEXT = 128, 128
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
    H = packed["ab"].shape[0] // 4
    big = {"pw1", "pw2", "aw", "qk", "kb", "dw", "projw"}
    names = ["pw1", "pw2", "aw", "ab", "qk", "kb", "v",
             "dw", "db", "projw", "projb", "stopw", "stopb"]
    ops = [packed[n].astype(jnp.bfloat16) if n in big else packed[n]
           for n in names]
    enc16 = enc.astype(jnp.bfloat16)
    pi16 = pi.astype(jnp.bfloat16)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((STEPS, B, R * M), jnp.float32),
                  jax.ShapeDtypeStruct((STEPS, B), jnp.float32),
                  jax.ShapeDtypeStruct((STEPS, B, T_TEXT), jnp.float32))

    def build(ablate):
        @jax.jit
        def run(enc, pi, mask, *ops):
            o = pl.pallas_call(
                make_kernel(H, ablate), out_shape=out_shapes,
                in_specs=[vm()] * (3 + len(ops)), out_specs=(vm(),) * 3,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )(enc, pi, mask.astype(jnp.float32), *ops)
            return o[0].sum()
        return run

    base = None
    for ablate in ["full", "no_energy", "no_loc", "no_prenet", "no_ctx",
                   "no_stop", "no_writes"]:
        t = timeit(build(ablate), enc16, pi16, mask, *ops)
        extra = "" if base is None else f"  (saves {(base-t)*1e6/STEPS:5.1f} us/step)"
        if base is None:
            base = t
        print(f"{ablate:10s}: {t*1e3:7.3f} ms  {t/STEPS*1e6:5.1f} us/step{extra}")


if __name__ == "__main__":
    main()
