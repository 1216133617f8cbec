"""Context multiply-reduce restructure probe for the fused Tacotron2 decode
kernel (VERDICT r3 item 7: the 10.3 us/step context block is the
second-largest ablated cost at B=128; try moving it onto the MXU).

Arithmetic: context[b,d] = sum_t align[b,t] * enc[b,t,d] — a per-item
matvec. The VPU multiply-reduce needs B*T*D MACs (128*128*512 = 8.4M,
~8 us at the ~2e12 op/s VPU rate: the 10.3 us measured is already NEAR
THE VPU ROOFLINE). Exact MXU alternatives either batch tiny (1,T)x(T,D)
dots (M=1 sublane utilization) or pay >=B x the FLOPs (block-diagonal /
all-pairs forms). Variants timed here, same full-kernel loop otherwise:

  mulred  — production: jnp.sum(align[:,:,None] * enc, axis=1) on the VPU
  dotb    — batched dot_general over B: (B,1,T) x (B,T,D)
  twostep — product reshaped (B, T/8, 8*D)?? no: split-T tree reduce:
            sum over 2 halves of T then add (VPU, tests reassociation)
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tts_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

STEPS, R, M = 124, 2, 80
B, T, D, A, H = 128, 128, 512, 128, 1024
PRENET = 256


def timeit(fn, *args, iters=20):
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def make_kernel(ctx_impl):
    cd = jnp.bfloat16

    def kernel(enc_ref, pi_ref, mask_ref, pw1_ref, pw2_ref, aw_ref, ab_ref,
               qk_ref, kb_ref, v_ref, dw_ref, db_ref, projw_ref, projb_ref,
               stopw_ref, stopb_ref, frames_ref, stop_ref, align_ref):
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
            new_h = o * jnp.tanh(new_c)
            return new_h.astype(cd), new_c.astype(cd)

        def body(step, carry):
            (h1, c1, h2, c2, context, align, cum, last_frame) = carry
            p = jnp.maximum(dot(last_frame, pw1_ref[:]), 0.0).astype(cd)
            p = jnp.maximum(dot(p, pw2_ref[:]), 0.0).astype(cd)
            x1 = jnp.concatenate([p, context], axis=-1)
            h1, c1 = lstm(x1, h1, c1, aw_ref, ab_ref)
            pq = dot(h1, qk_ref[:])
            loc = jax.lax.dot_general(
                jnp.concatenate([align, cum], axis=-1).astype(cd),
                kb_ref[:].astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            e_in = jnp.tanh(pq[:, None, :] + pi.astype(jnp.float32) + loc)
            energies = jnp.sum(e_in * v_ref[:].astype(jnp.float32)[None, None],
                               axis=-1).astype(jnp.float32)
            energies = jnp.where(maskf > 0, energies, neg)
            align_new = jax.nn.softmax(energies, axis=-1)
            cum = cum + align_new
            if ctx_impl == "mulred":
                context = jnp.sum(
                    align_new[:, :, None].astype(cd) * enc, axis=1).astype(cd)
            elif ctx_impl == "dotb":
                context = jax.lax.dot_general(
                    align_new[:, None, :].astype(cd), enc,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :].astype(cd)
            elif ctx_impl == "twostep":
                half = T // 2
                prod = align_new[:, :, None].astype(cd) * enc
                context = (jnp.sum(prod[:, :half], axis=1)
                           + jnp.sum(prod[:, half:], axis=1)).astype(cd)
            x2 = jnp.concatenate([h1, context], axis=-1)
            h2, c2 = lstm(x2, h2, c2, dw_ref, db_ref)
            proj_in = jnp.concatenate([h2, context], axis=-1)
            frames_full = dot(proj_in, projw_ref[:]) \
                + projb_ref[:].astype(jnp.float32)
            stop_in = jnp.concatenate(
                [h2.astype(jnp.float32), frames_full], axis=-1)
            stop = jnp.sum(stop_in * stopw_ref[:].astype(jnp.float32)[None],
                           axis=-1) + stopb_ref[0].astype(jnp.float32)
            frames = frames_full[:, : R * M]
            last_frame = frames[:, -M:].astype(cd)
            frames_ref[pl.ds(step, 1)] = frames[None].astype(frames_ref.dtype)
            stop_ref[pl.ds(step, 1)] = stop[None].astype(stop_ref.dtype)
            align_ref[pl.ds(step, 1)] = align_new[None].astype(align_ref.dtype)
            return (h1, c1, h2, c2, context, align_new, cum, last_frame)

        carry0 = (
            jnp.zeros((B, H), cd), jnp.zeros((B, H), cd),
            jnp.zeros((B, H), cd), jnp.zeros((B, H), cd),
            jnp.zeros((B, D), cd),
            jnp.zeros((B, T), jnp.float32), jnp.zeros((B, T), jnp.float32),
            jnp.zeros((B, M), cd),
        )
        jax.lax.fori_loop(0, STEPS, body, carry0, unroll=False)

    return kernel


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 16)
    cd = jnp.bfloat16
    r_init = 7
    ops = dict(
        enc=jax.random.normal(ks[0], (B, T, D), cd) * 0.1,
        pi=jax.random.normal(ks[1], (B, T, A), cd) * 0.1,
        mask=jnp.ones((B, T), jnp.float32),
        pw1=jax.random.normal(ks[2], (M, PRENET), cd) * 0.05,
        pw2=jax.random.normal(ks[3], (PRENET, PRENET), cd) * 0.05,
        aw=jax.random.normal(ks[4], (PRENET + D + H, 4 * H), cd) * 0.02,
        ab=jnp.zeros((4 * H,), jnp.float32),
        qk=jax.random.normal(ks[5], (H, A), cd) * 0.05,
        kb=jax.random.normal(ks[6], (2 * T, T, A), cd) * 0.02,
        v=jax.random.normal(ks[7], (A,), jnp.float32) * 0.05,
        dw=jax.random.normal(ks[8], (H + D + H, 4 * H), cd) * 0.02,
        db=jnp.zeros((4 * H,), jnp.float32),
        projw=jax.random.normal(ks[9], (H + D, r_init * M), cd) * 0.05,
        projb=jnp.zeros((r_init * M,), jnp.float32),
        stopw=jax.random.normal(ks[10], (H + r_init * M,), jnp.float32) * 0.05,
        stopb=jnp.zeros((1,), jnp.float32),
    )
    names = list(ops)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((STEPS, B, R * M), jnp.float32),
        jax.ShapeDtypeStruct((STEPS, B), jnp.float32),
        jax.ShapeDtypeStruct((STEPS, B, T), jnp.float32),
    )
    base_out = None
    for impl in ("mulred", "dotb", "twostep"):
        try:
            call = pl.pallas_call(
                make_kernel(impl),
                out_shape=out_shapes,
                in_specs=[vm()] * len(names),
                out_specs=(vm(), vm(), vm()),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024))

            @jax.jit
            def run():
                f, s, a = call(*[ops[n] for n in names])
                return f.sum() + s.sum()

            dt = timeit(run)
            out = run()
            tag = ""
            if base_out is None:
                base_out = float(out)
            else:
                tag = f"  (checksum diff {abs(float(out) - base_out):.2e})"
            print(f"{impl:8s}: {dt*1e3:7.3f} ms "
                  f"({dt/STEPS*1e6:6.2f} us/step){tag}", flush=True)
        except Exception as e:
            print(f"{impl:8s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
