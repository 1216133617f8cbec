"""Pallas TPU kernel: whole Tacotron2 autoregressive decode in one kernel.

The scan-based decode is op-latency-bound: each of the ~124 sequential steps
issues ~15 small XLA ops (two LSTM cells, location attention, projections),
costing ~55 us/step at batch 64 while the arithmetic needs <10 us. This
kernel runs the ENTIRE decode loop inside one pallas_call with every weight
resident in VMEM (v5e has ~128 MB — measured, not the 16 MB of older
generations), eliminating per-step dispatch and weight re-fetch.

Decisions specific to the kernel:
- the location-sensitive conv (k=31 over the text axis) is folded together
  with location_dense into two banded (T, T, A) matrices, turning the
  conv+dense into one MXU contraction per alignment channel;
- the energy reduction (.. @ v) runs as a VPU lane-reduce to avoid a
  (B*T, 1) -> (B, T) relayout;
- softmax in f32; LSTM gates accumulate in f32 regardless of compute dtype.

Inference-only (eval semantics: no dropout — the reference's prenet dropout
is training-gated, common_layers.py:75-82). Exactness vs the flax scan
decode: tests/test_fused_decode.py.

≙ /root/reference/TTS/tts/layers/tacotron2.py:335-374 (greedy decode loop).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(steps: int, r: int, n_mels: int, H: int, compute_dtype,
                 energy_dtype=jnp.float32, two_stage: bool = False):
    def kernel(enc_ref, pi_ref, mask_ref,
               pw1_ref, pw2_ref,
               aw_ref, ab_ref,
               qk_ref, kb_ref, ld_ref, v_ref,
               dw_ref, db_ref,
               projw_ref, projb_ref, stopw_ref, stopb_ref,
               frames_ref, stop_ref, align_ref):
        B, T, D = enc_ref.shape
        cd = compute_dtype

        enc = enc_ref[:].astype(cd)            # (B, T, D)
        pi = pi_ref[:].astype(cd)              # (B, T, A)
        neg = jnp.float32(-1e9)
        maskf = mask_ref[:]                    # (B, T) 1/0 f32

        def dot(a, b):
            return jnp.dot(a.astype(cd), b.astype(cd),
                           preferred_element_type=jnp.float32)

        def lstm(x, h, c, w_ref, b_ref):
            # single fused matmul over concat([x, h]) — halves MXU op count
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
            # prenet (bias-free, relu; eval -> no dropout)
            p = jnp.maximum(dot(last_frame, pw1_ref[:]), 0.0).astype(cd)
            p = jnp.maximum(dot(p, pw2_ref[:]), 0.0).astype(cd)
            # attention LSTM
            x1 = jnp.concatenate([p, context], axis=-1)
            h1, c1 = lstm(x1, h1, c1, aw_ref, ab_ref)
            # location attention: banded conv+dense fold
            pq = dot(h1, qk_ref[:])            # (B, A)
            ed = energy_dtype
            loc = jax.lax.dot_general(
                jnp.concatenate([align, cum], axis=-1).astype(cd),
                kb_ref[:].astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (B,T,A) or (B,T,F)
            if two_stage:
                # MEASURED NEGATIVE (2026-08-21, profile_decode_twostage):
                # kb carries only the banded location CONV (T*F columns);
                # location_dense applied as a second contraction — ~2.7x
                # fewer MACs than the folded (2T, T*A) band. CPU-exact
                # (interpret), but Mosaic REJECTS both device lowerings of
                # the second stage with 'infer-vector-layout: unsupported
                # shape cast': the (B*T, F) flatten and the 3-D
                # (B,T,F)x(F,A) dot_general both need a rank-collapse /
                # relayout of the F=32-lane intermediate it cannot express;
                # padding F to 128 lanes would erase the MAC savings.
                # Folded band stays the production path (59.9 us/step
                # baseline at B=128). Kept as the record.
                loc = jax.lax.dot_general(
                    loc.astype(cd), ld_ref[:],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            # (B,T,A); Mosaic
            # requires 32-bit matmul accumulators, so cast after the dot.
            # energy_dtype=bf16 was measured SLOWER than f32 at batch 128
            # (62.0 vs 59.2 us/step, scripts/profile_decode_energy.py):
            # Mosaic's packed-bf16 elementwise ops don't pay here. Kept as
            # the hook for future hardware; default f32 is bit-identical to
            # the original formulation.
            e_in = jnp.tanh((pq[:, None, :] + pi.astype(jnp.float32)
                             + loc).astype(ed))
            energies = jnp.sum(e_in * v_ref[:].astype(ed)[None, None],
                               axis=-1).astype(jnp.float32)  # (B, T)
            energies = jnp.where(maskf > 0, energies, neg)
            align_new = jax.nn.softmax(energies, axis=-1)   # f32
            cum = cum + align_new
            # context: VPU multiply-reduce — a batched (1,T)x(T,D) matmul
            # would serialize B tiny MXU ops
            context = jnp.sum(
                align_new[:, :, None].astype(cd) * enc, axis=1,
            ).astype(cd)
            # decoder LSTM
            x2 = jnp.concatenate([h1, context], axis=-1)
            h2, c2 = lstm(x2, h2, c2, dw_ref, db_ref)
            # projection + stop
            proj_in = jnp.concatenate([h2, context], axis=-1)
            frames_full = dot(proj_in, projw_ref[:]) \
                + projb_ref[:].astype(jnp.float32)          # (B, r_init*M)
            stop_in = jnp.concatenate(
                [h2.astype(jnp.float32), frames_full], axis=-1)
            stop = jnp.sum(stop_in * stopw_ref[:].astype(jnp.float32)[None],
                           axis=-1) + stopb_ref[0].astype(jnp.float32)
            frames = frames_full[:, : r * n_mels]
            last_frame = frames[:, -n_mels:].astype(cd)

            frames_ref[pl.ds(step, 1)] = frames[None].astype(frames_ref.dtype)
            stop_ref[pl.ds(step, 1)] = stop[None].astype(stop_ref.dtype)
            align_ref[pl.ds(step, 1)] = align_new[None].astype(align_ref.dtype)
            return (h1, c1, h2, c2, context, align_new, cum, last_frame)

        A = pi.shape[-1]
        carry0 = (
            jnp.zeros((B, H), cd), jnp.zeros((B, H), cd),
            jnp.zeros((B, H), cd), jnp.zeros((B, H), cd),
            jnp.zeros((B, D), cd),
            jnp.zeros((B, T), jnp.float32), jnp.zeros((B, T), jnp.float32),
            jnp.zeros((B, n_mels), cd),
        )
        jax.lax.fori_loop(0, steps, body, carry0, unroll=False)

    return kernel


def pack_decoder_params(params: Dict[str, Any], *, n_mels: int = 80,
                        t_in: int = 128, attn_dim: int = 128,
                        two_stage: bool = False):
    """Pack our Tacotron2 decoder param subtree (models/tacotron2.py names)
    into the kernel's operands; folds location_conv (+SAME banding) and
    location_dense into (T, T, A) matrices per alignment channel — or, with
    ``two_stage``, only the conv band (T, T, F) plus a separate
    location_dense operand (see _make_kernel)."""
    dec = params["decoder"]

    def lstm_pack(cell):
        wih = jnp.concatenate([cell[f"i{g}"]["kernel"] for g in "ifgo"], axis=1)
        whh = jnp.concatenate([cell[f"h{g}"]["kernel"] for g in "ifgo"], axis=1)
        b = jnp.concatenate([cell[f"h{g}"]["bias"] for g in "ifgo"])
        return jnp.concatenate([wih, whh], axis=0), b

    aw, ab = lstm_pack(dec["attention_rnn"])
    dw, db = lstm_pack(dec["decoder_rnn"])
    attn = dec["attention"]
    kloc = attn["location_conv"]["kernel"]      # (31, 2, F)
    ldense = attn["location_dense"]["kernel"]   # (F, A)
    k_eff = kloc if two_stage \
        else jnp.einsum("kcf,fa->kca", kloc, ldense)  # (31, 2, A|F)
    K = kloc.shape[0]
    half = (K - 1) // 2
    # flax SAME conv: out[s] = sum_tap in[s + tap - half] * k[tap]; input
    # position t contributes to output s via tap = t - s + half
    sel = (np.arange(K)[:, None, None]
           == (np.arange(t_in)[None, :, None]
               - np.arange(t_in)[None, None, :] + half)).astype(np.float32)
    kb = jnp.einsum("kca,kts->ctsa", k_eff, jnp.asarray(sel))  # (2,T,T,A|F)
    # stack the two alignment channels on the contraction axis: one banded
    # matmul over concat([align, cum])
    kb = jnp.concatenate([kb[0], kb[1]], axis=0)  # (2T, T, A|F)
    prenet = dec["prenet"]
    extra = {"ld": ldense} if two_stage \
        else {"ld": jnp.zeros((1, 1), ldense.dtype)}
    return dict(
        **extra,
        pw1=prenet["linear_0"]["kernel"], pw2=prenet["linear_1"]["kernel"],
        aw=aw, ab=ab,
        qk=attn["query_layer"]["kernel"],
        kb=kb,
        v=attn["v"]["kernel"][:, 0],
        dw=dw, db=db,
        projw=dec["linear_projection"]["kernel"],
        projb=dec["linear_projection"]["bias"],
        stopw=dec["stopnet"]["linear"]["kernel"][:, 0],
        stopb=dec["stopnet"]["linear"]["bias"],
    )


@functools.partial(jax.jit, static_argnames=("steps", "r", "n_mels",
                                             "compute_dtype", "energy_dtype",
                                             "two_stage", "interpret"))
def fused_decode(enc: jnp.ndarray, processed_inputs: jnp.ndarray,
                 mask: jnp.ndarray, packed: Dict[str, jnp.ndarray],
                 steps: int, r: int, n_mels: int = 80,
                 compute_dtype=jnp.bfloat16, energy_dtype=jnp.float32,
                 two_stage: bool = False, interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """enc (B, T, D), processed_inputs (B, T, A), mask (B, T) ->
    (frames (steps, B, r*n_mels), stop (steps, B), align (steps, B, T)).
    ``two_stage`` must match the pack_decoder_params flag."""
    B, T, D = enc.shape
    H = packed["ab"].shape[0] // 4
    # cast the large operands BEFORE the call: VMEM blocks hold the array's
    # own dtype, so f32 inputs would double the resident footprint (the f32
    # variant overflows the 128 MB VMEM)
    big = {"pw1", "pw2", "aw", "qk", "kb", "ld", "dw", "projw"}
    enc = enc.astype(compute_dtype)
    processed_inputs = processed_inputs.astype(compute_dtype)
    names = ["pw1", "pw2", "aw", "ab", "qk", "kb", "ld", "v",
             "dw", "db", "projw", "projb", "stopw", "stopb"]
    dummy_ld = jnp.zeros((1, 1), jnp.float32)
    ops = [(packed.get(n, dummy_ld)).astype(compute_dtype) if n in big
           else packed[n] for n in names]
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((steps, B, r * n_mels), jnp.float32),
        jax.ShapeDtypeStruct((steps, B), jnp.float32),
        jax.ShapeDtypeStruct((steps, B, T), jnp.float32),
    )
    return pl.pallas_call(
        _make_kernel(steps, r, n_mels, H, compute_dtype,
                     energy_dtype=energy_dtype, two_stage=two_stage),
        out_shape=out_shapes,
        in_specs=[vm()] * (3 + len(ops)),
        out_specs=(vm(), vm(), vm()),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(enc, processed_inputs, mask.astype(jnp.float32), *ops)
