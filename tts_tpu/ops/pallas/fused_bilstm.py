"""Pallas TPU kernel: bidirectional LSTM with weights VMEM-resident.

The encoder BiLSTM is a 2x T-step flax scan; at serving geometry its
arithmetic is ~0.3 ms but the scan dispatch costs ~1.1 ms. This kernel runs
both directions inside one fori_loop (weights stay in VMEM; one fused
concat([x, h]) matmul per direction per step).

Ragged reversal is handled OUTSIDE (ops-level flip_sequences, one XLA
gather each way), so the kernel only ever scans forward:
    fwd = scan(x);  bwd = flip_back(scan(flip(x, lengths)), lengths)
matching flax nn.Bidirectional(..., seq_lengths=...) exactly —
tests/test_fused_bilstm.py.

≙ the packed-sequence BiLSTM in the reference encoder
(/root/reference/TTS/tts/layers/tacotron2.py:75-121).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def flip_sequences(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse the first `lengths[b]` steps of x[b]; padding stays in place
    (flax nn.recurrent.flip_sequences semantics)."""
    B, T = x.shape[0], x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.mod(lengths[:, None] - 1 - t, T)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _make_kernel(H: int, compute_dtype):
    def kernel(x_ref, xr_ref, wf_ref, bf_ref, wb_ref, bb_ref,
               of_ref, ob_ref):
        # time-major (T, B, C): per-step slices are on the leading (tile)
        # dim — dynamic sublane indexing is not supported by Mosaic
        T, B, C = x_ref.shape
        cd = compute_dtype

        def cell(x_t, h, c, w_ref, b_ref):
            gates = jnp.dot(jnp.concatenate([x_t, h], axis=-1),
                            w_ref[:].astype(cd),
                            preferred_element_type=jnp.float32) \
                + b_ref[:].astype(jnp.float32)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            new_c = f * c + i * g
            return (o * jnp.tanh(new_c)).astype(cd), new_c.astype(cd)

        def body(t, carry):
            hf, cf, hb, cb = carry
            xf = x_ref[pl.ds(t, 1)][0].astype(cd)
            xb = xr_ref[pl.ds(t, 1)][0].astype(cd)
            hf, cf = cell(xf, hf, cf, wf_ref, bf_ref)
            hb, cb = cell(xb, hb, cb, wb_ref, bb_ref)
            of_ref[pl.ds(t, 1)] = hf[None].astype(of_ref.dtype)
            ob_ref[pl.ds(t, 1)] = hb[None].astype(ob_ref.dtype)
            return hf, cf, hb, cb

        carry0 = (jnp.zeros((B, H), cd), jnp.zeros((B, H), cd),
                  jnp.zeros((B, H), cd), jnp.zeros((B, H), cd))
        jax.lax.fori_loop(0, T, body, carry0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def fused_bilstm(x: jnp.ndarray, lengths: jnp.ndarray,
                 wf: jnp.ndarray, bf: jnp.ndarray,
                 wb: jnp.ndarray, bb: jnp.ndarray,
                 compute_dtype=jnp.bfloat16,
                 interpret: bool = False) -> jnp.ndarray:
    """x (B, T, C), packed weights (C+H, 4H)/(4H,) per direction ->
    (B, T, 2H), identical to flax Bidirectional with seq_lengths."""
    B, T, C = x.shape
    H = wf.shape[1] // 4
    xr = flip_sequences(x, lengths)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    xt = jnp.swapaxes(x, 0, 1).astype(compute_dtype)    # (T, B, C)
    xrt = jnp.swapaxes(xr, 0, 1).astype(compute_dtype)
    wf, wb = wf.astype(compute_dtype), wb.astype(compute_dtype)
    of, ob = pl.pallas_call(
        _make_kernel(H, compute_dtype),
        out_shape=(jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, H), jnp.float32)),
        in_specs=[vm()] * 6,
        out_specs=(vm(), vm()),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(xt, xrt, wf, bf, wb, bb)
    of = jnp.swapaxes(of, 0, 1)
    ob = jnp.swapaxes(ob, 0, 1)
    return jnp.concatenate([of, flip_sequences(ob, lengths)], axis=-1)


def pack_bilstm_params(enc_params: dict) -> Tuple[jnp.ndarray, ...]:
    """Pack Tacotron2Encoder's OptimizedLSTMCell_0/1 (fwd/bwd) into the
    kernel's fused (C+H, 4H) weights."""
    def lstm_pack(cell):
        wih = jnp.concatenate([cell[f"i{g}"]["kernel"] for g in "ifgo"], axis=1)
        whh = jnp.concatenate([cell[f"h{g}"]["kernel"] for g in "ifgo"], axis=1)
        b = jnp.concatenate([cell[f"h{g}"]["bias"] for g in "ifgo"])
        return jnp.concatenate([wih, whh], axis=0), b

    wf, bf = lstm_pack(enc_params["OptimizedLSTMCell_0"])
    wb, bb = lstm_pack(enc_params["OptimizedLSTMCell_1"])
    return wf, bf, wb, bb
