"""Pallas TPU megakernel: the ENTIRE Glow-TTS transformer encoder.

Why: the encoder is HBM-bandwidth-bound under XLA — every sublayer reads and
writes the full (B, T, C) activation (FFN alone moves ~125 MB/batch; each
block measured ~2.5x its FLOP roofline, scripts/profile_glow_encoder3.py;
whole encoder 2.37 ms true vs ~0.67 ms roofline at B=128, T=128). Per item
the working set is ~100 KB and ALL weights are ~10.6 MB — this kernel keeps
both VMEM-resident: one HBM read of the embeddings, one write of
(means | log-scales | log-durations).

Batching: T=128 per item is too little matmul work to hide per-dot
overheads (the vocoder megakernel's measured lesson), so ITEMS_PER_BLOCK
items are stacked along sublanes — every matmul runs at M = ipb*T rows.
Attention keeps items separate with a block-diagonal mask (cross-item
scores forced to -1e4 pre-softmax; the extra cross-item score FLOPs are
~1% of the total). Per-item conv time-shifts are global sublane shifts
followed by a boundary-row mask (rows crossing an item boundary zero —
exactly SAME-padding semantics since conv inputs are pre-masked).

Relative-position attention (window W=4) runs gather-free: the key-side
band adds shift(QE[:, r]) onto score diagonals via iota masks; the
value-side term extracts the 2W+1 score diagonals into (M, 2W+1) and
multiplies by emb_rel_v — both exactly reproduce the zero-outside-window
reference semantics (/root/reference/TTS/tts/layers/glow_tts/
transformer.py:9-227; model twin models/glow/transformer.py).

Eval-mode only (dropout off) — the serving path. Exactness vs
GlowTTSEncoder.apply(train=False): tests/test_fused_glow_encoder.py.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

REL_W = 4  # rel_attn_window_size the kernel supports (the reference default)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _conv_w(kernel, dtype):
    """flax Conv kernel (k, C_in, C_out) -> (k*C_in, C_out) for the
    lane-concat tap operand [x_{t-h}; ...; x_{t+h}]."""
    k = np.asarray(kernel)
    return jnp.asarray(k.reshape(-1, k.shape[-1]), dtype)


def pack_glow_encoder_params(enc, params: Dict[str, Any],
                             dtype=jnp.float32) -> Tuple[Array, ...]:
    """Flatten a GlowTTSEncoder (transformer type) param tree into the
    kernel's operand tuple. Order must match _make_kernel's consumption."""
    assert enc.encoder_type == "transformer"
    assert enc.rel_attn_window_size == REL_W
    p = params
    ops = []
    if enc.use_prenet:
        pre = p["prenet"]
        for i in range(3):
            ops += [_conv_w(pre[f"conv_{i}"]["kernel"], dtype),
                    jnp.asarray(pre[f"conv_{i}"]["bias"], dtype),
                    jnp.asarray(pre[f"ln_{i}"]["scale"], dtype),
                    jnp.asarray(pre[f"ln_{i}"]["bias"], dtype)]
        ops += [_conv_w(pre["proj"]["kernel"], dtype),
                jnp.asarray(pre["proj"]["bias"], dtype)]
    tr = p["encoder"]
    for i in range(enc.num_layers):
        at = tr[f"attn_{i}"]
        for name in ("q", "k", "v"):
            ops += [jnp.asarray(at[name]["kernel"], dtype),
                    jnp.asarray(at[name]["bias"], dtype)]
        ops += [jnp.asarray(at["emb_rel_k"], dtype),      # (2W+1, k_ch)
                jnp.asarray(at["emb_rel_v"], dtype),
                jnp.asarray(at["out"]["kernel"], dtype),
                jnp.asarray(at["out"]["bias"], dtype),
                jnp.asarray(tr[f"ln1_{i}"]["scale"], dtype),
                jnp.asarray(tr[f"ln1_{i}"]["bias"], dtype),
                _conv_w(tr[f"ffn_{i}"]["conv1"]["kernel"], dtype),
                jnp.asarray(tr[f"ffn_{i}"]["conv1"]["bias"], dtype),
                _conv_w(tr[f"ffn_{i}"]["conv2"]["kernel"], dtype),
                jnp.asarray(tr[f"ffn_{i}"]["conv2"]["bias"], dtype),
                jnp.asarray(tr[f"ln2_{i}"]["scale"], dtype),
                jnp.asarray(tr[f"ln2_{i}"]["bias"], dtype)]
    ops += [_conv_w(p["proj_mean"]["kernel"], dtype),
            jnp.asarray(p["proj_mean"]["bias"], dtype)]
    if not enc.mean_only:
        ops += [_conv_w(p["proj_scale"]["kernel"], dtype),
                jnp.asarray(p["proj_scale"]["bias"], dtype)]
    dp = p["duration_predictor"]
    ops += [_conv_w(dp["conv1"]["kernel"], dtype),
            jnp.asarray(dp["conv1"]["bias"], dtype),
            jnp.asarray(dp["ln1"]["scale"], dtype),
            jnp.asarray(dp["ln1"]["bias"], dtype),
            _conv_w(dp["conv2"]["kernel"], dtype),
            jnp.asarray(dp["conv2"]["bias"], dtype),
            jnp.asarray(dp["ln2"]["scale"], dtype),
            jnp.asarray(dp["ln2"]["bias"], dtype),
            _conv_w(dp["proj"]["kernel"], dtype),
            jnp.asarray(dp["proj"]["bias"], dtype)]
    return tuple(ops)


# ---------------------------------------------------------------------------
# kernel building blocks — all on (M = ipb*T, ·) values
# ---------------------------------------------------------------------------

def _dot(a, w_ref, b_ref=None, md=jnp.float32):
    out = jnp.dot(a.astype(md), w_ref[...].astype(md),
                  preferred_element_type=jnp.float32)
    if b_ref is not None:
        out = out + b_ref[...].astype(jnp.float32)[None, :]
    return out


def _shift_rows(x, d: int, T: int):
    """x (M, C) shifted by d rows (time) with per-item zero boundaries:
    out[m] = x[m - d] when (m - d) is in the same T-row item block, else 0."""
    M = x.shape[0]
    if d == 0:
        return x
    z = jnp.zeros((abs(d), x.shape[1]), x.dtype)
    if d > 0:
        y = jnp.concatenate([z, x[:M - d]], axis=0)
        keep = (jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % T) >= d
    else:
        y = jnp.concatenate([x[-d:], z], axis=0)
        keep = (jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % T) < T + d
    return jnp.where(keep, y, 0.0)


def _conv_op(x, k: int, T: int):
    """Lane-concat tap operand (M, k*C) for a SAME conv of width k."""
    h = k // 2
    taps = [_shift_rows(x, h - j, T) for j in range(k)]
    return jnp.concatenate(taps, axis=1)


def _layernorm(x, scale_ref, bias_ref, eps=1e-4):
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * scale_ref[...][None, :] + bias_ref[...][None, :]


def _make_kernel(enc, T: int, ipb: int, num_layers: int, num_heads: int,
                 hidden: int, filt: int, ffn_k: int, md,
                 att_group: int = 2):
    C = hidden
    M = ipb * T
    k_ch = C // num_heads
    W = REL_W
    mean_only = enc.mean_only
    use_prenet = enc.use_prenet
    att_group = min(att_group, ipb)
    G = att_group * T            # attention runs on G-row groups
    n_groups = ipb // att_group

    def kernel(x_ref, m_ref, *refs):
        w, out_ref = refs[:-1], refs[-1]
        idx = [0]

        def nxt(n=1):
            i = idx[0]
            idx[0] += n
            return w[i] if n == 1 else w[i:i + n]

        x = x_ref[...].reshape(M, C).astype(jnp.float32)
        m = m_ref[...].reshape(M, 1).astype(jnp.float32)

        # ---- prenet: 3x [conv5 -> LN -> relu] + zero-init residual proj
        if use_prenet:
            y = x
            for _ in range(3):
                cw, cb, ls, lb = nxt(4)
                y = _dot(_conv_op(y * m, 5, T), cw, cb, md)
                y = jnp.maximum(_layernorm(y, ls, lb), 0.0)
            pw, pb = nxt(2)
            x = (x + _dot(y, pw, pb, md)) * m

        # ---- attention constants, built ONCE: (G, G) relative-band masks
        # (rel offset r AND same item) and the same-item mask
        row_i = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        same_item = (row_i // T) == (col_i // T)
        rel_off = col_i - row_i
        band_masks = [((rel_off == r) & same_item).astype(jnp.float32)
                      for r in range(-W, W + 1)]

        inv_sqrt = 1.0 / math.sqrt(k_ch)

        for _ in range(num_layers):
            wq, bq, wk, bk, wv, bv = nxt(6)
            erk, erv, wo, bo, l1s, l1b = nxt(6)
            f1w, f1b, f2w, f2b, l2s, l2b = nxt(6)

            xin = x * m
            q = _dot(xin, wq, bq, md)
            k_ = _dot(xin, wk, bk, md)
            v = _dot(xin, wv, bv, md)

            head_outs = []
            for h in range(num_heads):
                sl = slice(h * k_ch, (h + 1) * k_ch)
                # stacked relative-key projection for ALL rows: (M, 2W+1)
                qe = jnp.dot(q[:, sl].astype(md),
                             jnp.transpose(erk[...]).astype(md),
                             preferred_element_type=jnp.float32) * inv_sqrt
                outs = []
                band_sums = []
                for gidx in range(n_groups):
                    gs = slice(gidx * G, (gidx + 1) * G)
                    qh, kh, vh = q[gs, sl], k_[gs, sl], v[gs, sl]
                    scores = jnp.dot(qh.astype(md),
                                     jnp.transpose(kh).astype(md),
                                     preferred_element_type=jnp.float32
                                     ) * inv_sqrt
                    qe_g = qe[gs]
                    for r in range(2 * W + 1):
                        scores = scores + band_masks[r] * qe_g[:, r][:, None]
                    # mask: same item AND valid key column
                    kv = (m[gs, 0] > 0.0)[None, :]
                    ok = same_item & kv
                    scores = jnp.where(ok, scores, -1e4)
                    p = jax.nn.softmax(scores, axis=-1)
                    outs.append(jnp.dot(p.astype(md), vh.astype(md),
                                        preferred_element_type=jnp.float32))
                    # extract the 2W+1 diagonals of p for the value-side band
                    band_sums.append(jnp.stack(
                        [jnp.sum(band_masks[r] * p, axis=1)
                         for r in range(2 * W + 1)], axis=1))
                oh = jnp.concatenate(outs, axis=0)          # (M, k_ch)
                bs = jnp.concatenate(band_sums, axis=0)     # (M, 2W+1)
                oh = oh + jnp.dot(bs.astype(md), erv[...].astype(md),
                                  preferred_element_type=jnp.float32)
                head_outs.append(oh)
            att = _dot(jnp.concatenate(head_outs, axis=1), wo, bo, md)
            x = _layernorm(x + att, l1s, l1b)

            # FFN: conv(k) -> relu -> conv(k)
            y = _dot(_conv_op(x * m, ffn_k, T), f1w, f1b, md)
            y = jnp.maximum(y, 0.0)
            y = _dot(_conv_op(y * m, ffn_k, T), f2w, f2b, md)
            y = y * m
            x = _layernorm(x + y, l2s, l2b)
        x = x * m

        pmw, pmb = nxt(2)
        o_mean = _dot(x, pmw, pmb, md) * m
        if mean_only:
            o_scale = jnp.zeros_like(o_mean)
        else:
            psw, psb = nxt(2)
            o_scale = _dot(x, psw, psb, md) * m

        # duration predictor (stop_gradient is a no-op at inference)
        d1w, d1b, d1s, d1bb = nxt(4)
        d2w, d2b, d2s, d2bb = nxt(4)
        dpw, dpb = nxt(2)
        y = _dot(_conv_op(x * m, 3, T), d1w, d1b, md)
        y = _layernorm(jnp.maximum(y, 0.0), d1s, d1bb)
        y = _dot(_conv_op(y * m, 3, T), d2w, d2b, md)
        y = _layernorm(jnp.maximum(y, 0.0), d2s, d2bb)
        dur = _dot(y * m, dpw, dpb, md) * m               # (M, 1)

        n_out = o_mean.shape[1]
        out = jnp.concatenate([o_mean, o_scale, dur], axis=1)
        out_ref[...] = out.reshape(ipb, T, 2 * n_out + 1
                                   ).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "enc", "ipb", "att_group", "matmul_dtype", "interpret"))
def _fused_encoder(x_emb: Array, mask: Array, weights, enc, ipb: int,
                   att_group: int = 2, matmul_dtype=jnp.float32,
                   interpret: bool = False):
    B, T, C = x_emb.shape
    assert B % ipb == 0, (B, ipb)
    n_out = enc.out_channels
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(enc, T, ipb, enc.num_layers, enc.num_heads, C,
                     enc.filter_channels, enc.kernel_size, matmul_dtype,
                     att_group=att_group),
        out_shape=jax.ShapeDtypeStruct((B, T, 2 * n_out + 1), jnp.float32),
        grid=(B // ipb,),
        in_specs=[pl.BlockSpec((ipb, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ipb, T, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [full(w) for w in weights],
        out_specs=pl.BlockSpec((ipb, T, 2 * n_out + 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x_emb, mask, *weights)


def fused_glow_encoder_apply(enc, params: Dict[str, Any], packed,
                             text: Array, text_lengths: Array,
                             ipb: int = 8, att_group: int = 2,
                             matmul_dtype=jnp.float32,
                             interpret: bool = False):
    """Drop-in eval-mode replacement for ``GlowTTSEncoder.apply``
    (single-speaker transformer type): returns (o_mean, o_log_scale,
    o_dur_log, x_mask) like the flax module. Embedding lookup and the
    sqrt(C) scale run in XLA (a gather); everything else in one kernel."""
    from tts_tpu.ops.masking import sequence_mask
    B, T = text.shape
    emb = jnp.take(jnp.asarray(params["emb"]["embedding"]), text, axis=0)
    emb = emb * math.sqrt(enc.hidden_channels)
    mask = sequence_mask(text_lengths, T).astype(jnp.float32)[..., None]
    ipb = min(ipb, B)
    while B % ipb:
        ipb -= 1
    while ipb % att_group:
        att_group -= 1
    out = _fused_encoder(emb, mask, packed, enc, ipb, att_group=att_group,
                         matmul_dtype=matmul_dtype, interpret=interpret)
    n = enc.out_channels
    return out[..., :n], out[..., n:2 * n], out[..., 2 * n:], mask
