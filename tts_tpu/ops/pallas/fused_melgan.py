"""Pallas TPU megakernel: the ENTIRE MelGAN-family generator in one kernel.

The fused serving path (models/vocoder/serving.py) already runs each
residual stack as one Pallas kernel, but between stages the upsample
transposed-convs and the proj_in/proj_out heads run as XLA convs — each a
full HBM round trip over activations that grow to ~200 MB per batch at the
final rate (measured ~1.7 ms upsamples + ~0.4 ms proj_out of the 6.0 ms
batch-64 Multiband-MelGAN forward). This kernel runs proj_in, every
[upsample -> residual stack] stage, and the proj_out head for one batch item
with ALL weights and activations VMEM-resident (v5e VMEM is 128 MB; the
whole generator is <4 MB of weights and <12 MB of peak activations at
T_mel=252): one HBM read of the mel, one write of the waveform/subbands.

Upsampling runs as a POLYPHASE matmul instead of a transposed conv: for
stride f and kernel 2f (the MelGAN geometry, ≙ reference
melgan_generator.py:47-53 ConvTranspose1d(2*f, stride=f)), output phase p of
frame u taps exactly two inputs {x[u-1], x[u]} (p < f/2) or {x[u], x[u+1]}
(p >= f/2) — derived from lax.conv_transpose SAME padding pad_a = 3f/2 - 1.
Phases pack into two dense (f/2*C_out, 2C_in) matmuls with zero wasted MACs.

Layout — PHASE-BLOCK lanes: Mosaic cannot lane-interleave (C, T, f) ->
(C, T*f), so activations never hold true time order inside the kernel.
A stage running at P phases above the mel frame rate is stored (C, P*T0)
with lane index = block*T0 + frame; a static table sigma maps storage block
-> true phase. Upsample outputs assemble by lane-concatenating the per-phase
sublane slices of the matmul result (sigma composes as
sigma'[q*P + p] = sigma[p]*f + q); true-time shifts for the dilated/proj
convs become per-block gathers with edge columns resolved through sigma.
The single phase->time interleave happens ONCE, outside the kernel, as an
XLA gather+transpose over the final (B, C_out, P, T0).

Exactness: element-wise identical (up to matmul precision) to
``generator.apply`` on the folded (use_weight_norm=False) params —
tests/test_fused_melgan.py. Reference semantics:
/root/reference/TTS/vocoder/models/melgan_generator.py:30-70.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tts_tpu.ops.pallas.fused_resstack import _leaky, pack_stack_params

Array = jnp.ndarray


def compose_phase_order(sigma: Tuple[int, ...], factor: int) -> Tuple[int, ...]:
    """Storage-block -> true-phase table after an upsample by ``factor``."""
    return tuple(sigma[p] * factor + q
                 for q in range(factor) for p in range(len(sigma)))


def phase_order(factors: Sequence[int]) -> Tuple[int, ...]:
    sigma: Tuple[int, ...] = (0,)
    for f in factors:
        sigma = compose_phase_order(sigma, f)
    return sigma


def _true_shift(x: Array, sigma: Tuple[int, ...], t0: int, d: int,
                direction: int, mode: str) -> Array:
    """Phase-block true-time shift: result[(j, u)] = X_true[tau - d]
    (direction=+1) or X_true[tau + d] (direction=-1), where
    tau = u*P + sigma[j] and X_true is the signal x represents.

    mode "reflect" follows torch ReflectionPad1d (x[-k] = x[k],
    x[L-1+k] = x[L-1-k]); mode "zero" zero-fills (transposed-conv edges).
    """
    P = len(sigma)
    L = P * t0
    inv = {phase: j for j, phase in enumerate(sigma)}
    col = lambda t: x[:, inv[t % P] * t0 + t // P][:, None]
    blocks = []
    for j in range(P):
        phi = sigma[j]
        if direction > 0:
            psi = phi - d
            src = inv[psi % P] * t0
            s = -(psi // P)  # frames lost at the left edge (>= 0)
            body = x[:, src:src + t0 - s]
            if s == 0:
                blocks.append(body)
                continue
            if mode == "zero":
                edge = [jnp.zeros((x.shape[0], s), x.dtype)]
            else:
                edge = [col(d - (u * P + phi)) for u in range(s)]
            blocks.append(jnp.concatenate(edge + [body], axis=1))
        else:
            psi = phi + d
            src = inv[psi % P] * t0
            c = psi // P  # frames lost at the right edge (>= 0)
            body = x[:, src + c:src + t0]
            if c == 0:
                blocks.append(body)
                continue
            if mode == "zero":
                edge = [jnp.zeros((x.shape[0], c), x.dtype)]
            else:
                edge = [col(2 * (L - 1) - ((u * P + phi) + d))
                        for u in range(t0 - c, t0)]
            blocks.append(jnp.concatenate([body] + edge, axis=1))
    return jnp.concatenate(blocks, axis=1)


def pack_upsample_params(kernel: Array, factor: int, dtype=jnp.float32):
    """Split a flax ConvTranspose kernel (2f, C_in, C_out) into the two dense
    polyphase matmul weights.

    Output phase p of frame u reads tap j = delta*f + (3f/2 - 1) - p of the
    kernel at input x[u + delta]; j in [0, 2f) admits delta in {-1, 0} for
    p < f/2 and {0, +1} for p >= f/2 (f even).

    Returns (wa, wb): wa (f/2*C_out, 2C_in) with operand rows [x[u-1]; x[u]]
    for phases 0..f/2-1; wb likewise over [x[u]; x[u+1]] for f/2..f-1.
    """
    f = factor
    assert f % 2 == 0 and kernel.shape[0] == 2 * f, (f, kernel.shape)
    pad_a = 3 * f // 2 - 1
    k = np.asarray(kernel)
    rows_a, rows_b = [], []
    for p in range(f // 2):
        rows_a.append(np.concatenate(
            [k[-f + pad_a - p].T, k[pad_a - p].T], axis=1))   # [x[u-1]; x[u]]
    for p in range(f // 2, f):
        rows_b.append(np.concatenate(
            [k[pad_a - p].T, k[f + pad_a - p].T], axis=1))    # [x[u]; x[u+1]]
    wa = jnp.asarray(np.concatenate(rows_a, axis=0), dtype)
    wb = jnp.asarray(np.concatenate(rows_b, axis=0), dtype)
    return wa, wb


def pack_proj_params(kernel: Array, dtype=jnp.float32) -> Array:
    """Flax conv kernel (k, C_in, C_out) -> (C_out, k*C_in) matmul weight over
    the concatenated taps [x[t-(k//2)]; ...; x[t+(k//2)]]."""
    k = np.asarray(kernel)
    return jnp.asarray(
        np.concatenate([k[j].T for j in range(k.shape[0])], axis=1), dtype)


def pack_pqmf_synthesis_params(pqmf, dtype=jnp.float32):
    """PQMF polyphase synthesis (models/vocoder/pqmf.py:101-108) as one
    matmul: W (N phases, J*N) over the concat of the J true-time-shifted
    subband copies (tap j reads sub[t + j - q], zero-padded edges)."""
    syn = np.asarray(pqmf._syn_poly)              # (J, subband c, phase p)
    J, N, _ = syn.shape
    w = np.transpose(syn, (2, 0, 1)).reshape(N, J * N)   # [p, j*N + c]
    return jnp.asarray(w, dtype), int(pqmf._syn_pad[0])


def pack_generator_params(gen, params: Dict[str, Any], dtype=jnp.float32,
                          fuse_pqmf: bool = False, fold: bool = None,
                          stacked: bool = None):
    """Pack a FOLDED (use_weight_norm=False) MelGAN-family generator params
    tree into the megakernel's flat operand tuple. When the generator is
    multiband and ``fuse_pqmf``, the PQMF synthesis matmul is appended and
    runs inside the kernel.

    ``fold``: pack the late stages in the superphase-group layout (see the
    fold section below) — the weights of stages >= fold_start_stage(gen),
    proj_out, and the PQMF tail become block-banded folded matmuls. The
    apply side auto-detects from the tuple length.

    ``stacked``: pack upsamples / stack convs / proj_out in the tap-stacked
    (output-shift) form — same FLOPs and dot count, no shifted-operand
    copies or concats (see the tap-stacked section above).

    MEASURED NEGATIVE RESULT (2026-08-20, scripts/profile_mega_fold.py on
    the real chip): the fold is exact but SLOWER end-to-end (8.04 vs
    5.40 ms at B128). Root cause per scripts/probe_matmul_shapes.py: dots at
    1x/2x/3.3x the FLOPs of the unfolded shapes take the SAME wall time —
    small-M dots do not pay the naive ceil(M/128) tile waste, so filling
    the tiles buys nothing while the fold's banded/block-diag weight
    replication adds ~40% real FLOPs. fold defaults to False; the code
    stays as the measured branch of record."""
    if fold is None:
        fold = False
    if stacked is None:
        stacked = False
    assert not (fold and stacked), "fold and stacked are exclusive packings"
    ff = fold_start_stage(gen) if fold else None
    ops = [pack_proj_params(params["proj_in"]["conv"]["kernel"], dtype),
           jnp.asarray(params["proj_in"]["conv"]["bias"], dtype)]
    g = 1
    for i, factor in enumerate(gen.upsample_factors):
        up = params[f"upsample_{i}"]
        if stacked:
            w1s, b1s, w2s, bouts = pack_stack_params(
                params[f"resstack_{i}"], gen.num_res_blocks, jnp.float32)
            c = int(w1s.shape[1])
            # w1 (C, 3C) column blocks [tap -d | 0 | +d] -> M-stacked (3C, C)
            w1_st = jnp.stack([jnp.concatenate(
                [w1s[b][:, j * c:(j + 1) * c] for j in range(3)], axis=0)
                for b in range(gen.num_res_blocks)])
            ops += [pack_upsample_params_stacked(up["kernel"], factor, dtype),
                    jnp.asarray(up["bias"], dtype),
                    w1_st.astype(dtype), b1s.astype(dtype),
                    w2s.astype(dtype), bouts.astype(dtype)]
            continue
        if ff is None or i < ff:
            wa, wb = pack_upsample_params(up["kernel"], factor, dtype)
            ops += [wa, wb, jnp.asarray(up["bias"], dtype)]
            ops += list(pack_stack_params(params[f"resstack_{i}"],
                                          gen.num_res_blocks, dtype))
            continue
        ops += [pack_folded_upsample(up["kernel"], factor, g, dtype),
                _tile_bias(up["bias"], factor * g, dtype)]
        g *= factor
        w1s, b1s, w2s, bouts = pack_stack_params(
            params[f"resstack_{i}"], gen.num_res_blocks, jnp.float32)
        c = int(w1s.shape[1])
        for blk in range(gen.num_res_blocks):
            d = 3 ** blk
            ops += [pack_folded_conv(np.asarray(w1s[blk]), c, (-d, 0, d),
                                     g, dtype),
                    _tile_bias(b1s[blk], g, dtype),
                    pack_folded_pair(np.asarray(w2s[blk]), c, g, dtype),
                    _tile_bias(bouts[blk], g, dtype)]
    po_w = pack_proj_params(params["proj_out"]["conv"]["kernel"], dtype)
    po_b = params["proj_out"]["conv"]["bias"]
    if stacked:
        ops += [pack_proj_params_stacked(
                    params["proj_out"]["conv"]["kernel"], dtype),
                jnp.asarray(po_b, dtype)]
    elif ff is not None:
        k = np.asarray(params["proj_out"]["conv"]["kernel"]).shape[0]
        half = k // 2
        c_last = np.asarray(params["proj_out"]["conv"]["kernel"]).shape[1]
        ops += [pack_folded_conv(np.asarray(po_w), c_last,
                                 tuple(range(-half, half + 1)), g, dtype),
                _tile_bias(po_b, g, dtype)]
    else:
        ops += [po_w, jnp.asarray(po_b, dtype)]
    if fuse_pqmf and getattr(gen, "pqmf", None) is not None \
            and gen.out_channels > 1:
        w, q = pack_pqmf_synthesis_params(gen.pqmf, dtype)
        if ff is not None:
            taps = int(np.asarray(gen.pqmf._syn_poly).shape[0])
            ops.append(pack_folded_conv(
                np.asarray(w), gen.pqmf.N,
                tuple(j - q for j in range(taps)), g, dtype))
        else:
            ops.append(w)
    return tuple(ops)


def _packed_len(gen, fold_from, with_pqmf: bool,
                stacked: bool = False) -> int:
    s, nrb = len(gen.upsample_factors), gen.num_res_blocks
    if stacked:
        return 4 + 6 * s + (1 if with_pqmf else 0)
    ff = s if fold_from is None else fold_from
    return 4 + 7 * ff + (s - ff) * (2 + 4 * nrb) + (1 if with_pqmf else 0)


def _conv_head(x, sigma, t0, w, b, k: int, compute_dtype, matmul_dtype=None,
               accum_taps: bool = False):
    """k-tap reflect-padded conv as one matmul: operand is the concat of the
    k true-time-shifted copies (tap delta = j - k//2). With ``accum_taps``
    the concat is skipped and the k matmuls accumulate instead (saves a
    (k*C, P*t0) VPU copy at the cost of k narrow-K MXU passes)."""
    md = matmul_dtype or compute_dtype
    half = k // 2
    taps = [_true_shift(x, sigma, t0, half - j, +1, "reflect")
            for j in range(half)]
    taps += [x]
    taps += [_true_shift(x, sigma, t0, j, -1, "reflect")
             for j in range(1, half + 1)]
    if accum_taps:
        c_in = x.shape[0]
        acc = b[...].astype(jnp.float32)[:, None]
        for j, tap in enumerate(taps):
            acc = acc + jnp.dot(
                w[:, j * c_in:(j + 1) * c_in].astype(md), tap.astype(md),
                preferred_element_type=jnp.float32)
        return acc
    cat = jnp.concatenate(taps, axis=0)                  # (k*C, P*t0)
    return (jnp.dot(w[...].astype(md), cat.astype(md),
                    preferred_element_type=jnp.float32)
            + b[...].astype(jnp.float32)[:, None])


def _upsample_body(x, sigma, t0, wa, wb, bias, factor: int,
                   negative_slope: float, compute_dtype, matmul_dtype=None,
                   accum_taps: bool = False):
    """leaky -> polyphase transposed conv: (C_in, P*t0) -> (C_out, P*f*t0)
    with the new storage order sigma' = compose_phase_order(sigma, f)."""
    md = matmul_dtype or compute_dtype
    f = factor
    y = _leaky(x, negative_slope)
    ym = _true_shift(y, sigma, t0, 1, +1, "zero")        # x[v-1]
    yp = _true_shift(y, sigma, t0, 1, -1, "zero")        # x[v+1]
    if accum_taps:
        c_in = x.shape[0]
        dot = lambda w, v: jnp.dot(w.astype(md), v.astype(md),
                                   preferred_element_type=jnp.float32)
        ra = dot(wa[:, :c_in], ym) + dot(wa[:, c_in:], y)
        rb = dot(wb[:, :c_in], y) + dot(wb[:, c_in:], yp)
    else:
        a = jnp.concatenate([ym, y], axis=0)             # (2C_in, P*t0)
        b_ = jnp.concatenate([y, yp], axis=0)
        ra = jnp.dot(wa[...].astype(md), a.astype(md),
                     preferred_element_type=jnp.float32)  # (f/2*C_out, P*t0)
        rb = jnp.dot(wb[...].astype(md), b_.astype(md),
                     preferred_element_type=jnp.float32)
    c_out = 2 * ra.shape[0] // f
    bias_col = bias[...].astype(jnp.float32)[:, None]
    pieces = [ra[q * c_out:(q + 1) * c_out] + bias_col
              for q in range(f // 2)]
    pieces += [rb[q * c_out:(q + 1) * c_out] + bias_col
               for q in range(f // 2)]
    out = jnp.concatenate(pieces, axis=1).astype(compute_dtype)
    return out, compose_phase_order(sigma, f)


def _stack_body_pb(x, sigma, t0, w1, b1, w2, bout, num_blocks: int,
                   kernel_size: int, negative_slope: float, compute_dtype,
                   matmul_dtype=None, accum_taps: bool = False):
    """Residual stack on a phase-block (C, P*t0) value (same matmuls as
    fused_resstack.stack_body; shifts resolved through sigma)."""
    md = matmul_dtype or compute_dtype
    dot = lambda w, v: jnp.dot(w.astype(md), v.astype(md),
                               preferred_element_type=jnp.float32)
    for blk in range(num_blocks):
        d = kernel_size ** blk
        y = _leaky(x, negative_slope)
        ym = _true_shift(y, sigma, t0, d, +1, "reflect")
        yp = _true_shift(y, sigma, t0, d, -1, "reflect")
        c = x.shape[0]
        if accum_taps:
            h = (dot(w1[blk][:, :c], ym) + dot(w1[blk][:, c:2 * c], y)
                 + dot(w1[blk][:, 2 * c:], yp)
                 + b1[blk].astype(jnp.float32)[:, None])
            hl = _leaky(h, negative_slope).astype(compute_dtype)
            x = (dot(w2[blk][:, :c], hl) + dot(w2[blk][:, c:], x)
                 + bout[blk].astype(jnp.float32)[:, None]
                 ).astype(compute_dtype)
            continue
        cat1 = jnp.concatenate([ym, y, yp], axis=0)      # (3C, P*t0)
        h = (jnp.dot(w1[blk].astype(md), cat1.astype(md),
                     preferred_element_type=jnp.float32)
             + b1[blk].astype(jnp.float32)[:, None])
        cat2 = jnp.concatenate([_leaky(h, negative_slope).astype(compute_dtype),
                                x], axis=0)              # (2C, P*t0)
        x = (jnp.dot(w2[blk].astype(md), cat2.astype(md),
                     preferred_element_type=jnp.float32)
             + bout[blk].astype(jnp.float32)[:, None]
             ).astype(compute_dtype)
    return x


def _pqmf_tail(sub, sigma, t0, w_ref, j_taps: int, q: int, compute_dtype,
               matmul_dtype=None, accum_taps: bool = False):
    """In-kernel PQMF polyphase synthesis: wav phase block (N, P*t0) from the
    tanh'd subbands. phases[t] = sum_j syn[j] @ sub[t + j - q] (zero edges)."""
    md = matmul_dtype or compute_dtype
    taps = []
    for j in range(j_taps):
        s = j - q
        if s < 0:
            taps.append(_true_shift(sub, sigma, t0, -s, +1, "zero"))
        elif s > 0:
            taps.append(_true_shift(sub, sigma, t0, s, -1, "zero"))
        else:
            taps.append(sub)
    if accum_taps:
        n = sub.shape[0]
        acc = jnp.dot(w_ref[:, :n].astype(md), taps[0].astype(md),
                      preferred_element_type=jnp.float32)
        for j in range(1, j_taps):
            acc = acc + jnp.dot(
                w_ref[:, j * n:(j + 1) * n].astype(md), taps[j].astype(md),
                preferred_element_type=jnp.float32)
        return acc
    cat = jnp.concatenate(taps, axis=0)           # (J*N, P*t0)
    return jnp.dot(w_ref[...].astype(md), cat.astype(md),
                   preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# Tap-stacked ("output-shift") conv form: the measured VPU-traffic fix.
#
# The per-shape probe (scripts/probe_matmul_shapes.py) showed dot cost on
# this chip is NOT MXU-pass-bound at the megakernel's shapes — the remaining
# gap to the FLOP roofline is the operand CONSTRUCTION: every conv builds
# shifted tap copies and concatenates them into a (k*C_in, L) operand
# (~45 MB/item of VPU copy traffic). Since conv is linear, the taps can
# instead be stacked in the OUTPUT (M) dimension: one dot
# H = [W_tap0; W_tap1; ...] @ y  (k*C_out, L) with K = C_in and NO shifted
# operands, then Y = sum_j true_shift(H_j) — shifts move to the (C_out, L)
# output pieces. Identical FLOPs and exactness (reflect edges commute with
# the per-tap linear map); same dot count; tap copies and the operand concat
# disappear. Wins wherever C_out <= C_in (upsamples, stacks, proj_out);
# proj_in (C_out >> C_in) and the PQMF tail (C_out == C_in, k=16) keep the
# concat form.
# --------------------------------------------------------------------------


def pack_proj_params_stacked(kernel: Array, dtype=jnp.float32) -> Array:
    """Flax conv kernel (k, C_in, C_out) -> (k*C_out, C_in) with row block j
    = tap j's transposed weight (tap j reads x[t + j - k//2])."""
    k = np.asarray(kernel)
    return jnp.asarray(np.concatenate([k[j].T for j in range(k.shape[0])],
                                      axis=0), dtype)


def pack_upsample_params_stacked(kernel: Array, factor: int,
                                 dtype=jnp.float32) -> Array:
    """(2f, C_in, C_out) transposed-conv kernel -> one (2f*C_out, C_in)
    M-stacked weight with row blocks [A_prev; A_cur; B_cur; B_next]
    (the column splits of pack_upsample_params' wa/wb)."""
    wa, wb = pack_upsample_params(kernel, factor)
    wa, wb = np.asarray(wa), np.asarray(wb)
    c_in = wa.shape[1] // 2
    return jnp.asarray(np.concatenate(
        [wa[:, :c_in], wa[:, c_in:], wb[:, :c_in], wb[:, c_in:]], axis=0),
        dtype)


def _conv_head_stacked(x, sigma, t0, w_ref, b_ref, k: int, compute_dtype,
                       matmul_dtype=None):
    """k-tap reflect conv, taps stacked in M: one (k*C_out, C_in) dot on the
    unshifted input, then shift-and-add the output pieces."""
    md = matmul_dtype or compute_dtype
    half = k // 2
    h = jnp.dot(w_ref[...].astype(md), x.astype(md),
                preferred_element_type=jnp.float32)
    c_out = h.shape[0] // k
    acc = b_ref[...].astype(jnp.float32)[:, None] + h[half * c_out:
                                                      (half + 1) * c_out]
    for j in range(k):
        if j == half:
            continue
        piece = h[j * c_out:(j + 1) * c_out]
        d = half - j
        acc = acc + _true_shift(piece, sigma, t0, abs(d),
                                +1 if d > 0 else -1, "reflect")
    return acc


def _upsample_body_stacked(x, sigma, t0, w_ref, bias, factor: int,
                           negative_slope: float, compute_dtype,
                           matmul_dtype=None):
    """leaky -> M-stacked polyphase transposed conv (no ym/yp operand
    copies): H rows [A_prev; A_cur; B_cur; B_next], output-side +-1 shifts."""
    md = matmul_dtype or compute_dtype
    f = factor
    y = _leaky(x, negative_slope)
    h = jnp.dot(w_ref[...].astype(md), y.astype(md),
                preferred_element_type=jnp.float32)
    m = h.shape[0] // 4                               # f/2 * C_out
    ra = _true_shift(h[:m], sigma, t0, 1, +1, "zero") + h[m:2 * m]
    rb = h[2 * m:3 * m] + _true_shift(h[3 * m:], sigma, t0, 1, -1, "zero")
    c_out = 2 * m // f
    bias_col = bias[...].astype(jnp.float32)[:, None]
    pieces = [ra[q * c_out:(q + 1) * c_out] + bias_col
              for q in range(f // 2)]
    pieces += [rb[q * c_out:(q + 1) * c_out] + bias_col
               for q in range(f // 2)]
    out = jnp.concatenate(pieces, axis=1).astype(compute_dtype)
    return out, compose_phase_order(sigma, f)


def _stack_body_stacked(x, sigma, t0, w1, b1, w2, bout, num_blocks: int,
                        kernel_size: int, negative_slope: float,
                        compute_dtype, matmul_dtype=None):
    """Residual stack with the dilated conv's taps stacked in M
    (w1: (n, 3C, C) row blocks [tap -d; tap 0; tap +d]); the pointwise
    w2+shortcut keeps the [leaky(h); x] pair matmul."""
    md = matmul_dtype or compute_dtype
    c = x.shape[0]
    for blk in range(num_blocks):
        d = kernel_size ** blk
        y = _leaky(x, negative_slope)
        hs = jnp.dot(w1[blk].astype(md), y.astype(md),
                     preferred_element_type=jnp.float32)   # (3C, L)
        h = (hs[c:2 * c]
             + _true_shift(hs[:c], sigma, t0, d, +1, "reflect")
             + _true_shift(hs[2 * c:], sigma, t0, d, -1, "reflect")
             + b1[blk].astype(jnp.float32)[:, None])
        cat2 = jnp.concatenate([_leaky(h, negative_slope).astype(compute_dtype),
                                x], axis=0)                # (2C, L)
        x = (jnp.dot(w2[blk].astype(md), cat2.astype(md),
                     preferred_element_type=jnp.float32)
             + bout[blk].astype(jnp.float32)[:, None]
             ).astype(compute_dtype)
    return x


# --------------------------------------------------------------------------
# Superphase-group ("folded") layout: the MXU-utilization fix for the late
# small-channel stages.
#
# Problem: at stage C=24 every stack matmul is (24, 72) @ (72, P*t0) — 24/128
# output sublanes and 72/128 contraction rows per MXU pass (~10% utilization);
# measured 2.3x total gap to the FLOP roofline concentrated in stages 2-3 +
# proj_out/pqmf (scripts/model_mega_passes.py).
#
# Fix: fold g consecutive TRUE phases into the channel (sublane) dimension.
# Layout: (g*C, Q*t0) where Q = P/g "superphase" lane blocks ordered by
# sigma_q (the phase_order table of the UNfolded prefix stages), lanes within
# a block = mel frames u, and sublane block r = in-group phase (true-ordered).
# True time tau = u*P + sigma_q[j]*g + r.
#
# A k-tap conv with offsets D on folded data becomes ONE matmul whose
# operand stacks the window blocks {r + d : r in [0,g), d in D} (each block
# (C, Q*t0): in-group phase psi of the current/adjacent group, built from
# row slices + lane-block shifts — never a lane interleave) and whose weight
# is block-banded (g*C_out, len(window)*C_in): row block r places tap d at
# window block (r + d). Overlap sharing keeps K ~ (g + spread)*C_in, so
# M = g*C_out ≈ 128 at ~constant FLOPs: stage-3 w1 goes from 1x1x124 tile
# passes to 1x2x31. Pointwise convs (w2) pay a g-fold FLOP replication but
# still win on M utilization. Upsamples fold naturally (g_out = f*g_in,
# r_out = f*r_in + p) and consume the previous stage's folded layout, so the
# fold propagates with zero relayout passes.
# --------------------------------------------------------------------------


def fold_start_stage(gen) -> int | None:
    """First stage index from which the generator runs folded: channel width
    <= 64 (so g*C can reach a full 128-sublane tile), every remaining
    upsample factor even (polyphase split needs f even), and every folded
    channel count divisible by 8 (Mosaic can only concat sublane-aligned row
    slices — the banded reflect path needs C % 8 == 0). None = no folding."""
    factors = tuple(gen.upsample_factors)
    if (gen.base_channels >> len(factors)) % 8:
        return None
    ch = gen.base_channels
    for i, f in enumerate(factors):
        ch //= 2
        if ch <= 64 and all(x % 2 == 0 for x in factors[i:]):
            return i
    return None


def _phases_for(offsets: Sequence[int], g: int) -> Tuple[int, ...]:
    """Exact set of window in-group phases {r + d} a folded conv needs."""
    return tuple(sorted({r + d for r in range(g) for d in offsets}))


def _mode_col(xf, sigma_q, t0: int, g: int, C: int, tau: int, mode: str):
    """(g*C-row ref's) single true-time column (C, 1) for an out-of-range
    position ``tau``, resolved per ``mode`` (reflect ≙ torch ReflectionPad1d,
    zero ≙ transposed-conv / PQMF edges)."""
    if mode == "zero":
        return jnp.zeros((C, 1), xf.dtype)
    P = len(sigma_q) * g
    L = P * t0
    t = -tau if tau < 0 else 2 * (L - 1) - tau
    assert 0 <= t < L, (tau, t, L)
    inv_q = {q: j for j, q in enumerate(sigma_q)}
    phi = t % P
    lane = inv_q[phi // g] * t0 + t // P
    r = phi % g
    return xf[r * C:(r + 1) * C, lane:lane + 1]


def _window_block(xf, sigma_q, t0: int, g: int, C: int, psi: int, mode: str):
    """(C, Q*t0) operand block: value at lane (j, u) = x_true[u*P +
    sigma_q[j]*g + psi]. psi in [0, g) is a free row slice; outside, the
    block comes from the (psi//g)-group-shifted view with per-column edge
    fixes (at most ceil(|psi|/g) columns per lane block)."""
    Q = len(sigma_q)
    P = Q * g
    if 0 <= psi < g:
        return xf[psi * C:(psi + 1) * C]
    n, r = psi // g, psi % g          # floor division: psi = n*g + r
    base = xf[r * C:(r + 1) * C]
    inv_q = {q: j for j, q in enumerate(sigma_q)}
    cols = []
    for j in range(Q):
        q = sigma_q[j]
        qs = q + n
        carry = qs // Q
        src = inv_q[qs % Q] * t0
        if carry == 0:
            cols.append(base[:, src:src + t0])
        elif carry < 0:
            k = -carry
            fixes = [_mode_col(xf, sigma_q, t0, g, C,
                               u * P + q * g + psi, mode) for u in range(k)]
            cols.append(jnp.concatenate(
                fixes + [base[:, src:src + t0 - k]], axis=1))
        else:
            k = carry
            fixes = [_mode_col(xf, sigma_q, t0, g, C, u * P + q * g + psi,
                               mode) for u in range(t0 - k, t0)]
            cols.append(jnp.concatenate(
                [base[:, src + k:src + t0]] + fixes, axis=1))
    return jnp.concatenate(cols, axis=1)


def _operand_layout(offsets: Sequence[int], g: int, C: int):
    """How a folded conv's operand is assembled. ("banded", phases): one
    (C, Q*t0) block per needed in-group phase — minimal K, but its row
    slices need C % 8 == 0 (Mosaic sublane alignment). ("views", ns): whole
    g*C-row group-shifted views — K rounded up to view granularity, row
    slicing avoided (required when C % 8 != 0, e.g. the PQMF tail's N=4)."""
    phases = _phases_for(offsets, g)
    if C % 8 == 0:
        return "banded", phases
    ns = tuple(sorted({p // g for p in phases}))
    return "views", ns


def _full_view(xf, sigma_q, t0: int, g: int, n: int, mode: str):
    """(g*C, Q*t0) group-shifted view: value at (rows, j, u) = folded signal
    of group sigma_q[j] + n. Built from full-height lane-block slices only
    (no sublane slicing); edge columns must be zero-mode."""
    if n == 0:
        return xf[:]
    Q = len(sigma_q)
    assert mode == "zero", "reflect edges need the banded (C%8==0) path"
    inv_q = {q: j for j, q in enumerate(sigma_q)}
    rows = xf.shape[0]
    cols = []
    for j in range(Q):
        qs = sigma_q[j] + n
        carry = qs // Q
        src = inv_q[qs % Q] * t0
        blk = xf[:, src:src + t0]
        if carry == 0:
            cols.append(blk)
        elif carry < 0:
            k = -carry
            z = jnp.zeros((rows, k), xf.dtype)
            cols.append(jnp.concatenate([z, blk[:, :t0 - k]], axis=1))
        else:
            z = jnp.zeros((rows, carry), xf.dtype)
            cols.append(jnp.concatenate([blk[:, carry:], z], axis=1))
    return jnp.concatenate(cols, axis=1)


def _folded_operand(xf, sigma_q, t0, g, C, offsets, mode):
    kind, items = _operand_layout(offsets, g, C)
    if kind == "banded":
        return jnp.concatenate(
            [_window_block(xf, sigma_q, t0, g, C, p, mode) for p in items],
            axis=0)
    return jnp.concatenate(
        [_full_view(xf, sigma_q, t0, g, n, mode) for n in items], axis=0)


def pack_folded_conv(w_dense: Array, c_in: int, offsets: Sequence[int],
                     g: int, dtype=jnp.float32) -> Array:
    """Dense conv weight (C_out, n_taps*C_in), tap t at offset offsets[t],
    -> block-banded folded weight (g*C_out, len(phases)*C_in)."""
    w = np.asarray(w_dense)
    c_out = w.shape[0]
    kind, items = _operand_layout(offsets, g, c_in)
    if kind == "banded":
        idx = {p: k for k, p in enumerate(items)}
        n_blocks = len(items)
    else:
        vi = {n: k for k, n in enumerate(items)}
        idx = {p: vi[p // g] * g + (p % g)
               for p in _phases_for(offsets, g)}
        n_blocks = len(items) * g
    big = np.zeros((g * c_out, n_blocks * c_in), w.dtype)
    for r in range(g):
        for t, d in enumerate(offsets):
            k = idx[r + d]
            big[r * c_out:(r + 1) * c_out, k * c_in:(k + 1) * c_in] = \
                w[:, t * c_in:(t + 1) * c_in]
    return jnp.asarray(big, dtype)


def pack_folded_pair(w2: Array, c: int, g: int, dtype=jnp.float32) -> Array:
    """Residual-block tail (C, 2C) over [leaky(h); x] -> block-diag folded
    (g*C, 2*g*C): row block r reads hl block r and x block g+r."""
    w = np.asarray(w2)
    big = np.zeros((g * c, 2 * g * c), w.dtype)
    for r in range(g):
        big[r * c:(r + 1) * c, r * c:(r + 1) * c] = w[:, :c]
        big[r * c:(r + 1) * c, (g + r) * c:(g + r + 1) * c] = w[:, c:]
    return jnp.asarray(big, dtype)


def pack_folded_upsample(kernel: Array, factor: int, g_in: int,
                         dtype=jnp.float32) -> Array:
    """Polyphase transposed conv producing the folded layout directly:
    (g_out*C_out, (g_in+2)*C_in) over window phases [-1, g_in]; output row
    block r_out = f*r_in + p (true in-group order)."""
    f = factor
    wa, wb = pack_upsample_params(kernel, f)
    wa, wb = np.asarray(wa), np.asarray(wb)
    c_in = wa.shape[1] // 2
    c_out = wa.shape[0] // (f // 2)
    g_out = f * g_in
    kind, items = _operand_layout((-1, 0, 1), g_in, c_in)
    if kind == "banded":
        idx = {p: k for k, p in enumerate(items)}
        n_blocks = len(items)
    else:
        vi = {n: k for k, n in enumerate(items)}
        idx = {p: vi[p // g_in] * g_in + (p % g_in)
               for p in _phases_for((-1, 0, 1), g_in)}
        n_blocks = len(items) * g_in
    big = np.zeros((g_out * c_out, n_blocks * c_in), wa.dtype)
    for r_out in range(g_out):
        p, r_in = r_out % f, r_out // f
        if p < f // 2:
            taps = [(-1, wa[p * c_out:(p + 1) * c_out, :c_in]),
                    (0, wa[p * c_out:(p + 1) * c_out, c_in:])]
        else:
            pb = p - f // 2
            taps = [(0, wb[pb * c_out:(pb + 1) * c_out, :c_in]),
                    (1, wb[pb * c_out:(pb + 1) * c_out, c_in:])]
        for d, wslice in taps:
            k = idx[r_in + d]
            big[r_out * c_out:(r_out + 1) * c_out,
                k * c_in:(k + 1) * c_in] = wslice
    return jnp.asarray(big, dtype)


def _tile_bias(b: Array, g: int, dtype=jnp.float32) -> Array:
    return jnp.asarray(np.tile(np.asarray(b), g), dtype)


def _folded_matmul(w_ref, operand, b_ref, md):
    out = jnp.dot(w_ref[...].astype(md), operand.astype(md),
                  preferred_element_type=jnp.float32)
    if b_ref is not None:
        out = out + b_ref[...].astype(jnp.float32)[:, None]
    return out


def _folded_upsample_body(x, sigma_q, t0, g_in, w_ref, b_ref, factor,
                          negative_slope, compute_dtype, md):
    """leaky -> folded polyphase upsample: (g_in*C_in, Q*t0) ->
    (f*g_in*C_out, Q*t0); sigma_q and Q unchanged."""
    c_in = x.shape[0] // max(g_in, 1)
    y = _leaky(x, negative_slope)
    cat = _folded_operand(y, sigma_q, t0, g_in, c_in, (-1, 0, 1), "zero")
    out = _folded_matmul(w_ref, cat, b_ref, md)
    return out.astype(compute_dtype)


def _folded_stack_body(x, sigma_q, t0, g, w1_refs, b1_refs, w2_refs, b2_refs,
                       num_blocks, kernel_size, negative_slope,
                       compute_dtype, md):
    c = x.shape[0] // g
    for blk in range(num_blocks):
        d = kernel_size ** blk
        y = _leaky(x, negative_slope)
        cat1 = _folded_operand(y, sigma_q, t0, g, c, (-d, 0, d), "reflect")
        h = _folded_matmul(w1_refs[blk], cat1, b1_refs[blk], md)
        hl = _leaky(h, negative_slope).astype(compute_dtype)
        cat2 = jnp.concatenate([hl, x], axis=0)        # (2*g*C, Q*t0)
        x = _folded_matmul(w2_refs[blk], cat2, b2_refs[blk],
                           md).astype(compute_dtype)
    return x


def to_true_time_folded(pb: Array, factors: Sequence[int],
                        fold_from: int) -> Array:
    """(B, g*C, Q*t0) folded output -> (B, T_total, C) true-time NWC."""
    sigma_q = phase_order(factors[:fold_from])
    g = int(np.prod(factors[fold_from:]))
    Q = len(sigma_q)
    B, rows, lanes = pb.shape
    C, t0 = rows // g, lanes // Q
    arr = pb.reshape(B, g, C, Q, t0)
    inv = np.argsort(np.asarray(sigma_q))        # true superphase -> block j
    arr = arr[:, :, :, inv, :]                   # (B, r, C, q_true, u)
    arr = jnp.transpose(arr, (0, 4, 3, 1, 2))    # (B, u, q, r, C)
    return arr.reshape(B, t0 * Q * g, C)


def _make_generator_kernel(factors: Sequence[int], num_res_blocks: int,
                           proj_kernel: int, t0: int, stack_kernel_size: int,
                           negative_slope: float, compute_dtype,
                           pqmf_taps: int = 0, pqmf_q: int = 0,
                           matmul_dtype=None, items_per_block: int = 1,
                           accum_taps: bool = False,
                           pretransposed: bool = False,
                           fold_from=None, stacked_taps: bool = False):
    n_stage = len(factors)
    md = matmul_dtype or compute_dtype

    def kernel(mel_ref, *refs):
        w_refs, out_ref = refs[:-1], refs[-1]
        # several batch items per grid step amortize the per-step fixed cost
        # (measured ~13 us/item at batch 128: proj_in alone is 1.67 ms,
        # scripts/profile_mega_stages.py); items run back-to-back in-kernel
        for item in range(items_per_block):
            if pretransposed:
                x = mel_ref[item].astype(compute_dtype)             # (80,t0)
            else:
                x = jnp.transpose(mel_ref[item]).astype(compute_dtype)
            sigma: Tuple[int, ...] = (0,)
            x = _conv_head(x, sigma, t0, w_refs[0], w_refs[1], proj_kernel,
                           compute_dtype, matmul_dtype,
                           accum_taps).astype(compute_dtype)
            idx = 2
            g = 1
            for i in range(n_stage):
                if stacked_taps:
                    w_up, ub = w_refs[idx], w_refs[idx + 1]
                    w1, b1, w2, bout = w_refs[idx + 2:idx + 6]
                    idx += 6
                    x, sigma = _upsample_body_stacked(
                        x, sigma, t0, w_up, ub, factors[i], negative_slope,
                        compute_dtype, matmul_dtype)
                    x = _stack_body_stacked(x, sigma, t0, w1, b1, w2, bout,
                                            num_res_blocks,
                                            stack_kernel_size,
                                            negative_slope, compute_dtype,
                                            matmul_dtype)
                    continue
                if fold_from is None or i < fold_from:
                    wa, wb, ub = w_refs[idx], w_refs[idx + 1], w_refs[idx + 2]
                    w1, b1, w2, bout = w_refs[idx + 3:idx + 7]
                    idx += 7
                    x, sigma = _upsample_body(x, sigma, t0, wa, wb, ub,
                                              factors[i], negative_slope,
                                              compute_dtype, matmul_dtype,
                                              accum_taps)
                    x = _stack_body_pb(x, sigma, t0, w1, b1, w2, bout,
                                       num_res_blocks, stack_kernel_size,
                                       negative_slope, compute_dtype,
                                       matmul_dtype, accum_taps)
                    continue
                # folded stages: sigma freezes as the superphase order
                x = _folded_upsample_body(x, sigma, t0, g, w_refs[idx],
                                          w_refs[idx + 1], factors[i],
                                          negative_slope, compute_dtype, md)
                idx += 2
                g *= factors[i]
                w1r = [w_refs[idx + 4 * b] for b in range(num_res_blocks)]
                b1r = [w_refs[idx + 4 * b + 1] for b in range(num_res_blocks)]
                w2r = [w_refs[idx + 4 * b + 2] for b in range(num_res_blocks)]
                b2r = [w_refs[idx + 4 * b + 3] for b in range(num_res_blocks)]
                idx += 4 * num_res_blocks
                x = _folded_stack_body(x, sigma, t0, g, w1r, b1r, w2r, b2r,
                                       num_res_blocks, stack_kernel_size,
                                       negative_slope, compute_dtype, md)
            y = _leaky(x, negative_slope)
            if stacked_taps:
                y = _conv_head_stacked(y, sigma, t0, w_refs[idx],
                                       w_refs[idx + 1], proj_kernel,
                                       compute_dtype, matmul_dtype)
                y = jnp.tanh(y)
                if pqmf_taps:
                    y = _pqmf_tail(y.astype(compute_dtype), sigma, t0,
                                   w_refs[idx + 2], pqmf_taps, pqmf_q,
                                   compute_dtype, matmul_dtype, accum_taps)
            elif fold_from is None:
                y = _conv_head(y, sigma, t0, w_refs[idx], w_refs[idx + 1],
                               proj_kernel, compute_dtype, matmul_dtype,
                               accum_taps)
                y = jnp.tanh(y)
                if pqmf_taps:
                    y = _pqmf_tail(y.astype(compute_dtype), sigma, t0,
                                   w_refs[idx + 2], pqmf_taps, pqmf_q,
                                   compute_dtype, matmul_dtype, accum_taps)
            else:
                c_last = y.shape[0] // g
                half = proj_kernel // 2
                cat = _folded_operand(
                    y, sigma, t0, g, c_last,
                    tuple(range(-half, half + 1)), "reflect")
                y = _folded_matmul(w_refs[idx], cat, w_refs[idx + 1], md)
                idx += 2
                y = jnp.tanh(y)
                if pqmf_taps:
                    sub = y.astype(compute_dtype)        # (g*N, Q*t0)
                    n_sub = sub.shape[0] // g
                    offs = tuple(j - pqmf_q for j in range(pqmf_taps))
                    cat = _folded_operand(sub, sigma, t0, g, n_sub,
                                          offs, "zero")
                    y = _folded_matmul(w_refs[idx], cat, None, md)
            out_ref[item] = y.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("factors", "num_res_blocks", "proj_kernel",
                              "out_channels", "stack_kernel_size",
                              "negative_slope", "compute_dtype", "pqmf_taps",
                              "pqmf_q", "matmul_dtype", "items_per_block",
                              "accum_taps", "pretransposed", "fold_from",
                              "stacked_taps", "interpret"))
def _fused_generator(mel: Array, weights, factors, num_res_blocks: int,
                     proj_kernel: int, out_channels: int,
                     stack_kernel_size: int = 3, negative_slope: float = 0.2,
                     compute_dtype=jnp.float32, pqmf_taps: int = 0,
                     pqmf_q: int = 0, matmul_dtype=None,
                     items_per_block: int = 1, accum_taps: bool = False,
                     pretransposed: bool = False, fold_from=None,
                     stacked_taps: bool = False,
                     interpret: bool = False) -> Array:
    """mel (B, T, n_mels) -> (B, out_channels, P*T) in PHASE-BLOCK lane
    order (storage block j = true phase phase_order(factors)[j]); callers
    un-permute with ``to_true_time``. With ``pqmf_taps`` the output channels
    are the N wav phases of the in-kernel PQMF synthesis instead of the
    subbands (true wav index = (u*P + sigma[j])*N + p). With
    ``pretransposed`` the input is (B, n_mels, T) and the per-item Mosaic
    transpose is hoisted to one XLA relayout outside the kernel. With
    ``fold_from`` the stages >= fold_from run in the superphase-group layout
    and the output is (B, g*out_channels, Q*T) for to_true_time_folded."""
    if pretransposed:
        B, n_mels, T = mel.shape
    else:
        B, T, n_mels = mel.shape
    ipb = items_per_block
    assert B % ipb == 0, (B, ipb)
    if fold_from is None:
        out_rows, t_out = out_channels, T * int(np.prod(factors))
    else:
        g = int(np.prod(factors[fold_from:]))
        out_rows = g * out_channels
        t_out = T * int(np.prod(factors[:fold_from]))
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    in_block = (ipb, n_mels, T) if pretransposed else (ipb, T, n_mels)
    return pl.pallas_call(
        _make_generator_kernel(tuple(factors), num_res_blocks, proj_kernel,
                               T, stack_kernel_size, negative_slope,
                               compute_dtype, pqmf_taps=pqmf_taps,
                               pqmf_q=pqmf_q, matmul_dtype=matmul_dtype,
                               items_per_block=ipb, accum_taps=accum_taps,
                               pretransposed=pretransposed,
                               fold_from=fold_from,
                               stacked_taps=stacked_taps),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, t_out), mel.dtype),
        grid=(B // ipb,),
        in_specs=[pl.BlockSpec(in_block, lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [full(w) for w in weights],
        out_specs=pl.BlockSpec((ipb, out_rows, t_out),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(mel, *weights)


def to_true_time(pb: Array, factors: Sequence[int]) -> Array:
    """(B, C, P*T0) phase-block -> (B, T0*P, C) true-time NWC. One XLA
    gather+transpose pass (the only relayout left outside the kernel)."""
    sigma = phase_order(factors)
    P = len(sigma)
    B, C, L = pb.shape
    t0 = L // P
    blocks = pb.reshape(B, C, P, t0)
    inv = np.argsort(np.asarray(sigma))           # true phase -> storage block
    blocks = blocks[:, :, inv, :]                 # (B, C, P_true, t0)
    wav = jnp.transpose(blocks, (0, 3, 2, 1))     # (B, t0, P, C)
    return wav.reshape(B, t0 * P, C)


def _detect_packing(gen, packed) -> Tuple[Any, bool, bool]:
    """(fold_from, has_pqmf, stacked) from the packed tuple's length —
    stacked (4+6S), unfolded (4+7S), and folded packings are all distinct."""
    ff = fold_start_stage(gen)
    for has_pqmf in (False, True):
        if len(packed) == _packed_len(gen, None, has_pqmf, stacked=True):
            # disambiguate vs a (rare) same-length folded packing by the
            # first upsample weight's stacked shape (2f*C_out, C_in)
            f0, c_in0 = gen.upsample_factors[0], gen.base_channels
            if tuple(packed[2].shape) == (2 * f0 * (c_in0 // 2), c_in0):
                return None, has_pqmf, True
        for fold_from in ([None] if ff is None else [ff, None]):
            if len(packed) == _packed_len(gen, fold_from, has_pqmf):
                return fold_from, has_pqmf, False
    raise ValueError(
        f"packed tuple of {len(packed)} ops matches no known layout")


def _packed_has_pqmf(gen, packed) -> bool:
    return _detect_packing(gen, packed)[1]


def _per_item_peak_bytes(gen, t_frames: int) -> int:
    """~peak VMEM working set per batch item (same model as
    megakernel_supported)."""
    factors = tuple(gen.upsample_factors)
    t_total = t_frames * int(np.prod(factors))
    c_last = gen.base_channels >> len(factors)
    return 4 * t_total * (10 * max(c_last, gen.out_channels)
                          + gen.proj_kernel * c_last)


def _auto_items_per_block(gen, B: int, t_frames: int) -> int:
    """NEGATIVE RESULT (2026-08-19): items_per_block=4 measured SLOWER than
    1 at bench shapes (6.2 vs 5.4 ms at batch 128) — per-grid-step cost is
    hidden by cross-step DMA/compute pipelining, and larger blocks reduce
    that overlap. Kept at 1; the items_per_block plumbing remains for
    explicit experiments."""
    return 1


def megakernel_generator_apply(gen, packed, c: Array, compute_dtype=None,
                               matmul_dtype=None, accum_taps: bool = False,
                               pretransposed: bool = False,
                               interpret: bool = False) -> Array:
    """Whole-generator forward from ``pack_generator_params`` output.
    Returns true-time NWC (B, T*prod(factors), out_channels) subbands, or
    (B, T*prod(factors)*N, 1) waveform when the packed tuple carries the
    fused PQMF synthesis matmul.

    ``matmul_dtype=jnp.bfloat16`` casts each matmul's operands to bf16 while
    activations/shifts stay in ``compute_dtype``. NOTE: measured on v5e this
    is a NO-OP (bit-identical output, same time) because Mosaic's DEFAULT dot
    precision already computes f32 x f32 as one bf16 pass; it is kept as the
    hook for future explicit-precision modes (e.g. int8). Full-bf16
    ``compute_dtype`` is *slower* than fp32: Mosaic's packed-dtype lane
    gathers lose more than the (already-bf16) MXU could gain."""
    t_frames = c.shape[1]
    ipb = _auto_items_per_block(gen, c.shape[0], t_frames)
    fold_from, has_pqmf, stacked = _detect_packing(gen, packed)
    assert not (accum_taps and (fold_from is not None or stacked)), \
        "accum_taps applies to the plain unfolded packing only"
    if pretransposed:
        c = jnp.transpose(c, (0, 2, 1))  # one XLA relayout for the batch
    factors = tuple(gen.upsample_factors)
    if has_pqmf:
        pqmf = gen.pqmf
        _, q = pack_pqmf_synthesis_params(pqmf)
        taps = int(np.asarray(pqmf._syn_poly).shape[0])
        pb = _fused_generator(
            c, packed, factors=factors,
            num_res_blocks=gen.num_res_blocks, proj_kernel=gen.proj_kernel,
            out_channels=pqmf.N, compute_dtype=compute_dtype or jnp.float32,
            pqmf_taps=taps, pqmf_q=q, matmul_dtype=matmul_dtype,
            items_per_block=ipb, accum_taps=accum_taps,
            pretransposed=pretransposed, fold_from=fold_from,
            stacked_taps=stacked, interpret=interpret)
        if fold_from is None:
            wav = to_true_time(pb, factors)            # (B, L, N phases)
        else:
            wav = to_true_time_folded(pb, factors, fold_from)
        B, L, N = wav.shape
        return wav.reshape(B, L * N, 1)
    pb = _fused_generator(
        c, packed, factors=factors,
        num_res_blocks=gen.num_res_blocks, proj_kernel=gen.proj_kernel,
        out_channels=gen.out_channels,
        compute_dtype=compute_dtype or jnp.float32,
        matmul_dtype=matmul_dtype, items_per_block=ipb,
        accum_taps=accum_taps, pretransposed=pretransposed,
        fold_from=fold_from, stacked_taps=stacked, interpret=interpret)
    if fold_from is None:
        return to_true_time(pb, factors)
    return to_true_time_folded(pb, factors, fold_from)


def megakernel_supported(gen, t_frames: int) -> bool:
    """True when the whole-generator kernel applies: even upsample factors
    (the 2-tap polyphase derivation needs f even; MelGAN geometry always is)
    and a per-item time axis whose peak VMEM working set fits comfortably.

    Peak live set ~= a handful of (k*C_last, T_total) fp32 operands; cap
    T_total so that stays well under the 120 MB VMEM limit."""
    factors = tuple(gen.upsample_factors)
    if any(f % 2 for f in factors):
        return False
    t_total = (t_frames + 2 * gen.inference_padding) * int(np.prod(factors))
    c_last = gen.base_channels >> len(factors)
    # ~10 concurrent (C_last-scale, T_total) fp32 buffers + proj_out operand
    peak = 4 * t_total * (10 * max(c_last, gen.out_channels)
                          + gen.proj_kernel * c_last)
    return peak < 80 * 1024 * 1024


def megakernel_inference(gen, packed, c: Array, compute_dtype=None,
                         matmul_dtype=None, interpret: bool = False) -> Array:
    """Full serving entry: inference padding + megakernel forward + PQMF
    synthesis (in-kernel when packed with ``fuse_pqmf``) for multiband
    generators. Returns NWC waveform."""
    p = gen.inference_padding
    if p:
        c = jnp.pad(c, ((0, 0), (p, p), (0, 0)), mode="edge")
    out = megakernel_generator_apply(gen, packed, c,
                                     compute_dtype=compute_dtype,
                                     matmul_dtype=matmul_dtype,
                                     interpret=interpret)
    pqmf = getattr(gen, "pqmf", None)
    if (pqmf is not None and gen.out_channels > 1
            and not _packed_has_pqmf(gen, packed)):
        out = pqmf.synthesis(out)
    return out
