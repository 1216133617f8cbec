"""Pallas TPU kernel: fused MelGAN residual stack.

The vocoder bottleneck is HBM traffic: at the high-time-resolution stages a
ResidualStack (≙ /root/reference/TTS/vocoder/layers/melgan.py:5-45) makes
~9 full passes over a (B, T, C) activation of ~100 MB (3 blocks x [leaky,
dilated conv, leaky, 1x1 conv, 1x1 shortcut, add]) while the per-stage
channel counts (24..192) are far too small to hide it. This kernel runs the
WHOLE stack for one batch item with the full time axis resident in VMEM
(<= 1.6 MB even at T=16k): one HBM read of the input, one write of the
output, weights fetched once (constant block index).

Layout: compute happens TRANSPOSED, (C, T) — time on the 128-wide lanes
(dense for any T), channels on sublanes. In the natural NWC layout every
(T, C) x (C, C) matmul pads C=24 up to 128 lanes and the MXU does ~28x the
logical FLOPs; transposed, T is the dense free dimension and only the
contraction is padded. The three dilated-conv taps and the 1x1 shortcut are
packed into ONE (2C, 4C) x (4C, T) matmul per block (dense 96-wide
contraction at C=24 instead of four 24-wide ones).

Exactness: the reference's per-conv ReflectionPad1d is reproduced in-kernel
by building the t-d / t+d shifted operands with explicitly reflected edge
strips, so the kernel is element-wise exact (up to matmul precision) vs the
flax ResidualStack (use_weight_norm=False) — tests/test_fused_vocoder.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_reflect_lanes(y: jnp.ndarray, d: int, direction: int) -> jnp.ndarray:
    """y[:, t - direction*d] over t in [0, T) with reflect-pad semantics.

    y is (C, T), shifts run along lanes. direction=+1 gives the left
    operand y[:, t-d] (reflected for t < d), direction=-1 gives y[:, t+d]
    (reflected for t >= T-d). Edge strips are d (<= 9) single-column
    slices."""
    T = y.shape[1]
    if direction > 0:
        edge = [y[:, d - j:d - j + 1] for j in range(d)]   # cols y[d]..y[1]
        return jnp.concatenate(edge + [y[:, :T - d]], axis=1)
    edge = [y[:, T - 1 - j:T - j] for j in range(1, d + 1)]  # y[T-2]..y[T-d-1]
    return jnp.concatenate([y[:, d:]] + edge, axis=1)


def _leaky(v, negative_slope):
    # max(x, a*x) == leaky_relu for a < 1; avoids bf16 comparisons
    # (unsupported VPU op on v5e)
    return jnp.maximum(v, negative_slope * v)


def stack_body(x, w1, b1, w2, bout, num_blocks: int, kernel_size: int,
               negative_slope: float, compute_dtype):
    """Residual-stack compute on a (C, T) VMEM value. ``w1``/``b1``/``w2``/
    ``bout`` are indexable per-block (stacked array or Pallas ref). Shared by
    the standalone stack kernel and the whole-generator megakernel
    (fused_melgan.py)."""
    for blk in range(num_blocks):
        d = kernel_size ** blk
        y = _leaky(x, negative_slope)
        ym = _shift_reflect_lanes(y, d, +1)
        yp = _shift_reflect_lanes(y, d, -1)
        cat1 = jnp.concatenate([ym, y, yp], axis=0)        # (3C, T)
        h = (jnp.dot(w1[blk].astype(compute_dtype), cat1,
                     preferred_element_type=jnp.float32)
             + b1[blk].astype(jnp.float32)[:, None])
        # conv2 and the 1x1 shortcut share one dense matmul over
        # [leaky(h); x] — exactly the logical MAC count
        cat2 = jnp.concatenate([_leaky(h, negative_slope).astype(compute_dtype),
                                x], axis=0)                # (2C, T)
        x = (jnp.dot(w2[blk].astype(compute_dtype), cat2,
                     preferred_element_type=jnp.float32)
             + bout[blk].astype(jnp.float32)[:, None]
             ).astype(compute_dtype)
    return x


def _make_kernel(num_blocks: int, kernel_size: int, negative_slope: float,
                 compute_dtype, transpose_in_kernel: bool):
    def kernel(x_ref, w1_ref, b1_ref, w2_ref, bout_ref, out_ref):
        if transpose_in_kernel:
            xt = jnp.transpose(x_ref[0])  # (T, C) block -> (C, T) in VMEM
        else:
            xt = x_ref[0]  # (C, T) — input pre-transposed by the wrapper
        x = stack_body(xt.astype(compute_dtype), w1_ref, b1_ref, w2_ref,
                       bout_ref, num_blocks, kernel_size, negative_slope,
                       compute_dtype)
        if transpose_in_kernel:
            out_ref[0] = jnp.transpose(x).astype(out_ref.dtype)
        else:
            out_ref[0] = x.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("kernel_size", "negative_slope",
                                    "compute_dtype", "transpose_in_kernel",
                                    "interpret"))
def _fused_stack_packed(x: jnp.ndarray,
                        w1: jnp.ndarray, b1: jnp.ndarray,
                        w2: jnp.ndarray, bout: jnp.ndarray,
                        kernel_size: int = 3,
                        negative_slope: float = 0.2,
                        compute_dtype=jnp.float32,
                        transpose_in_kernel: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """x: (B, T, C) when transpose_in_kernel (layout conversion happens in
    VMEM), else (B, C, T) pre-transposed. Output has the input's layout."""
    if transpose_in_kernel:
        B, T, C = x.shape
        blk = (1, T, C)
        out_shape = jax.ShapeDtypeStruct((B, T, C), x.dtype)
    else:
        B, C, T = x.shape
        blk = (1, C, T)
        out_shape = jax.ShapeDtypeStruct((B, C, T), x.dtype)
    n_blocks = w1.shape[0]
    assert T > kernel_size ** (n_blocks - 1), "sequence shorter than dilation"
    full = lambda s: pl.BlockSpec(s, lambda b: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(n_blocks, kernel_size, negative_slope, compute_dtype,
                     transpose_in_kernel),
        out_shape=out_shape,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(blk, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w1.shape),
            full(b1.shape),
            full(w2.shape),
            full(bout.shape),
        ],
        out_specs=pl.BlockSpec(blk, lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1, w2, bout)


def pack_stack_params(stack: dict, num_res_blocks: int = 3,
                      dtype=jnp.float32):
    """Pack a folded (use_weight_norm=False) ResidualStack param subtree
    (models/vocoder/melgan.py names) into the kernel's operands.

    w1: (n, C, 3C) — the three transposed dilated-conv taps over columns
    [ym; y; yp]; w2: (n, C, 2C) — transposed 1x1 conv2 over rows [0:C]
    (leaky(h)) and the transposed 1x1 shortcut over rows [C:2C] (x);
    b1: (n, C); bout: (n, C) = conv2 bias + shortcut bias."""
    w1s, b1s, w2s, bouts = [], [], [], []
    for i in range(num_res_blocks):
        k1 = stack[f"block_{i}_conv1"]["conv"]["kernel"]   # (3, C, C) in->out
        ksc = stack[f"block_{i}_shortcut"]["kernel"][0]    # (C, C)
        k2 = stack[f"block_{i}_conv2"]["conv"]["kernel"][0]
        C = k1.shape[1]
        w1s.append(jnp.concatenate([k1[0].T, k1[1].T, k1[2].T], axis=1))
        b1s.append(stack[f"block_{i}_conv1"]["conv"]["bias"])
        w2s.append(jnp.concatenate([k2.T, ksc.T], axis=1))
        bouts.append(stack[f"block_{i}_conv2"]["conv"]["bias"]
                     + stack[f"block_{i}_shortcut"]["bias"])
    return (jnp.stack(w1s).astype(dtype), jnp.stack(b1s).astype(dtype),
            jnp.stack(w2s).astype(dtype), jnp.stack(bouts).astype(dtype))


def fused_residual_stack(x: jnp.ndarray, w1, b1, w2, bout,
                         kernel_size: int = 3, negative_slope: float = 0.2,
                         compute_dtype=jnp.float32,
                         transpose_in_kernel: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """NWC entry point: x (B, T, C) -> (B, T, C). Layout conversion to the
    (C, T) compute layout happens inside the kernel (VMEM relayout) by
    default; set transpose_in_kernel=False to do it with XLA transposes."""
    if transpose_in_kernel:
        return _fused_stack_packed(x, w1, b1, w2, bout,
                                   kernel_size=kernel_size,
                                   negative_slope=negative_slope,
                                   compute_dtype=compute_dtype,
                                   transpose_in_kernel=True,
                                   interpret=interpret)
    xt = jnp.swapaxes(x, 1, 2)
    yt = _fused_stack_packed(xt, w1, b1, w2, bout, kernel_size=kernel_size,
                             negative_slope=negative_slope,
                             compute_dtype=compute_dtype,
                             transpose_in_kernel=False,
                             interpret=interpret)
    return jnp.swapaxes(yt, 1, 2)


def stack_params_from_tree(stack: dict, num_res_blocks: int = 3):
    """Back-compat helper: pack params for fused_residual_stack."""
    return pack_stack_params(stack, num_res_blocks)
