"""Pallas TPU weight-gradient kernel for near-depthwise grouped strided convs.

Target: the MelGAN discriminator's downsampling convs (kernel 41, stride 4,
1 or 4 in-channels and 4 out-channels per group — melgan.py:268-281,
≙ /root/reference/TTS/vocoder/models/melgan_discriminator.py:28-57).
XLA's conv wgrad for these shapes runs ~50x off the HBM roofline (~3.9 ms
per layer at B=32/seg=64 vs ~80 us of traffic; scripts/probe_disc_wgrad.py)
and grad[D real+fake] is 131 ms of the 161 ms GAN step
(scripts/profile_gan_step.py). The contraction per group is tiny (m x n =
1x4 or 4x4), so the MXU is useless — but as a VPU multiply-reduce with the
*time axis on lanes* and groups on sublanes the whole wgrad is ~2 ops/elem
over the conv's input:

    dW[t, i, j, g] = sum_{b,l} x[b, stride*l + t - pad, g*m + i]
                              * dy[b, l, g*n + j]

Key layout trick: with stride == 4, pad the time axis and fold it as
(L/4, 4); tap t = 4q + rr then reads the CONTIGUOUS slice x4[b, l+q, rr]
— no strided loads, just static lane-shifts by q <= (k-1)//4, the same
idiom as fused_resstack's shifted operands. Inputs are pre-transposed
outside the kernel (one cheap XLA pass) to:

    xT  (m, 4, G, B, L4)   — lanes = folded time (dense for any G)
    dyT (n*G, B, Lout)     — n-major rows so one broadcast of the x slice
                             covers all 4 output channels of the group

and the kernel runs k*m multiply-reduce steps per batch block, accumulating
dW across a batch-blocked grid (constant output block index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wgrad_kernel(xT_ref, dyT_ref, out_ref, *, k: int, m: int, n: int,
                  g: int, stride: int):
    """xT (m*S*G, Bblk, L4), dyT (n*G, Bblk, Lout), out (k*m, n*G).

    All refs stay >=2-D and every value 2/3-D (1-D layouts crash Mosaic:
    'layout_rank(implicit_dim)' check)."""
    nG, Bblk, Lout = dyT_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dy = dyT_ref[:]                                     # (nG, Bblk, Lout)
    for i in range(m):
        for t in range(k):
            q, rr = divmod(t, stride)
            base = (i * stride + rr) * g
            xs = xT_ref[base:base + g, :, q:q + Lout]   # (G, Bblk, Lout)
            # n-major broadcast: rows j*G+g of dy all multiply xs row g
            xb = jnp.concatenate([xs] * n, axis=0)      # (nG, Bblk, Lout)
            # two-stage reduction, all intermediates rank >= 2
            s2 = jnp.sum(xb * dy, axis=2)               # (nG, Bblk)
            acc = jnp.sum(s2, axis=1, keepdims=True)    # (nG, 1)
            row = t * m + i
            out_ref[:, row:row + 1] += acc


@functools.partial(jax.jit, static_argnames=("kernel_size", "stride",
                                             "groups", "block_b",
                                             "interpret"))
def grouped_conv_wgrad(x: jnp.ndarray, dy: jnp.ndarray, kernel_size: int,
                       stride: int, groups: int, block_b: int = 8,
                       interpret: bool = None) -> jnp.ndarray:
    """dL/dW for y = conv(x, W) with feature_group_count=groups, SAME-style
    symmetric padding (k-1)//2, odd kernel. x (B, L, cin), dy (B, Lout, cout);
    returns (k, cin//groups, cout) matching the flax/lax kernel layout."""
    if interpret is None:  # CPU (tests) has no Mosaic — interpret there
        interpret = jax.default_backend() == "cpu"
    B, L, cin = x.shape
    _, Lout, cout = dy.shape
    k, s, g = kernel_size, stride, groups
    m, n = cin // g, cout // g
    pad = (k - 1) // 2
    assert (L + 2 * pad) % s == 0 and k % 2 == 1
    assert Lout == (L + 2 * pad - k) // s + 1
    L4 = (L + 2 * pad) // s
    assert (k - 1) // s + Lout <= L4

    # f32 in-kernel regardless of caller dtype (the bf16 mixed-precision GAN
    # step feeds bf16 x/dy): the kernel's lane reduces would otherwise
    # accumulate in bf16. The kernel is VPU-MAC-bound, so the upcast is free.
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad), (0, 0)))
    # (B, L4, S, g, m) -> (m, S, g, B, L4) -> (m*S*g, B, L4): lanes = time
    xT = xp.reshape(B, L4, s, g, m).transpose(4, 2, 3, 0, 1) \
           .reshape(m * s * g, B, L4)
    # (B, Lout, g, n) -> (n, g, B, Lout) -> (n*g, B, Lout)
    dyT = dy.astype(jnp.float32).reshape(B, Lout, g, n).transpose(3, 2, 0, 1) \
            .reshape(n * g, B, Lout)

    bb = min(block_b, B)
    while B % bb:       # largest divisor of B <= block_b
        bb -= 1
    dW = pl.pallas_call(
        functools.partial(_wgrad_kernel, k=k, m=m, n=n, g=g, stride=s),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((m * s * g, bb, L4), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n * g, bb, Lout), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n * g, k * m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * g, k * m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # batch-blocked ACCUMULATION into the revisited output block:
            # the grid dim must be sequential ("arbitrary"), not "parallel"
            # — parallel semantics gave wrong sums on device (exact under
            # interpret): measured max_abs_err 3.09 on down_0
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xT, dyT)
    # (n, g, k, m) -> (k, m, g, n) -> (k, m, g*n): c_out = g_idx*n + j
    return dW.reshape(n, g, k, m).transpose(2, 3, 1, 0) \
             .reshape(k, m, cout).astype(x.dtype)


def _dgrad_kernel(dyT_ref, wT_ref, out_ref, acc_ref, *, k: int, m: int,
                  n: int, g: int, stride: int, L4: int):
    """dyT (n*G, Bblk, Lout), wT (G, k*m*n), out (m*S*G, Bblk, L4),
    acc scratch (G, Bblk, L4).

    dx in the same folded-time transposed layout as the wgrad kernel's
    input: row (i*S+ss)*G+gi at lane v is dxp[b, S*v+ss, gi*m+i], i.e. the
    PADDED input's gradient; the caller slices the pad off. For tap
    t = S*q+ss, output position S*(l+q)+ss receives W[t, i, gi*n+j] *
    dy[b, l, gi*n+j] — a per-group scalar broadcast times the resident dy
    rows, shift-accumulated along lanes (all static slices). Accumulation
    goes through a VMEM scratch ref: a pure-SSA concat/add chain made
    Mosaic stack-allocate every temporary (124 MB scoped-vmem OOM at
    down_2)."""
    nG, Bblk, Lout = dyT_ref.shape
    dy = dyT_ref[:]
    for i in range(m):
        for ss in range(stride):
            acc_ref[:] = jnp.zeros((g, Bblk, L4), jnp.float32)
            for q in range((k - ss + stride - 1) // stride):
                t = stride * q + ss
                for j in range(n):
                    col = (t * m + i) * n + j
                    w_col = wT_ref[:, col:col + 1].reshape(g, 1, 1)
                    acc_ref[:, :, q:q + Lout] += w_col * dy[j * g:(j + 1) * g]
            base = (i * stride + ss) * g
            out_ref[base:base + g, :, :] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("x_len", "stride", "groups",
                                             "block_b", "interpret"))
def grouped_conv_dgrad(dy: jnp.ndarray, kernel: jnp.ndarray, x_len: int,
                       stride: int, groups: int, block_b: int = 8,
                       interpret: bool = None) -> jnp.ndarray:
    """dL/dx for y = conv(x, W), same geometry contract as
    grouped_conv_wgrad. dy (B, Lout, cout), kernel (k, cin//g, cout);
    returns (B, x_len, cin)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Lout, cout = dy.shape
    k, m, _ = kernel.shape
    s, g = stride, groups
    n = cout // g
    pad = (k - 1) // 2
    L = x_len
    assert (L + 2 * pad) % s == 0 and k % 2 == 1
    assert Lout == (L + 2 * pad - k) // s + 1
    L4 = (L + 2 * pad) // s

    dyT = dy.astype(jnp.float32).reshape(B, Lout, g, n).transpose(3, 2, 0, 1) \
            .reshape(n * g, B, Lout)
    # (k, m, g, n) -> (g, k, m, n) -> (g, k*m*n): col = (t*m+i)*n+j
    wT = kernel.reshape(k, m, g, n).transpose(2, 0, 1, 3) \
               .reshape(g, k * m * n).astype(jnp.float32)

    bb = min(block_b, B)
    while B % bb:
        bb -= 1
    dxT = pl.pallas_call(
        functools.partial(_dgrad_kernel, k=k, m=m, n=n, g=g, stride=s,
                          L4=L4),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((n * g, bb, Lout), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k * m * n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m * s * g, bb, L4), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m * s * g, B, L4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g, bb, L4), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # Mosaic stack-allocates the per-tap product temporaries; the
            # down_2 geometry needs ~101 MB scoped (measured) — fits the
            # 128 MB VMEM but not the default 100 MB cap
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(dyT, wT)
    # (m, S, g, B, L4) -> (B, L4, S, g, m) -> (B, L+2p, cin) -> unpad
    dxp = dxT.reshape(m, s, g, B, L4).transpose(3, 4, 1, 2, 0) \
             .reshape(B, L + 2 * pad, g * m)
    return dxp[:, pad:pad + L, :].astype(dy.dtype)


def _conv_impl(x, kernel, stride, groups):
    pad = (kernel.shape[0] - 1) // 2
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NWC", "WIO", "NWC"))
    return lax.conv_general_dilated(
        x, kernel, (stride,), [(pad, pad)], feature_group_count=groups,
        dimension_numbers=dn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_conv_pallas_wgrad(x, kernel, stride, groups):
    """Grouped strided conv: XLA forward + dgrad, Pallas weight gradient."""
    return _conv_impl(x, kernel, stride, groups)


def _fwd(x, kernel, stride, groups):
    return _conv_impl(x, kernel, stride, groups), (x, kernel)


def _bwd(stride, groups, res, dy):
    x, kernel = res
    dx = grouped_conv_dgrad(dy, kernel, x.shape[1], stride, groups)
    dW = grouped_conv_wgrad(x, dy, kernel.shape[0], stride, groups)
    return dx, dW


grouped_conv_pallas_wgrad.defvjp(_fwd, _bwd)
