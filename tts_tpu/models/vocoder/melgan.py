"""MelGAN generator + discriminators (NWC layout, weight-normalized convs).

Capability parity with /root/reference/TTS/vocoder/models/melgan_generator.py:8-97,
melgan_discriminator.py:6-78, melgan_multiscale_discriminator.py:6-41 and
/root/reference/TTS/vocoder/layers/melgan.py:5-45 (ResidualStack) —
re-designed for XLA: reflection padding is explicit (jnp.pad) so every conv is
a fused VALID conv; transposed convs use SAME padding for exact s× upsampling.
"""

from __future__ import annotations

from typing import Sequence, Tuple, List

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


import functools

from jax import lax


def _grouped_conv_impl(x, kernel, stride, groups):
    pad = (kernel.shape[0] - 1) // 2
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NWC", "WIO", "NWC"))
    return lax.conv_general_dilated(
        x, kernel, (stride,), [(pad, pad)], feature_group_count=groups,
        dimension_numbers=dn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grouped_conv_hybrid(x, kernel, stride, groups):
    """Grouped strided conv whose WEIGHT gradient bypasses XLA's conv-wgrad.

    MEASURED NEGATIVE RESULT (kept as the record): the MelGAN
    discriminator's grouped convs are near-depthwise (1->4 or 4->4 channels
    per group, kernel 41) and grad[D real+fake] is 131 ms of the 160 ms GAN
    step at B=32 (scripts/profile_gan_step.py) — but BOTH replacement
    lowerings lose to XLA's conv paths: this hybrid (conv fwd/dgrad +
    tap-einsum wgrad) measured 194.4 ms/step, and the full tap-shift
    forward 958.9 ms/step. The per-tap slices+einsums pay more HBM traffic
    than XLA's conv decomposition saves (and jax.vjp in the bwd re-runs the
    fwd conv). Do not revisit without a fused (Pallas) wgrad hypothesis."""
    return _grouped_conv_impl(x, kernel, stride, groups)


def _grouped_conv_hybrid_fwd(x, kernel, stride, groups):
    return _grouped_conv_impl(x, kernel, stride, groups), (x, kernel)


def _grouped_conv_hybrid_bwd(stride, groups, res, dy):
    x, kernel = res
    k, m, cout = kernel.shape
    g, n = groups, cout // groups
    B, L, _ = x.shape
    l_out = dy.shape[1]
    pad = (k - 1) // 2
    # dx: XLA's conv transpose (not the slow path)
    _, vjp_x = jax.vjp(
        lambda xx: _grouped_conv_impl(xx, kernel, stride, groups), x)
    dx, = vjp_x(dy)
    # dW[t] = <x strided-sliced at tap t, dy> contracted over batch and time
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    dyg = dy.reshape(B, l_out, g, n)
    dW = jnp.stack([
        jnp.einsum(
            "blgm,blgn->mgn",
            lax.slice_in_dim(xp, t, t + stride * (l_out - 1) + 1, stride,
                             axis=1).reshape(B, l_out, g, m),
            dyg)
        for t in range(k)]).reshape(k, m, cout)
    return dx, dW


_grouped_conv_hybrid.defvjp(_grouped_conv_hybrid_fwd,
                            _grouped_conv_hybrid_bwd)


class GroupedStridedConv(nn.Module):
    """Grouped strided 1d conv, selectable lowering (see
    _grouped_conv_hybrid). Param tree matches ``nn.Conv(features, (k,),
    strides, feature_group_count=groups)`` (kernel (k, in/g, features),
    bias) so checkpoints interchange.

    mode "hybrid": XLA conv fwd/dgrad + tap-einsum wgrad (194 ms GAN step).
    mode "tap_shift": full tap-shift forward (959 ms). Both SLOWER than the
    plain XLA grouped conv (160 ms); kept as the recorded negatives."""

    features: int
    kernel_size: int
    stride: int
    groups: int
    mode: str = "hybrid"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, L, cin = x.shape
        k, g = self.kernel_size, self.groups
        m = cin // g                       # in-channels per group
        n = self.features // g             # out-channels per group
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, m, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.mode == "pallas_wgrad":
            # XLA fwd/dgrad + Pallas VPU wgrad (grouped_conv_grad.py):
            # measured 2026-08-21 per-pass wgrad 4.5 -> ~2.1 ms on each of
            # down_0..2 at B=32/seg=64 (scripts/probe_wgrad_pallas.py)
            from tts_tpu.ops.pallas.grouped_conv_grad import \
                grouped_conv_pallas_wgrad
            return grouped_conv_pallas_wgrad(x, kernel, self.stride, g) + bias
        if self.mode == "hybrid":
            return _grouped_conv_hybrid(x, kernel, self.stride, g) + bias
        pad = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        l_out = (L + 2 * pad - k) // self.stride + 1
        w = kernel.reshape(k, m, g, n)
        out = jnp.zeros((B, l_out, g, n), x.dtype)
        for t in range(k):
            sl = jax.lax.slice_in_dim(
                xp, t, t + self.stride * (l_out - 1) + 1, self.stride, axis=1)
            out = out + jnp.einsum("blgm,mgn->blgn",
                                   sl.reshape(B, l_out, g, m), w[t])
        return out.reshape(B, l_out, self.features) + bias


def _reflect_pad_t(x: Array, pad: int) -> Array:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class WNConv(nn.Module):
    """Weight-normalized 1d conv with reflection padding (time axis).

    ``use_weight_norm=False`` builds the same conv without the WeightNorm
    wrapper — for inference with folded kernels (≙ remove_weight_norm,
    melgan_generator.py:90-97); see fold_weight_norm()."""

    features: int
    kernel_size: int
    dilation: int = 1
    stride: int = 1
    pad_mode: str = "reflect"  # "reflect" | "zeros" | "valid"
    groups: int = 1
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = nn.Conv(
            self.features, kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding="VALID", name="conv")
        if self.use_weight_norm:
            conv = nn.WeightNorm(conv)
        pad = (self.kernel_size - 1) * self.dilation
        if self.pad_mode == "valid":
            return conv(x)
        if self.pad_mode == "reflect":
            # symmetric reflect pad (assumes odd kernel; matches reference's
            # ReflectionPad1d(base_pad))
            x = _reflect_pad_t(x, pad // 2)
            if pad % 2:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)), mode="reflect")
            return conv(x)
        x = jnp.pad(x, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
        return conv(x)


class ResidualStack(nn.Module):
    """n blocks of [LReLU, dilated conv(k=3, d=3^i), LReLU, 1x1] + 1x1 shortcut
    (≙ /root/reference/TTS/vocoder/layers/melgan.py:5-45)."""

    channels: int
    num_res_blocks: int = 3
    kernel_size: int = 3
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_res_blocks):
            dilation = self.kernel_size ** i
            y = nn.leaky_relu(x, 0.2)
            y = WNConv(self.channels, self.kernel_size, dilation=dilation,
                       use_weight_norm=self.use_weight_norm,
                       name=f"block_{i}_conv1")(y)
            y = nn.leaky_relu(y, 0.2)
            y = WNConv(self.channels, 1, use_weight_norm=self.use_weight_norm,
                       name=f"block_{i}_conv2")(y)
            shortcut_conv = nn.Conv(self.channels, (1,), padding="VALID",
                                    name=f"block_{i}_shortcut")
            if self.use_weight_norm:
                shortcut_conv = nn.WeightNorm(shortcut_conv)
            x = y + shortcut_conv(x)
        return x


class MelganGenerator(nn.Module):
    """mel (B, T, 80) -> waveform (B, T*prod(upsample), out_channels)
    (≙ MelganGenerator, melgan_generator.py:8-97)."""

    in_features: int = 80
    out_channels: int = 1
    proj_kernel: int = 7
    base_channels: int = 512
    upsample_factors: Sequence[int] = (8, 8, 2, 2)
    num_res_blocks: int = 3
    inference_padding: int = 2
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, c: Array) -> Array:
        x = WNConv(self.base_channels, self.proj_kernel,
                   use_weight_norm=self.use_weight_norm, name="proj_in")(c)
        ch = self.base_channels
        for i, factor in enumerate(self.upsample_factors):
            ch //= 2
            x = nn.leaky_relu(x, 0.2)
            up = nn.ConvTranspose(
                ch, kernel_size=(2 * factor,), strides=(factor,),
                padding="SAME", name=f"upsample_{i}")
            if self.use_weight_norm:
                up = nn.WeightNorm(up)
            x = up(x)
            x = ResidualStack(ch, self.num_res_blocks,
                              use_weight_norm=self.use_weight_norm,
                              name=f"resstack_{i}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = WNConv(self.out_channels, self.proj_kernel,
                   use_weight_norm=self.use_weight_norm, name="proj_out")(x)
        return jnp.tanh(x)

    def inference(self, c: Array) -> Array:
        """Replicate-pad conditioning frames before decoding
        (≙ inference pad, melgan_generator.py:90-95)."""
        p = self.inference_padding
        c = jnp.pad(c, ((0, 0), (p, p), (0, 0)), mode="edge")
        return self(c)


class MelganDiscriminator(nn.Module):
    """Strided grouped-conv discriminator returning (score, per-layer feats)
    (≙ melgan_discriminator.py:6-78)."""

    kernel_sizes: Tuple[int, int] = (5, 3)
    base_channels: int = 16
    max_channels: int = 1024
    downsample_factors: Sequence[int] = (4, 4, 4, 4)
    # downsample kernel length = df * downsample_kernel_mult + 1 (reference
    # hard-codes 10 -> 41 taps, melgan_discriminator.py:44). The D backward
    # is MAC-roofline-bound on the VPU (CLAUDE.md), so taps are the ONLY
    # remaining lever: 5 -> 21 taps halves D-grad MACs (GAN-D algorithmic
    # lever, VERDICT r4 item 7; trained comparison in
    # scripts/train_real_ljspeech.py --model gan --d_taps).
    downsample_kernel_mult: int = 10
    # "auto" -> "pallas_wgrad" on TPU (XLA fwd + Pallas VPU wgrad/dgrad,
    # ops/pallas/grouped_conv_grad.py): grad[D real+fake] 131.7 -> 75.2 ms
    # and the full GAN G+D step 160.7 -> 113.4 ms at B=32/seg=64 (measured
    # 2026-08-21, scripts/profile_gan_wgrad.py + bench_train_steps.py
    # gan_pallas). On CPU "auto" stays "conv". The two XLA-level
    # re-lowerings remain the measured-negative record (hybrid-wgrad
    # 194.4 ms, tap_shift 958.9 ms — 2026-08-20).
    # NOTE "auto" resolves via jax.default_backend() at TRACE time, so
    # discriminator gradients take different code paths on CPU vs TPU
    # (XLA conv wgrad vs the Pallas kernel). Param trees interchange and
    # both paths are equivalence-tested, but a CPU-green run does not
    # exercise the TPU production gradient path — the device verify
    # checklist (CLAUDE.md) includes one non-interpret TPU run of
    # tests/test_grouped_conv_grad.py for exactly this reason.
    conv_lowering: str = "auto"

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        feats = []
        k = self.kernel_sizes[0] * self.kernel_sizes[1]  # 15
        y = _reflect_pad_t(x, (k - 1) // 2)
        y = nn.WeightNorm(nn.Conv(self.base_channels, (k,), padding="VALID",
                                  name="conv_in"))(y)
        y = nn.leaky_relu(y, 0.2)
        feats.append(y)

        lowering = self.conv_lowering
        if lowering == "auto":
            lowering = ("pallas_wgrad" if jax.default_backend() == "tpu"
                        else "conv")
        ch = self.base_channels
        for i, df in enumerate(self.downsample_factors):
            ch = min(ch * df, self.max_channels)
            groups = max(1, ch // 4)
            ks = df * self.downsample_kernel_mult + 1
            g = min(groups, y.shape[-1])
            cin = y.shape[-1]
            use_pallas = (lowering == "pallas_wgrad" and cin // g == 1
                          and df == 4 and (y.shape[1] + ks - 1) % df == 0)
            if use_pallas or lowering in ("hybrid", "tap_shift"):
                mode = "pallas_wgrad" if use_pallas else lowering
                y = nn.WeightNorm(GroupedStridedConv(
                    ch, ks, df, g, mode=mode, name=f"down_{i}"))(y)
            else:
                y = nn.WeightNorm(nn.Conv(
                    ch, (ks,), strides=(df,),
                    padding=[((ks - 1) // 2, (ks - 1) // 2)],
                    feature_group_count=g,
                    name=f"down_{i}"))(y)
            y = nn.leaky_relu(y, 0.2)
            feats.append(y)

        y = nn.WeightNorm(nn.Conv(
            min(ch * 2, self.max_channels), (self.kernel_sizes[0],),
            padding="SAME", name="conv_post1"))(y)
        y = nn.leaky_relu(y, 0.2)
        feats.append(y)
        score = nn.WeightNorm(nn.Conv(1, (self.kernel_sizes[1],),
                                      padding="SAME", name="conv_out"))(y)
        return score, feats


class MelganMultiscaleDiscriminator(nn.Module):
    """3 discriminators at avg-pooled scales (≙ melgan_multiscale_discriminator.py:6-41)."""

    num_scales: int = 3
    pooling_kernel: int = 4
    conv_lowering: str = "auto"
    downsample_kernel_mult: int = 10

    @nn.compact
    def __call__(self, x: Array) -> Tuple[List[Array], List[List[Array]]]:
        scores, feats = [], []
        y = x
        for i in range(self.num_scales):
            if i > 0:
                y = nn.avg_pool(y, (self.pooling_kernel,),
                                strides=(self.pooling_kernel // 2,),
                                padding=[(1, 1)])
            s, f = MelganDiscriminator(
                conv_lowering=self.conv_lowering,
                downsample_kernel_mult=self.downsample_kernel_mult,
                name=f"disc_{i}")(y)
            scores.append(s)
            feats.append(f)
        return scores, feats
