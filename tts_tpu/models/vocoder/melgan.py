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
import jax.numpy as jnp

Array = jnp.ndarray


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

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        feats = []
        k = self.kernel_sizes[0] * self.kernel_sizes[1]  # 15
        y = _reflect_pad_t(x, (k - 1) // 2)
        y = nn.WeightNorm(nn.Conv(self.base_channels, (k,), padding="VALID",
                                  name="conv_in"))(y)
        y = nn.leaky_relu(y, 0.2)
        feats.append(y)

        ch = self.base_channels
        for i, df in enumerate(self.downsample_factors):
            ch = min(ch * df, self.max_channels)
            groups = max(1, ch // 4)
            ks = df * 10 + 1
            y = nn.WeightNorm(nn.Conv(
                ch, (ks,), strides=(df,),
                padding=[((ks - 1) // 2, (ks - 1) // 2)],
                feature_group_count=min(groups, y.shape[-1]),
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

    @nn.compact
    def __call__(self, x: Array) -> Tuple[List[Array], List[List[Array]]]:
        scores, feats = [], []
        y = x
        for i in range(self.num_scales):
            if i > 0:
                y = nn.avg_pool(y, (self.pooling_kernel,),
                                strides=(self.pooling_kernel // 2,),
                                padding=[(1, 1)])
            s, f = MelganDiscriminator(name=f"disc_{i}")(y)
            scores.append(s)
            feats.append(f)
        return scores, feats
