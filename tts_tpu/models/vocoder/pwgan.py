"""ParallelWaveGAN: non-causal WaveNet generator + dilated-conv discriminators.

Capability parity with
/root/reference/TTS/vocoder/models/parallel_wavegan_generator.py:9-158,
parallel_wavegan_discriminator.py:8-197, and the conditioning upsampler
/root/reference/TTS/vocoder/layers/upsample.py:5-101. NWC layout; the
noise->waveform stack is 30 gated residual blocks whose dilated convs XLA
fuses with the gating elementwise ops.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class Stretch2d(nn.Module):
    """Nearest-neighbor time stretch (≙ upsample.py Stretch2d)."""

    scale: int

    def __call__(self, x: Array) -> Array:
        return jnp.repeat(x, self.scale, axis=1)


class ConvUpsample(nn.Module):
    """conv_in (context, VALID over pre-padded input) + per-factor
    nearest-stretch + shared smoothing conv over time
    (≙ ConvUpsample/UpsampleNetwork, upsample.py:5-101; conv_in k =
    2*aux_context_window+1 with no padding — the GAN dataset supplies the
    conv_pad context frames, upsample.py:84-86)."""

    upsample_factors: Sequence[int] = (4, 4, 4, 4)
    aux_channels: int = 80
    aux_context_window: int = 0
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, c: Array) -> Array:
        k = 2 * self.aux_context_window + 1
        conv_in = nn.Conv(self.aux_channels, (k,), padding="VALID",
                          use_bias=False, name="conv_in")
        if self.use_weight_norm:
            conv_in = nn.WeightNorm(conv_in)
        c = conv_in(c)
        x = c[..., None]  # (B, T, C, 1) treat freq as 2d height
        for i, s in enumerate(self.upsample_factors):
            x = Stretch2d(s)(x)
            k_t = 2 * s + 1
            conv = nn.Conv(1, (k_t, 1), padding=((s, s), (0, 0)),
                           use_bias=False, name=f"conv_{i}")
            if self.use_weight_norm:
                conv = nn.WeightNorm(conv)
            x = conv(x)
        return x[..., 0]  # (B, T*prod, C)


class ResidualBlock(nn.Module):
    """Gated dilated conv with aux conditioning 1x1, residual + skip
    (≙ /root/reference/TTS/vocoder/layers/parallel_wavegan.py:5)."""

    res_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    use_weight_norm: bool = True

    def _conv(self, features, kernel_size, name, **kw):
        conv = nn.Conv(features, kernel_size, use_bias=self.use_bias
                       if "use_bias" not in kw else kw.pop("use_bias"),
                       name=name, **kw)
        return nn.WeightNorm(conv) if self.use_weight_norm else conv

    @nn.compact
    def __call__(self, x: Array, c: Optional[Array]) -> Tuple[Array, Array]:
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = self._conv(self.gate_channels, (self.kernel_size,), "conv",
                       kernel_dilation=(self.dilation,),
                       padding=[(pad, pad)])(x)
        if c is not None:
            y = y + self._conv(self.gate_channels, (1,), "conv_aux",
                               use_bias=False)(c)
        a, b = jnp.split(y, 2, axis=-1)
        z = jnp.tanh(a) * nn.sigmoid(b)
        skip = self._conv(self.skip_channels, (1,), "conv_skip")(z)
        res = self._conv(self.res_channels, (1,), "conv_res")(z)
        # NOTE: * 0.25, not sqrt(0.5) — matches the reference exactly
        # (parallel_wavegan.py:85 `(self.conv1x1_out(x) + residual) *
        # (0.5**2)`, which itself deviates from the PWGAN paper)
        return (x + res) * 0.25, skip


class ParallelWaveganGenerator(nn.Module):
    """noise (B, T, 1) + mel (B, T_frames, aux) -> waveform (B, T, 1)
    (≙ parallel_wavegan_generator.py:9-158)."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    num_res_blocks: int = 30
    stacks: int = 3
    res_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 0
    upsample_factors: Sequence[int] = (4, 4, 4, 4)
    use_weight_norm: bool = True
    inference_padding: int = 2

    @nn.compact
    def __call__(self, z: Array, c: Array) -> Array:
        c_up = ConvUpsample(self.upsample_factors, self.aux_channels,
                            self.aux_context_window,
                            use_weight_norm=self.use_weight_norm,
                            name="upsample")(c)
        # trim/match lengths (context window padding can overshoot)
        T = z.shape[1]
        c_up = c_up[:, :T]
        first = nn.Conv(self.res_channels, (1,), name="first_conv")
        if self.use_weight_norm:
            first = nn.WeightNorm(first)
        x = first(z)
        skips = 0.0
        layers_per_stack = self.num_res_blocks // self.stacks
        for i in range(self.num_res_blocks):
            dilation = 2 ** (i % layers_per_stack)
            x, skip = ResidualBlock(
                self.res_channels, self.gate_channels, self.skip_channels,
                self.aux_channels, self.kernel_size, dilation,
                use_weight_norm=self.use_weight_norm,
                name=f"block_{i}")(x, c_up)
            skips = skips + skip
        skips = skips * float(np.sqrt(1.0 / self.num_res_blocks))
        y = nn.relu(skips)
        p1 = nn.Conv(self.skip_channels, (1,), name="post_conv1")
        p2 = nn.Conv(self.out_channels, (1,), name="post_conv2")
        if self.use_weight_norm:
            p1, p2 = nn.WeightNorm(p1), nn.WeightNorm(p2)
        y = p1(y)
        y = nn.relu(y)
        y = p2(y)
        return y

    def inference(self, c: Array, rng=None) -> Array:
        """Replicate-pad conditioning, draw the noise internally
        (≙ parallel_wavegan_generator.py:121-127)."""
        import jax

        p = self.inference_padding
        c = jnp.pad(c, ((0, 0), (p, p), (0, 0)), mode="edge")
        scale = int(np.prod(self.upsample_factors))
        t_out = (c.shape[1] - 2 * self.aux_context_window) * scale
        if rng is None:
            rng = self.make_rng("noise")
        z = jax.random.normal(rng, (c.shape[0], t_out, self.in_channels))
        return self(z, c)

    @staticmethod
    def receptive_field_size(kernel_size=3, num_res_blocks=30, stacks=3) -> int:
        """≙ parallel_wavegan_generator.py:146-155."""
        assert num_res_blocks % stacks == 0
        layers_per_cycle = num_res_blocks // stacks
        dilations = [2 ** (i % layers_per_cycle) for i in range(num_res_blocks)]
        return (kernel_size - 1) * sum(dilations) + 1


class ParallelWaveganDiscriminator(nn.Module):
    """10-layer dilated conv discriminator (≙ parallel_wavegan_discriminator.py:8-81)."""

    num_layers: int = 10
    conv_channels: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = x
        for i in range(self.num_layers - 1):
            dilation = max(1, i)
            pad = (self.kernel_size - 1) // 2 * dilation
            y = nn.WeightNorm(nn.Conv(self.conv_channels, (self.kernel_size,),
                                      kernel_dilation=(dilation,),
                                      padding=[(pad, pad)], name=f"conv_{i}"))(y)
            y = nn.leaky_relu(y, 0.2)
        y = nn.WeightNorm(nn.Conv(1, (self.kernel_size,), padding="SAME",
                                  name="conv_out"))(y)
        return y


class ResidualParallelWaveganDiscriminator(nn.Module):
    """WaveNet-style residual discriminator (≙ parallel_wavegan_discriminator.py:83-197)."""

    num_layers: int = 30
    stacks: int = 3
    res_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Conv(self.res_channels, (1,), name="first_conv")(x)
        y = nn.leaky_relu(y, 0.2)
        skips = 0.0
        layers_per_stack = self.num_layers // self.stacks
        for i in range(self.num_layers):
            dilation = 2 ** (i % layers_per_stack)
            y, skip = ResidualBlock(
                self.res_channels, self.gate_channels, self.skip_channels,
                kernel_size=self.kernel_size, dilation=dilation,
                name=f"block_{i}")(y, None)
            skips = skips + skip
        skips = skips * float(np.sqrt(1.0 / self.num_layers))
        z = nn.leaky_relu(skips, 0.2)
        z = nn.Conv(self.skip_channels, (1,), name="post_conv1")(z)
        z = nn.leaky_relu(z, 0.2)
        return nn.Conv(1, (1,), name="post_conv2")(z)
