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
    """Per-factor nearest-stretch + smoothing conv over (time, freq)
    (≙ UpsampleNetwork/ConvInUpsampleNetwork, upsample.py:5-101)."""

    upsample_factors: Sequence[int] = (4, 4, 4, 4)
    aux_channels: int = 80
    aux_context_window: int = 0

    @nn.compact
    def __call__(self, c: Array) -> Array:
        # optional context conv before upsampling (ConvInUpsampleNetwork)
        if self.aux_context_window > 0:
            k = 2 * self.aux_context_window + 1
            c = nn.Conv(self.aux_channels, (k,), padding="SAME", use_bias=False,
                        name="conv_in")(c)
        x = c[..., None]  # (B, T, C, 1) treat freq as 2d height
        for i, s in enumerate(self.upsample_factors):
            x = Stretch2d(s)(x)
            k_t = 2 * s + 1
            x = nn.Conv(1, (k_t, 1), padding=((k_t // 2, k_t // 2), (0, 0)),
                        use_bias=False, name=f"conv_{i}")(x)
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

    @nn.compact
    def __call__(self, x: Array, c: Optional[Array]) -> Tuple[Array, Array]:
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = nn.Conv(self.gate_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,),
                    padding=[(pad, pad)], use_bias=self.use_bias,
                    name="conv")(x)
        if c is not None:
            y = y + nn.Conv(self.gate_channels, (1,), use_bias=False,
                            name="conv_aux")(c)
        a, b = jnp.split(y, 2, axis=-1)
        z = jnp.tanh(a) * nn.sigmoid(b)
        skip = nn.Conv(self.skip_channels, (1,), use_bias=self.use_bias,
                       name="conv_skip")(z)
        res = nn.Conv(self.res_channels, (1,), use_bias=self.use_bias,
                      name="conv_res")(z)
        return (x + res) * float(np.sqrt(0.5)), skip


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
    aux_context_window: int = 2
    upsample_factors: Sequence[int] = (4, 4, 4, 4)

    @nn.compact
    def __call__(self, z: Array, c: Array) -> Array:
        c_up = ConvUpsample(self.upsample_factors, self.aux_channels,
                            self.aux_context_window, name="upsample")(c)
        # trim/match lengths (context window padding can overshoot)
        T = z.shape[1]
        c_up = c_up[:, :T]
        x = nn.Conv(self.res_channels, (1,), name="first_conv")(z)
        skips = 0.0
        layers_per_stack = self.num_res_blocks // self.stacks
        for i in range(self.num_res_blocks):
            dilation = 2 ** (i % layers_per_stack)
            x, skip = ResidualBlock(
                self.res_channels, self.gate_channels, self.skip_channels,
                self.aux_channels, self.kernel_size, dilation,
                name=f"block_{i}")(x, c_up)
            skips = skips + skip
        skips = skips * float(np.sqrt(1.0 / self.num_res_blocks))
        y = nn.relu(skips)
        y = nn.Conv(self.skip_channels, (1,), name="post_conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1,), name="post_conv2")(y)
        return y

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
