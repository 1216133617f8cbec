"""GAN-TTS Random Window Discriminators.

Capability parity with
/root/reference/TTS/vocoder/models/random_window_discriminator.py:5-225:
per-window-size unconditional (DBlock pyramid over raw audio crops) and
conditional (GBlock conditioning on the matching mel-frame crop)
discriminators. Random crop *offsets* are sampled inside the graph with a
passed PRNG key and applied with dynamic_slice — window sizes stay static so
every branch compiles once (SURVEY.md §7 hard-parts #4).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class DBlock(nn.Module):
    """Downsampling residual block (GAN-TTS DBlock, ≙ random_window_discriminator.py:5-60)."""

    channels: int
    downsample: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = x
        if self.downsample > 1:
            y = nn.avg_pool(y, (self.downsample,), strides=(self.downsample,))
        res = nn.Conv(self.channels, (1,), name="res_conv")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3,), padding="SAME", name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3,), kernel_dilation=(2,), padding="SAME",
                    name="conv2")(y)
        return y + res


class GBlock(nn.Module):
    """Conditional block injecting features via addition
    (≙ random_window_discriminator.py:62-153 ConditionalDBlock role)."""

    channels: int

    @nn.compact
    def __call__(self, x: Array, cond: Array) -> Array:
        res = nn.Conv(self.channels, (1,), name="res_conv")(x)
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3,), padding="SAME", name="conv1")(y)
        y = y + nn.Conv(self.channels, (1,), name="cond_conv")(cond)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3,), kernel_dilation=(2,), padding="SAME",
                    name="conv2")(y)
        return y + res


class _UncondDiscriminator(nn.Module):
    downsample_factors: Sequence[int] = (8, 4)
    base_channels: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ch = self.base_channels
        y = DBlock(ch, 1, name="in_block")(x)
        for i, f in enumerate(self.downsample_factors):
            ch = min(ch * f, 512)
            y = DBlock(ch, f, name=f"down_{i}")(y)
        y = nn.relu(y)
        return nn.Dense(1, name="out")(y.mean(axis=1))


class _CondDiscriminator(nn.Module):
    audio_downsample_factors: Sequence[int]
    base_channels: int = 64

    @nn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        ch = self.base_channels
        y = DBlock(ch, 1, name="in_block")(x)
        for i, f in enumerate(self.audio_downsample_factors):
            ch = min(ch * f, 512)
            y = DBlock(ch, f, name=f"down_{i}")(y)
        # after downsampling to frame rate, inject conditioning
        T = min(y.shape[1], c.shape[1])
        y = GBlock(ch, name="cond_block")(y[:, :T], c[:, :T])
        y = nn.relu(y)
        return nn.Dense(1, name="out")(y.mean(axis=1))


class RandomWindowDiscriminator(nn.Module):
    """(x (B, T, 1), c (B, T_frames, C), rng) -> list of window scores
    (≙ RandomWindowDiscriminator, random_window_discriminator.py:155-225)."""

    cond_channels: int = 80
    hop_length: int = 256
    window_sizes: Sequence[int] = (512, 1024, 2048, 4096, 8192)

    def _crop(self, x: Array, key, size: int, axis: int = 1) -> Array:
        max_start = x.shape[axis] - size
        start = jax.random.randint(key, (), 0, max(max_start, 0) + 1)
        return jax.lax.dynamic_slice_in_dim(x, start, size, axis)

    @nn.compact
    def __call__(self, x: Array, c: Optional[Array] = None,
                 rng: Optional[Array] = None) -> Tuple[List[Array], List]:
        if rng is None:
            rng = self.make_rng("rwd")
        scores: List[Array] = []
        for i, ws in enumerate(self.window_sizes):
            ws = min(ws, x.shape[1])
            key_u, key_c, rng = jax.random.split(rng, 3)
            xw = self._crop(x, key_u, ws)
            scores.append(_UncondDiscriminator(name=f"uncond_{i}")(xw))
            if c is not None:
                frames = max(ws // self.hop_length, 1)
                frames = min(frames, c.shape[1])
                # audio window aligned with a random frame window
                max_f0 = c.shape[1] - frames
                f0 = jax.random.randint(key_c, (), 0, max(max_f0, 0) + 1)
                cw = jax.lax.dynamic_slice_in_dim(c, f0, frames, 1)
                xw2 = jax.lax.dynamic_slice_in_dim(
                    x, f0 * self.hop_length,
                    min(frames * self.hop_length, x.shape[1]), 1)
                # downsample audio to frame rate in two stages
                f_total = self.hop_length
                factors = []
                rem = f_total
                for f in (8, 4, 4, 2):
                    if rem % f == 0 and rem > 1:
                        factors.append(f)
                        rem //= f
                if rem > 1:
                    factors.append(rem)
                scores.append(_CondDiscriminator(
                    tuple(factors), name=f"cond_{i}")(xw2, cw))
        return scores, []
