"""Multiband/Fullband MelGAN generator variants.

Capability parity with
/root/reference/TTS/vocoder/models/multiband_melgan_generator.py:7-39 and
fullband_melgan_generator.py:6.
"""

from __future__ import annotations

import jax.numpy as jnp

from tts_tpu.models.vocoder.melgan import MelganGenerator
from tts_tpu.models.vocoder.pqmf import PQMF

Array = jnp.ndarray


class MultibandMelganGenerator(MelganGenerator):
    """4-subband generator; full-band waveform = PQMF synthesis of outputs."""

    out_channels: int = 4
    base_channels: int = 384
    upsample_factors: tuple = (2, 8, 2, 2)
    inference_padding: int = 2

    @property
    def pqmf(self) -> PQMF:
        return PQMF(N=self.out_channels)

    def pqmf_analysis(self, x: Array) -> Array:
        return self.pqmf.analysis(x)

    def pqmf_synthesis(self, x: Array) -> Array:
        return self.pqmf.synthesis(x)

    def inference(self, c: Array) -> Array:
        p = self.inference_padding
        c = jnp.pad(c, ((0, 0), (p, p), (0, 0)), mode="edge")
        return self.pqmf.synthesis(self(c))


class FullbandMelganGenerator(MelganGenerator):
    """Full-band single-output variant (≙ fullband_melgan_generator.py:6)."""

    out_channels: int = 1
    base_channels: int = 512
    upsample_factors: tuple = (2, 8, 2, 2)
    inference_padding: int = 2
