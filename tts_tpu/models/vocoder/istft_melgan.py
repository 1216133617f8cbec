"""iSTFT-head MelGAN generator (iSTFTNet-style "C8C8I" geometry).

The measured local optimum of the MB-MelGAN serving megakernel (~5.4 ms at
B128, CLAUDE.md) is bound by the small-channel late-stage matmuls — the
x2/x2 tail stages where C has decayed to 48/24.  This family removes those
stages entirely: the conv body stops at 1/4 of the waveform rate and the
last x4 comes from a CLOSED-FORM inverse STFT on a predicted
(log-magnitude, phase) spectrum — one tiny basis matmul plus a stride-4
overlap-add, both MXU/XLA-friendly, instead of two more conv stacks.

No reference counterpart (the reference's vocoder generators are
melgan_generator.py / multiband_melgan_generator.py / fullband variants /
parallel_wavegan.py); this is a capability addition following Kaneko et
al., "iSTFTNet: Fast and Lightweight Mel-Spectrogram Vocoder Incorporating
Inverse Short-Time Fourier Transform" (ICASSP 2022) — architecture idea
only, implementation from scratch.

TPU-first details:
- irfft is an explicit (2*(n_fft/2+1), n_fft) cosine/sine basis matmul —
  no complex dtype, fuses into the head conv's epilogue.
- overlap-add is a stride-`hop` ConvTranspose with a FIXED identity kernel
  (windowing folded into the kernel), so XLA sees one dense conv instead
  of a scatter-add.
- The window-sum-squares normalization is a host-precomputed constant
  vector (static shapes), matching `tts_tpu.audio.dsp.istft` semantics
  exactly (tests/test_istft_melgan.py asserts equality with the complex
  scatter-add reference implementation).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.audio import mel as _mel
from tts_tpu.models.vocoder.melgan import ResidualStack, WNConv

Array = jnp.ndarray


@lru_cache(maxsize=None)
def _istft_constants(n_fft: int, hop: int, n_frames: int):
    """Host-side numpy constants for the closed-form iSTFT.

    Returns (basis, ola_kernel, inv_wss):
      basis      (2*(n_fft//2+1), n_fft)  real irfft as a matmul;
      ola_kernel (n_fft, n_fft, 1)        windowed identity for the
                                          stride-`hop` ConvTranspose;
      inv_wss    (out_len,)               1 / window-sum-squares.
    Plain numpy (NOT jnp): these are constructed under an enclosing jit via
    module attributes — any jnp op here would become a tracer (the PQMF
    lesson, CLAUDE.md).
    """
    bins = n_fft // 2 + 1
    n = np.arange(n_fft)
    k = np.arange(bins)[:, None]
    # irfft(a + ib)[n] = 1/N * sum_k w_k * (a_k cos(2pi k n/N) - b_k sin(..))
    # with w_k = 1 for DC/Nyquist, 2 for interior bins (hermitian fold).
    w = np.full((bins, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    ang = 2.0 * np.pi * k * n[None, :] / n_fft
    cos_basis = w * np.cos(ang) / n_fft
    sin_basis = -w * np.sin(ang) / n_fft
    basis = np.concatenate([cos_basis, sin_basis], axis=0).astype(np.float32)

    window = _mel.pad_center(_mel.hann_window(n_fft), n_fft).astype(np.float32)
    # lax.conv_transpose(transpose_kernel=False) CONVOLVES (flips the
    # kernel's W axis), so windowed overlap-add
    #   y[t] += frames[l, c] * window[c]  at  t = l*hop + c
    # needs the windowed identity REVERSED along W (verified vs a numpy
    # OLA oracle; the un-reversed kernel scatters frames time-flipped).
    ola_kernel = (np.eye(n_fft, dtype=np.float32)
                  * window[None, :])[::-1][..., None].copy()

    out_len = n_fft + hop * (n_frames - 1)
    wss = np.zeros(out_len, np.float32)
    for l in range(n_frames):
        wss[l * hop:l * hop + n_fft] += window ** 2
    inv_wss = (1.0 / np.maximum(wss, 1e-10)).astype(np.float32)
    return basis, ola_kernel, inv_wss


def istft_head(spec_ri: Array, n_fft: int, hop: int) -> Array:
    """Closed-form iSTFT: (B, n_frames, 2*(n_fft//2+1)) real/imag-stacked
    spectrum -> (B, n_fft + hop*(n_frames-1)) waveform.  Numerics ==
    `audio.dsp.istft(spec, center=False)` on the same complex spectrum."""
    n_frames = spec_ri.shape[-2]
    basis, ola_kernel, inv_wss = _istft_constants(n_fft, hop, n_frames)
    frames = spec_ri @ jnp.asarray(basis)          # (B, n_frames, n_fft)
    wav = jax.lax.conv_transpose(
        frames, jnp.asarray(ola_kernel), strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))   # (B, out_len, 1)
    return wav[..., 0] * jnp.asarray(inv_wss)


class ISTFTMelganGenerator(nn.Module):
    """mel (B, T, 80) -> waveform (B, T*prod(upsample)*hop_head, 1).

    Geometry: upsample_factors=(8, 8) + n_fft_head=16/hop_head=4 keeps the
    total hop at 8*8*4 = 256 == the frameworks' audio hop, so this slots
    into the GAN trainer and Synthesizer wherever a MelGAN-family
    generator does."""

    in_features: int = 80
    proj_kernel: int = 7
    base_channels: int = 512
    upsample_factors: Sequence[int] = (8, 8)
    num_res_blocks: int = 3
    n_fft_head: int = 16
    hop_head: int = 4
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
        bins = self.n_fft_head // 2 + 1
        head = WNConv(2 * bins, self.proj_kernel,
                      use_weight_norm=self.use_weight_norm,
                      name="proj_head")(x)
        # exp-bounded magnitude + free phase (iSTFTNet head)
        log_mag, phase = head[..., :bins], head[..., bins:]
        mag = jnp.exp(jnp.clip(log_mag, -12.0, 6.0))
        spec_ri = jnp.concatenate(
            [mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
        wav = istft_head(spec_ri, self.n_fft_head, self.hop_head)
        # crop the OLA tail so the output length is exactly
        # T * prod(upsample) * hop_head (frame l covers [l*hop, l*hop+n_fft))
        out_len = spec_ri.shape[-2] * self.hop_head
        return jnp.tanh(wav[:, :out_len])[..., None]

    def inference(self, c: Array) -> Array:
        p = self.inference_padding
        c = jnp.pad(c, ((0, 0), (p, p), (0, 0)), mode="edge")
        return self(c)
