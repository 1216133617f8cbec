"""Device-resident DSP ops (pure jnp, jittable, batchable).

TPU-native replacement for the numpy/librosa internals of the reference
``AudioProcessor`` (/root/reference/TTS/utils/audio.py:191-279) and the torch
STFT wrapper used by vocoder losses (/root/reference/TTS/vocoder/layers/losses.py:7-28).
Everything here runs on-device so spectral losses and Griffin-Lim never leave HBM.

Conventions match librosa: periodic Hann window center-padded to ``n_fft``,
reflect signal padding of ``n_fft // 2`` when ``center=True``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.audio import mel as _mel


def _frame(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Extract overlapping frames; y: (..., T) -> (..., n_frames, frame_length)."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(frame_length)[None, :]
    )
    return y[..., idx]


def stft(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Short-time Fourier transform. y: (..., T) -> complex (..., n_frames, n_fft//2+1).

    Note the frame axis is second-to-last (time-major), unlike librosa's
    (bins, frames): time-major keeps the 128-lane axis on frequency bins,
    which is the natural TPU layout for downstream mel matmuls.
    """
    if window is None:
        window = jnp.asarray(_mel.pad_center(_mel.hann_window(win_length), n_fft))
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode=pad_mode)
    frames = _frame(y, n_fft, hop_length) * window
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT with window-sum-squares normalization (griffin-lim companion).

    spec: complex (..., n_frames, n_fft//2+1) -> (..., T).
    """
    window = jnp.asarray(_mel.pad_center(_mel.hann_window(win_length), n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # overlap-add via segment sum on scattered indices
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    ).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (-1,))
    out = jnp.zeros(frames.shape[:-2] + (out_len,), dtype=flat.dtype)
    out = out.at[..., idx].add(flat)

    wss = jnp.zeros((out_len,), dtype=window.dtype)
    wss = wss.at[idx].add(jnp.tile(window**2, n_frames))
    out = out / jnp.maximum(wss, 1e-10)

    if center:
        out = out[..., n_fft // 2:]
        out_len -= n_fft // 2
    if length is not None:
        out = out[..., :length]
    else:
        if center:
            out = out[..., : out_len - n_fft // 2]
    return out


def magnitude(spec_complex: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(spec_complex)


def amp_to_db(x: jnp.ndarray, spec_gain: float = 20.0) -> jnp.ndarray:
    """`spec_gain * log10(max(x, 1e-5))` (TTS/utils/audio.py:191-193)."""
    return spec_gain * jnp.log10(jnp.maximum(1e-5, x))


def db_to_amp(x: jnp.ndarray, spec_gain: float = 20.0) -> jnp.ndarray:
    return jnp.power(10.0, x / spec_gain)


def preemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[t] - coef * y[t-1] (FIR highpass; TTS/utils/audio.py:199-203)."""
    return jnp.concatenate([y[..., :1], y[..., 1:] - coef * y[..., :-1]], axis=-1)


def deemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """Inverse of :func:`preemphasis` (IIR), carried through lax.scan."""

    def step(prev, x):
        out = x + coef * prev
        return out, out

    yt = jnp.moveaxis(y, -1, 0)
    _, out = jax.lax.scan(step, jnp.zeros_like(yt[0]), yt)
    return jnp.moveaxis(out, 0, -1)


# ---------------------------------------------------------------------------
# Normalization (range / symmetric, matching TTS/utils/audio.py:108-187)
# ---------------------------------------------------------------------------

def normalize_spectrogram(
    s_db: jnp.ndarray,
    *,
    min_level_db: float,
    max_norm: float,
    symmetric: bool,
    clip: bool,
) -> jnp.ndarray:
    s_norm = (s_db - min_level_db) / (-min_level_db)
    if symmetric:
        s_norm = 2.0 * max_norm * s_norm - max_norm
        if clip:
            s_norm = jnp.clip(s_norm, -max_norm, max_norm)
    else:
        s_norm = max_norm * s_norm
        if clip:
            s_norm = jnp.clip(s_norm, 0.0, max_norm)
    return s_norm


def denormalize_spectrogram(
    s_norm: jnp.ndarray,
    *,
    min_level_db: float,
    max_norm: float,
    symmetric: bool,
    clip: bool,
) -> jnp.ndarray:
    if symmetric:
        if clip:
            s_norm = jnp.clip(s_norm, -max_norm, max_norm)
        return (s_norm + max_norm) * -min_level_db / (2 * max_norm) + min_level_db
    if clip:
        s_norm = jnp.clip(s_norm, 0.0, max_norm)
    return s_norm * -min_level_db / max_norm + min_level_db


# ---------------------------------------------------------------------------
# Mel / linear spectrograms
# ---------------------------------------------------------------------------

def linear_spectrogram(
    y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
) -> jnp.ndarray:
    """(..., T) -> magnitude (..., n_frames, n_fft//2+1)."""
    return magnitude(stft(y, n_fft, hop_length, win_length))


def mel_spectrogram(
    y: jnp.ndarray,
    mel_basis: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> jnp.ndarray:
    """(..., T) -> mel magnitudes (..., n_frames, n_mels). mel_basis: (n_mels, n_bins)."""
    s = linear_spectrogram(y, n_fft, hop_length, win_length)
    return jnp.einsum("...tb,mb->...tm", s, mel_basis)


# ---------------------------------------------------------------------------
# Griffin-Lim (on-device, fori_loop)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "n_iter"))
def griffin_lim(
    mag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iter: int = 60,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Phase reconstruction from magnitudes (TTS/utils/audio.py:272-279 on-device).

    mag: (..., n_frames, n_bins) -> (..., T)
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jnp.exp(2j * jnp.pi * jax.random.uniform(key, mag.shape))
    cmag = mag.astype(jnp.complex64)

    def body(_, angles):
        full = cmag * angles
        inv = istft(full, n_fft, hop_length, win_length)
        rebuilt = stft(inv, n_fft, hop_length, win_length)
        return rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-16)

    angles = jax.lax.fori_loop(0, n_iter, body, angles)
    return istft(cmag * angles, n_fft, hop_length, win_length)


# ---------------------------------------------------------------------------
# mu-law companding (TTS/utils/audio.py:342-369)
# ---------------------------------------------------------------------------

def mulaw_encode(y: jnp.ndarray, qc: int) -> jnp.ndarray:
    mu = qc - 1
    signal = jnp.sign(y) * jnp.log1p(mu * jnp.abs(y)) / jnp.log1p(mu)
    return jnp.floor((signal + 1) / 2 * mu + 0.5)


def mulaw_decode(y: jnp.ndarray, qc: int) -> jnp.ndarray:
    mu = qc - 1
    x = y / mu * 2.0 - 1.0
    return jnp.sign(x) * (jnp.expm1(jnp.abs(x) * jnp.log1p(mu))) / mu


def quantize(y: jnp.ndarray, bits: int) -> jnp.ndarray:
    return jnp.clip((y + 1.0) * (2**bits - 1) / 2, 0, 2**bits - 1)


def dequantize(y: jnp.ndarray, bits: int) -> jnp.ndarray:
    return 2 * y / (2**bits - 1) - 1
