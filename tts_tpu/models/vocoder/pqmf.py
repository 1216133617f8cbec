"""PQMF: pseudo-quadrature-mirror cosine-modulated filterbank.

Capability parity with /root/reference/TTS/vocoder/layers/pqmf.py:10-56
(Kaiser-windowed prototype -> N cosine-modulated analysis/synthesis filters;
analysis = strided conv, synthesis = zero-stuffed upsample + conv). Filters
are designed once in numpy at construction; the runtime path is two XLA convs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def design_prototype_filter(taps: int = 62, cutoff: float = 0.142,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass prototype, length taps+1
    (≙ scipy.signal.firwin(taps + 1, cutoff, window=('kaiser', beta)))."""
    from scipy.signal import firwin

    return firwin(taps + 1, cutoff, window=("kaiser", beta))


class PQMF:
    """N-band analysis/synthesis filterbank (stateless; arrays precomputed)."""

    def __init__(self, N: int = 4, taps: int = 62, cutoff: float = 0.142,
                 beta: float = 9.0):
        self.N = N
        self.taps = taps
        h_proto = design_prototype_filter(taps, cutoff, beta)
        H = np.zeros((N, taps + 1))
        G = np.zeros((N, taps + 1))
        n = np.arange(taps + 1)
        for k in range(N):
            phase = (2 * k + 1) * np.pi / (2 * N) * (n - taps / 2)
            H[k] = 2 * h_proto * np.cos(phase + (-1) ** k * np.pi / 4)
            G[k] = 2 * h_proto * np.cos(phase - (-1) ** k * np.pi / 4)
        # analysis kernel: (taps+1, in=1, out=N); synthesis: (taps+1, N, 1)
        self.analysis_kernel = jnp.asarray(H.T[:, None, :], jnp.float32)
        self.synthesis_kernel = jnp.asarray(G.T[:, :, None], jnp.float32) * N
        self.pad = taps // 2

    def analysis(self, x: Array) -> Array:
        """(B, T, 1) -> (B, T // N, N) subband signals."""
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)))
        return lax.conv_general_dilated(
            x, self.analysis_kernel, window_strides=(self.N,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))

    def synthesis(self, x: Array) -> Array:
        """(B, T // N, N) -> (B, T, 1) reconstructed waveform."""
        B, T, N = x.shape
        # zero-stuff upsample by N on the time axis
        up = jnp.zeros((B, T * N, N), x.dtype).at[:, :: self.N, :].set(x)
        up = jnp.pad(up, ((0, 0), (self.pad, self.pad), (0, 0)))
        return lax.conv_general_dilated(
            up, self.synthesis_kernel, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
