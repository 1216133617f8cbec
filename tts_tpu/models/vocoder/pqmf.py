"""PQMF: pseudo-quadrature-mirror cosine-modulated filterbank.

Capability parity with /root/reference/TTS/vocoder/layers/pqmf.py:10-56
(Kaiser-windowed prototype -> N cosine-modulated analysis/synthesis filters).
The reference runs synthesis as zero-stuffed upsample + full-rate FIR (a
(B, N*T, N) intermediate that is 75% zeros, then a conv into ONE output
channel — both hostile to TPU lanes). Here both directions are POLYPHASE:
everything runs at frame rate with (taps/N, N, N) kernels — identical
outputs (tests/test_vocoder_models.py::TestPQMF::test_polyphase_exact),
~7x less data movement.
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
        # full-rate kernels (kept for the direct/reference path):
        # analysis (taps+1, in=1, out=N); synthesis (taps+1, N, 1).
        # All kernels are PLAIN NUMPY: jnp ops lift numpy operands, and a
        # numpy-only __init__ means constructing a PQMF inside a jit trace
        # (e.g. via the MultibandMelganGenerator.pqmf property) never
        # creates tracers that leak into np.asarray conversions.
        self.analysis_kernel = np.asarray(H.T[:, None, :], np.float32)
        self.synthesis_kernel = np.asarray(G.T[:, :, None], np.float32) * N
        self.pad = taps // 2
        assert self.pad % N != 0 or True
        self._build_polyphase(H, G)

    def _build_polyphase(self, H: np.ndarray, G: np.ndarray) -> None:
        """Frame-rate kernels. Derivations (pad = taps//2):

        synthesis: out[N*t+p] = sum_c sum_k Ksyn[k,c] * up[N*t+p+k-pad]
        with up zero except at multiples of N -> k = N*j + rp,
        rp = (pad - p) mod N, frame offset j - pad//N... concretely for
        pad=31, N=4: u = j - 7, j in [0, 16) (zero-padded past taps).

        analysis: out[t,o] = sum_k Kana[k,o] * x[N*t+k-pad]; sample
        N*(t+u)+p contributes tap k = N*u + pad + p when 0 <= k <= taps.
        """
        N, taps, pad = self.N, self.taps, self.pad
        Ksyn = (G.T * N)  # (taps+1, N): tap k, subband c
        J = (taps + 1 + N - 1) // N  # frame taps per phase
        q = pad // N  # left frame pad (uniform: pad % N == N-1 for taps=62)
        syn = np.zeros((J, N, N), np.float32)  # (frame tap, subband, phase)
        for p in range(N):
            rp = (pad - p) % N
            for j in range(J):
                k = N * j + rp
                if k <= taps:
                    syn[j, :, p] = Ksyn[k, :]
        self._syn_poly = syn
        self._syn_pad = (q, J - 1 - q)

        Kana = H.T  # (taps+1, N): tap k, out subband o
        u_lo = -((pad + N - 1) // N)  # most negative frame offset
        u_hi = (taps - pad) // N
        Ja = u_hi - u_lo + 1
        ana = np.zeros((Ja, N, N), np.float32)  # (frame tap, phase, out)
        for p in range(N):
            for u in range(u_lo, u_hi + 1):
                k = N * u + pad + p
                if 0 <= k <= taps:
                    ana[u - u_lo, p, :] = Kana[k, :]
        self._ana_poly = ana
        self._ana_pad = (-u_lo, u_hi)

    def analysis(self, x: Array) -> Array:
        """(B, T, 1) -> (B, T // N, N) subband signals (polyphase).

        Runs in f32 regardless of input dtype (the bf16 mixed-precision GAN
        step feeds bf16 audio; the filter bank stays f32 for reconstruction
        accuracy and lax.conv requires matching operand dtypes)."""
        B, T, _ = x.shape
        frames = x.astype(jnp.float32).reshape(B, T // self.N, self.N)
        frames = jnp.pad(frames, ((0, 0), self._ana_pad, (0, 0)))
        return lax.conv_general_dilated(
            frames, self._ana_poly, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))

    def synthesis(self, x: Array) -> Array:
        """(B, T // N, N) -> (B, T, 1) reconstructed waveform (polyphase).
        f32 in/out (see analysis)."""
        B, T, N = x.shape
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), self._syn_pad, (0, 0)))
        phases = lax.conv_general_dilated(
            xp, self._syn_poly, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))  # (B, T, N phases)
        return phases.reshape(B, T * N)[..., None]

    # ---- direct full-rate implementations (reference semantics; used to
    # cross-check the polyphase path in tests) ----

    def analysis_direct(self, x: Array) -> Array:
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)))
        return lax.conv_general_dilated(
            x, self.analysis_kernel, window_strides=(self.N,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))

    def synthesis_direct(self, x: Array) -> Array:
        B, T, N = x.shape
        up = jnp.zeros((B, T * N, N), x.dtype).at[:, :: self.N, :].set(x)
        up = jnp.pad(up, ((0, 0), (self.pad, self.pad), (0, 0)))
        return lax.conv_general_dilated(
            up, self.synthesis_kernel, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
