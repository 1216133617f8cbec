"""Attention diagnostics (≙ /root/reference/TTS/tts/utils/measures.py:1-15)."""

from __future__ import annotations

import numpy as np


def alignment_diagonal_score(alignments, binary: bool = False) -> float:
    """Mean of per-step max attention weight — proximity of the alignment to a
    clean monotonic path. alignments: (B, T_dec, T_in)."""
    align = np.asarray(alignments)
    maxs = align.max(axis=-1)
    if binary:
        maxs = (maxs > 0.5).astype(np.float32)
    return float(maxs.mean())
