"""Speaker-embedding scatter plots (≙ /root/reference/TTS/speaker_encoder/utils/visual.py
``plot_embeddings`` — UMAP there; PCA here to stay dependency-free, with a
UMAP path when the library is available)."""

from __future__ import annotations

import numpy as np


def project_embeddings(embeddings: np.ndarray) -> np.ndarray:
    """(N, D) -> (N, 2) via UMAP if installed, else PCA."""
    embeddings = np.asarray(embeddings)
    try:
        import umap  # optional

        return umap.UMAP().fit_transform(embeddings)
    except ImportError:
        centered = embeddings - embeddings.mean(axis=0)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        return centered @ vt[:2].T


def plot_embeddings(embeddings: np.ndarray, num_utter_per_speaker: int):
    """Colored scatter of per-speaker embedding clusters; returns the figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    proj = project_embeddings(embeddings)
    n_speakers = len(embeddings) // num_utter_per_speaker
    labels = np.repeat(np.arange(n_speakers), num_utter_per_speaker)

    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(proj[:, 0], proj[:, 1], c=labels[: len(proj)],
                    cmap="tab20", s=18)
    ax.set_title("Speaker embeddings")
    fig.colorbar(sc, ax=ax)
    plt.tight_layout()
    return fig
