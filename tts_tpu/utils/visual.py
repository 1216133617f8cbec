"""Alignment/spectrogram plotting (≙ /root/reference/TTS/tts/utils/visual.py)."""

from __future__ import annotations

import numpy as np


def plot_alignment(alignment, info=None, fig_size=(16, 10), title=None,
                   output_fig=False):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=fig_size)
    align = np.asarray(alignment)
    if align.ndim == 3:
        align = align[0]
    im = ax.imshow(align.T, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    xlabel = "Decoder timestep"
    if info is not None:
        xlabel += "\n\n" + info
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Encoder timestep")
    if title is not None:
        ax.set_title(title)
    plt.tight_layout()
    if output_fig:
        return fig
    return fig


def plot_spectrogram(spectrogram, ap=None, fig_size=(16, 10), output_fig=False):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spec = np.asarray(spectrogram)
    if spec.ndim == 3:
        spec = spec[0]
    if ap is not None:
        spec = ap.denormalize(spec)
    fig = plt.figure(figsize=fig_size)
    plt.imshow(spec.T, aspect="auto", origin="lower")
    plt.colorbar()
    plt.tight_layout()
    return fig
