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


def plot_results(y_hat, y, ap=None, name_prefix=""):
    """Fake/real spectrograms + waveform comparison figures for GAN training
    (≙ plot_results, /root/reference/TTS/vocoder/utils/generic_utils.py:9-37).
    Returns {name: figure}."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    y_hat = np.asarray(y_hat).reshape(-1)
    y = np.asarray(y).reshape(-1)

    if ap is not None:
        spec_fake = ap.melspectrogram(y_hat)
        spec_real = ap.melspectrogram(y)
        spec_diff = np.abs(spec_fake - spec_real)
    else:
        spec_fake = spec_real = spec_diff = None

    figures = {}
    fig_wave = plt.figure(figsize=(12, 4))
    plt.plot(y, alpha=0.6, label="real")
    plt.plot(y_hat, alpha=0.6, label="generated")
    plt.legend()
    plt.tight_layout()
    figures[name_prefix + "waveform"] = fig_wave

    if spec_fake is not None:
        for key, spec in (("spectrogram/fake", spec_fake),
                          ("spectrogram/real", spec_real),
                          ("spectrogram/diff", spec_diff)):
            fig = plt.figure(figsize=(10, 4))
            plt.imshow(spec.T, aspect="auto", origin="lower")
            plt.colorbar()
            plt.tight_layout()
            figures[name_prefix + key] = fig
    return figures
