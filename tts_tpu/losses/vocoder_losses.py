"""GAN vocoder losses: multi-scale STFT, adversarial, feature matching.

Capability parity with /root/reference/TTS/vocoder/layers/losses.py:7-309.
All spectral work runs through the device-resident jnp STFT
(tts_tpu.audio.dsp) — the reference's TorchSTFT equivalent — so the full GAN
loss graph stays on-chip.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from tts_tpu.audio import dsp

Array = jnp.ndarray


def _stft_mag(y: Array, n_fft: int, hop: int, win: int) -> Array:
    """|STFT|: Pallas fused windowed-DFT on TPU (one kernel, complex spectrum
    never materialized), jnp.fft elsewhere."""
    import jax

    if jax.default_backend() != "cpu":
        from tts_tpu.ops.pallas.stft_kernel import stft_magnitude
        return stft_magnitude(y, n_fft, hop, win)
    return jnp.abs(dsp.stft(y, n_fft, hop, win))


def stft_loss(y_hat: Array, y: Array, n_fft: int, hop_length: int,
              win_length: int) -> Tuple[Array, Array]:
    """(spectral-convergence, log-magnitude L1) (≙ STFTLoss, losses.py:36-52)."""
    mag_hat = _stft_mag(y_hat, n_fft, hop_length, win_length)
    mag = _stft_mag(y, n_fft, hop_length, win_length)
    mag_hat = jnp.clip(mag_hat, 1e-7, None)
    mag = jnp.clip(mag, 1e-7, None)
    sc = jnp.linalg.norm(mag - mag_hat) / jnp.maximum(jnp.linalg.norm(mag), 1e-7)
    log_mag = jnp.abs(jnp.log(mag) - jnp.log(mag_hat)).mean()
    return sc, log_mag


DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def multiscale_stft_loss(y_hat: Array, y: Array,
                         resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS
                         ) -> Tuple[Array, Array]:
    """Average SC/mag losses over 3 resolutions (≙ MultiScaleSTFTLoss, losses.py:54-75)."""
    sc_total, mag_total = 0.0, 0.0
    for n_fft, hop, win in resolutions:
        sc, mag = stft_loss(y_hat, y, n_fft, hop, win)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(resolutions)
    return sc_total / n, mag_total / n


SUBBAND_RESOLUTIONS = ((384, 30, 150), (683, 60, 300), (171, 10, 60))


def multiscale_subband_stft_loss(y_hat_sub: Array, y_sub: Array) -> Tuple[Array, Array]:
    """Multi-scale STFT over PQMF subbands; (B, T, N) flattened to (B*N, T)
    (≙ MultiScaleSubbandSTFTLoss, losses.py:78-84)."""
    B, T, N = y_sub.shape
    yh = jnp.swapaxes(y_hat_sub, 1, 2).reshape(B * N, T)
    yy = jnp.swapaxes(y_sub, 1, 2).reshape(B * N, T)
    return multiscale_stft_loss(yh, yy, SUBBAND_RESOLUTIONS)


# -- adversarial ------------------------------------------------------------

def mse_g_loss(scores_fake: List[Array]) -> Array:
    """LSGAN generator loss (≙ MSEGLoss, losses.py:87-95)."""
    loss = 0.0
    for s in scores_fake:
        loss = loss + jnp.mean((s - 1.0) ** 2)
    return loss / len(scores_fake)


def hinge_g_loss(scores_fake: List[Array]) -> Array:
    loss = 0.0
    for s in scores_fake:
        loss = loss - jnp.mean(s)
    return loss / len(scores_fake)


def mse_d_loss(scores_fake: List[Array], scores_real: List[Array]
               ) -> Tuple[Array, Array, Array]:
    """(total, real_part, fake_part) (≙ MSEDLoss, losses.py:98-111)."""
    loss_real, loss_fake = 0.0, 0.0
    for sr, sf in zip(scores_real, scores_fake):
        loss_real = loss_real + jnp.mean((sr - 1.0) ** 2)
        loss_fake = loss_fake + jnp.mean(sf**2)
    n = len(scores_real)
    return (loss_real + loss_fake) / n, loss_real / n, loss_fake / n


def hinge_d_loss(scores_fake: List[Array], scores_real: List[Array]
                 ) -> Tuple[Array, Array, Array]:
    loss_real, loss_fake = 0.0, 0.0
    for sr, sf in zip(scores_real, scores_fake):
        loss_real = loss_real + jnp.mean(jnp.maximum(0.0, 1.0 - sr))
        loss_fake = loss_fake + jnp.mean(jnp.maximum(0.0, 1.0 + sf))
    n = len(scores_real)
    return (loss_real + loss_fake) / n, loss_real / n, loss_fake / n


def feature_matching_loss(feats_fake: List[List[Array]],
                          feats_real: List[List[Array]]) -> Array:
    """Per-layer L1 between D features (≙ MelganFeatureLoss, losses.py:133-144)."""
    loss = 0.0
    count = 0
    for ff, fr in zip(feats_fake, feats_real):
        for a, b in zip(ff, fr):
            loss = loss + jnp.abs(a - b).mean()
            count += 1
    return loss / max(count, 1)


# -- composites -------------------------------------------------------------

def generator_loss(
    y_hat: Array,
    y: Array,
    *,
    scores_fake: Optional[List[Array]] = None,
    feats_fake: Optional[List[List[Array]]] = None,
    feats_real: Optional[List[List[Array]]] = None,
    y_hat_sub: Optional[Array] = None,
    y_sub: Optional[Array] = None,
    use_stft_loss: bool = True,
    use_subband_stft_loss: bool = False,
    use_mse_gan_loss: bool = True,
    use_hinge_gan_loss: bool = False,
    use_feat_match_loss: bool = False,
    stft_loss_weight: float = 0.5,
    subband_stft_loss_weight: float = 0.5,
    mse_G_loss_weight: float = 2.5,
    hinge_G_loss_weight: float = 2.5,
    feat_match_loss_weight: float = 10.0,
) -> Dict[str, Array]:
    """Composite generator loss (≙ GeneratorLoss, losses.py:195-260)."""
    out: Dict[str, Array] = {}
    total = 0.0
    if use_stft_loss:
        sc, mag = multiscale_stft_loss(y_hat[..., 0] if y_hat.ndim == 3 else y_hat,
                                       y[..., 0] if y.ndim == 3 else y)
        out["G_stft_loss_sc"] = sc
        out["G_stft_loss_mag"] = mag
        total = total + stft_loss_weight * (sc + mag)
    if use_subband_stft_loss and y_hat_sub is not None:
        sc, mag = multiscale_subband_stft_loss(y_hat_sub, y_sub)
        out["G_subband_stft_loss_sc"] = sc
        out["G_subband_stft_loss_mag"] = mag
        total = total + subband_stft_loss_weight * (sc + mag)
    if scores_fake is not None:
        if use_mse_gan_loss:
            adv = mse_g_loss(scores_fake)
            out["G_mse_fake_loss"] = adv
            total = total + mse_G_loss_weight * adv
        if use_hinge_gan_loss:
            adv = hinge_g_loss(scores_fake)
            out["G_hinge_fake_loss"] = adv
            total = total + hinge_G_loss_weight * adv
        if use_feat_match_loss and feats_fake is not None:
            fm = feature_matching_loss(feats_fake, feats_real)
            out["G_feat_match_loss"] = fm
            total = total + feat_match_loss_weight * fm
    out["G_loss"] = total
    return out


def discriminator_loss(
    scores_fake: List[Array],
    scores_real: List[Array],
    *,
    use_mse_gan_loss: bool = True,
    use_hinge_gan_loss: bool = False,
) -> Dict[str, Array]:
    """Composite discriminator loss (≙ DiscriminatorLoss, losses.py:263-309)."""
    out: Dict[str, Array] = {}
    total = 0.0
    if use_mse_gan_loss:
        loss, lr, lf = mse_d_loss(scores_fake, scores_real)
        out["D_mse_gan_loss"] = loss
        out["D_mse_gan_real_loss"] = lr
        out["D_mse_gan_fake_loss"] = lf
        total = total + loss
    if use_hinge_gan_loss:
        loss, lr, lf = hinge_d_loss(scores_fake, scores_real)
        out["D_hinge_gan_loss"] = loss
        out["D_hinge_gan_real_loss"] = lr
        out["D_hinge_gan_fake_loss"] = lf
        total = total + loss
    out["D_loss"] = total
    return out
