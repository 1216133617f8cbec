"""DSP tests: STFT parity vs torch.stft, mel filterbank invariants,
normalization round-trips, Griffin-Lim convergence, host/device parity.

Mirrors the reference's tests/test_audio.py tier (SURVEY.md §4.3)."""

import numpy as np
import pytest

from tts_tpu.audio import dsp, mel
from tts_tpu.audio.processor import AudioProcessor, read_wav, write_wav, resample


SR = 22050


def _sine(freq=440.0, dur=0.5, sr=SR, amp=0.5):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _chirp(dur=0.6, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    return (0.4 * np.sin(2 * np.pi * (200 + 1500 * t) * t)).astype(np.float32)


@pytest.fixture(scope="module")
def ap():
    return AudioProcessor(sample_rate=SR, num_mels=80, fft_size=1024,
                          hop_length=256, win_length=1024, mel_fmax=8000.0)


class TestSTFT:
    def test_parity_with_torch_stft(self, ap):
        import torch

        y = _chirp()
        ours = ap._stft(y)  # (frames, bins)
        theirs = torch.stft(
            torch.from_numpy(y), n_fft=1024, hop_length=256, win_length=1024,
            window=torch.hann_window(1024), center=True, pad_mode="reflect",
            return_complex=True,
        ).numpy().T  # -> (frames, bins)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.abs(ours), np.abs(theirs), atol=1e-3)

    def test_jnp_matches_numpy(self, ap):
        import jax.numpy as jnp

        y = _chirp()
        a = np.abs(ap._stft(y))
        b = np.asarray(jnp.abs(dsp.stft(jnp.asarray(y), 1024, 256, 1024)))
        np.testing.assert_allclose(a, b, atol=2e-3)

    def test_batched_stft(self):
        import jax.numpy as jnp

        y = np.stack([_sine(440), _sine(880)])
        s = dsp.stft(jnp.asarray(y), 1024, 256, 1024)
        assert s.shape[0] == 2 and s.shape[-1] == 513

    def test_istft_roundtrip(self):
        import jax.numpy as jnp

        y = _chirp()
        spec = dsp.stft(jnp.asarray(y), 1024, 256, 1024)
        rec = np.asarray(dsp.istft(spec, 1024, 256, 1024, length=len(y)))
        np.testing.assert_allclose(rec, y, atol=1e-3)


class TestMelFilterbank:
    def test_shape_and_nonneg(self):
        fb = mel.mel_filterbank(SR, 1024, 80, 0.0, 8000.0)
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()

    def test_filters_cover_band(self):
        fb = mel.mel_filterbank(SR, 1024, 80, 0.0, 8000.0)
        assert (fb.sum(axis=1) > 0).all()  # every filter nonzero
        freqs = np.linspace(0, SR / 2, 513)
        active = fb.sum(axis=0) > 0
        assert freqs[active].min() < 100
        assert freqs[active].max() > 7800

    def test_slaney_scale_fixed_points(self):
        # slaney scale is linear below 1 kHz: 1000 Hz -> 15 mels
        np.testing.assert_allclose(mel.hz_to_mel(1000.0), 15.0, atol=1e-6)
        np.testing.assert_allclose(mel.mel_to_hz(15.0), 1000.0, atol=1e-3)
        np.testing.assert_allclose(mel.mel_to_hz(mel.hz_to_mel(4321.0)), 4321.0, rtol=1e-6)

    def test_htk_scale(self):
        np.testing.assert_allclose(mel.hz_to_mel(1000.0, htk=True), 999.9855, atol=1e-2)


class TestNormalization:
    def test_symmetric_roundtrip(self, ap):
        y = _chirp()
        m = ap.melspectrogram(y)
        assert m.shape[1] == 80
        assert m.max() <= ap.max_norm + 1e-6
        assert m.min() >= -ap.max_norm - 1e-6
        db = ap.denormalize(m)
        m2 = ap.normalize(db)
        np.testing.assert_allclose(m, m2, atol=1e-4)

    def test_asymmetric_norm(self):
        ap = AudioProcessor(sample_rate=SR, symmetric_norm=False, max_norm=1.0,
                            mel_fmax=8000.0)
        m = ap.melspectrogram(_chirp())
        assert m.min() >= 0.0 and m.max() <= 1.0

    def test_no_norm_passthrough(self):
        ap = AudioProcessor(sample_rate=SR, signal_norm=False, mel_fmax=8000.0)
        m = ap.melspectrogram(_chirp())
        db = ap.denormalize(m)
        np.testing.assert_allclose(m, db)

    def test_meanvar_scaler(self, tmp_path):
        stats = {
            "mel_mean": np.zeros(80, np.float32),
            "mel_std": np.ones(80, np.float32),
            "linear_mean": np.zeros(513, np.float32),
            "linear_std": np.ones(513, np.float32),
            "audio_config": {"sample_rate": SR, "num_mels": 80, "fft_size": 1024,
                             "hop_length": 256, "win_length": 1024},
        }
        p = str(tmp_path / "scale_stats.npy")
        np.save(p, stats, allow_pickle=True)
        ap = AudioProcessor(sample_rate=SR, stats_path=p, mel_fmax=8000.0)
        m = ap.melspectrogram(_chirp())
        rt = ap.normalize(ap.denormalize(m))
        np.testing.assert_allclose(m, rt, atol=1e-4)

    def test_stats_config_mismatch_raises(self, tmp_path):
        stats = {"mel_mean": 0, "mel_std": 1, "linear_mean": 0, "linear_std": 1,
                 "audio_config": {"sample_rate": 16000}}
        p = str(tmp_path / "scale_stats.npy")
        np.save(p, stats, allow_pickle=True)
        with pytest.raises(AssertionError):
            AudioProcessor(sample_rate=SR, stats_path=p)


class TestGriffinLim:
    def test_reconstruction_quality(self, ap):
        # quiet sine: a full-scale tone clips against ref_level_db normalization
        # (same clipping the reference applies), distorting the spectral peak
        y = _sine(440, dur=0.4, amp=0.03)
        spec = ap.spectrogram(y)
        rec = ap.inv_spectrogram(spec)
        # dominant frequency must survive the round trip
        f_rec = np.fft.rfftfreq(len(rec), 1 / SR)[np.argmax(np.abs(np.fft.rfft(rec)))]
        assert abs(f_rec - 440) < 15

    def test_mel_inversion_runs(self, ap):
        y = _sine(440, dur=0.3)
        rec = ap.inv_melspectrogram(ap.melspectrogram(y))
        assert rec.shape[0] > 0 and np.isfinite(rec).all()

    def test_device_griffin_lim(self):
        import jax.numpy as jnp

        y = _sine(440, dur=0.3)
        mag = jnp.abs(dsp.stft(jnp.asarray(y), 1024, 256, 1024))
        rec = np.asarray(dsp.griffin_lim(mag, 1024, 256, 1024, n_iter=30))
        f_rec = np.fft.rfftfreq(len(rec), 1 / SR)[np.argmax(np.abs(np.fft.rfft(rec)))]
        assert abs(f_rec - 440) < 15


class TestCompanding:
    def test_mulaw_roundtrip(self):
        y = np.linspace(-0.9, 0.9, 101).astype(np.float32)
        enc = AudioProcessor.mulaw_encode(y, 256)
        dec = AudioProcessor.mulaw_decode(enc, 256)
        np.testing.assert_allclose(dec, y, atol=2e-2)
        assert enc.min() >= 0 and enc.max() <= 255

    def test_quantize_roundtrip(self):
        y = np.linspace(-1, 1, 64).astype(np.float32)
        q = AudioProcessor.quantize(y, 10)
        np.testing.assert_allclose(AudioProcessor.dequantize(q, 10), y, atol=2e-3)

    def test_jnp_matches_numpy(self):
        import jax.numpy as jnp

        y = np.linspace(-0.99, 0.99, 57).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(dsp.mulaw_encode(jnp.asarray(y), 256)),
            AudioProcessor.mulaw_encode(y, 256), atol=1e-4)


class TestPreemphasis:
    def test_roundtrip(self):
        ap = AudioProcessor(sample_rate=SR, preemphasis=0.97, mel_fmax=8000.0)
        y = _chirp()
        rt = ap.apply_inv_preemphasis(ap.apply_preemphasis(y))
        np.testing.assert_allclose(rt, y, atol=1e-4)

    def test_jnp_roundtrip(self):
        import jax.numpy as jnp

        y = jnp.asarray(_sine())
        rt = dsp.deemphasis(dsp.preemphasis(y, 0.97), 0.97)
        np.testing.assert_allclose(np.asarray(rt), np.asarray(y), atol=1e-4)


class TestWavIO:
    def test_roundtrip(self, tmp_path):
        y = _sine(dur=0.1)
        p = str(tmp_path / "t.wav")
        write_wav(p, y, SR)
        y2, sr = read_wav(p)
        assert sr == SR
        np.testing.assert_allclose(y2, y, atol=1e-4)

    def test_resample_preserves_pitch(self):
        y = _sine(440, dur=0.5, sr=44100)
        y16 = resample(y, 44100, 16000)
        f = np.fft.rfftfreq(len(y16), 1 / 16000)[np.argmax(np.abs(np.fft.rfft(y16)))]
        assert abs(f - 440) < 10

    def test_trim_silence(self):
        ap = AudioProcessor(sample_rate=SR, do_trim_silence=True, trim_db=60)
        pad = np.zeros(SR // 2, np.float32)
        y = np.concatenate([pad, _sine(dur=0.3), pad])
        trimmed = ap.trim_silence(y)
        assert len(trimmed) < len(y)
        assert len(trimmed) >= int(0.25 * SR)


class TestF0:
    def test_f0_of_sine(self):
        ap = AudioProcessor(sample_rate=SR)
        f0 = ap.compute_f0(_sine(220, dur=0.5))
        voiced = f0[f0 > 0]
        assert len(voiced) > 0
        assert abs(np.median(voiced) - 220) < 10
