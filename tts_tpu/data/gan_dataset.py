"""GAN vocoder dataset: random (mel, audio-segment) couples.

Capability parity with /root/reference/TTS/vocoder/datasets/gan_dataset.py:10-127
(seq_len segments + conv_pad context frames, separate G/D item index streams
reshuffled per epoch, precomputed-or-on-the-fly features, feature cache,
noise augmentation) and preprocess.py:18-37 (wav discovery + split).
"""

from __future__ import annotations

import glob
import os
import random
import threading
import queue as _queue
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_wav_data(data_path: str, eval_split_size: int
                  ) -> Tuple[List[str], List[str]]:
    """Glob wavs, deterministic shuffle, split (≙ preprocess.py:18-26)."""
    wav_paths = sorted(glob.glob(os.path.join(data_path, "**", "*.wav"),
                                 recursive=True))
    rng = random.Random(0)
    rng.shuffle(wav_paths)
    return wav_paths[:eval_split_size], wav_paths[eval_split_size:]


def load_wav_feat_data(data_path: str, feat_path: str, eval_split_size: int):
    """Paired wav + precomputed-feature paths (≙ preprocess.py:28-37)."""
    wav_paths = sorted(glob.glob(os.path.join(data_path, "**", "*.wav"),
                                 recursive=True))
    items = []
    for wav in wav_paths:
        rel = os.path.splitext(os.path.relpath(wav, data_path))[0]
        feat = os.path.join(feat_path, rel + ".npy")
        if os.path.isfile(feat):
            items.append((wav, feat))
    rng = random.Random(0)
    rng.shuffle(items)
    return items[:eval_split_size], items[eval_split_size:]


class GANDataset:
    def __init__(
        self,
        ap,
        items: Sequence,
        *,
        seq_len: int = 8192,
        hop_len: int = 256,
        pad_short: int = 2000,
        conv_pad: int = 2,
        is_training: bool = True,
        return_segments: bool = True,
        use_noise_augment: bool = False,
        use_cache: bool = True,
        verbose: bool = False,
    ):
        assert seq_len % hop_len == 0
        self.ap = ap
        self.items = list(items)
        self.seq_len = seq_len
        self.hop_len = hop_len
        self.pad_short = pad_short
        self.conv_pad = conv_pad
        self.is_training = is_training
        self.return_segments = return_segments
        self.use_noise_augment = use_noise_augment
        self.feat_frames = seq_len // hop_len
        self._cache: Optional[Dict] = {} if use_cache else None
        self._rng = np.random.default_rng(0)
        # separate G/D index streams (≙ gan_dataset.py:66-74)
        self.G_to_D_mappings = list(range(len(self.items)))
        self.shuffle_mapping()

    def __len__(self) -> int:
        return len(self.items)

    def shuffle_mapping(self) -> None:
        random.Random(int(self._rng.integers(1 << 30))).shuffle(self.G_to_D_mappings)

    def _load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        item = self.items[idx]
        if isinstance(item, (tuple, list)):
            wav_path, feat_path = item
            audio = self.ap.load_wav(wav_path)
            mel = np.load(feat_path)
            if mel.shape[0] != self.ap.num_mels and mel.shape[-1] == self.ap.num_mels:
                pass
            elif mel.shape[0] == self.ap.num_mels:
                mel = mel.T  # accept (n_mels, T) features
        else:
            audio = self.ap.load_wav(item)
            if len(audio) < self.seq_len + self.pad_short:
                audio = np.pad(audio, (0, self.seq_len + self.pad_short - len(audio)))
            mel = self.ap.melspectrogram(audio)
        # trim to exact frame alignment
        n_frames = min(mel.shape[0], len(audio) // self.hop_len)
        mel = mel[:n_frames]
        audio = audio[: n_frames * self.hop_len]
        out = (audio.astype(np.float32), mel.astype(np.float32))
        if self._cache is not None:
            self._cache[idx] = out
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """Returns {'audio': (seq_len, 1), 'mel': (frames + 2*conv_pad, n_mels)}."""
        audio, mel = self._load(idx)
        if self.return_segments:
            max_start = mel.shape[0] - self.feat_frames
            start = int(self._rng.integers(0, max(max_start, 0) + 1)) \
                if self.is_training else 0
            mel_seg = mel[start: start + self.feat_frames]
            audio_seg = audio[start * self.hop_len:
                              (start + self.feat_frames) * self.hop_len]
            if self.conv_pad:
                mel_seg = np.pad(mel_seg,
                                 ((self.conv_pad, self.conv_pad), (0, 0)),
                                 mode="edge")
        else:
            mel_seg, audio_seg = mel, audio
        if self.use_noise_augment and self.is_training:
            audio_seg = audio_seg + (1.0 / 32768.0) * self._rng.standard_normal(
                len(audio_seg)).astype(np.float32)
        return {"audio": audio_seg[:, None], "mel": mel_seg}

    def collate(self, samples: List[Dict]) -> Dict[str, np.ndarray]:
        return {
            "audio": np.stack([s["audio"] for s in samples]),
            "mel": np.stack([s["mel"] for s in samples]),
        }

    def batches(self, batch_size: int, *, shuffle: bool = True, seed: int = 0,
                num_shards: int = 1, shard_id: int = 0, prefetch: int = 2):
        """Yield {'G': batch, 'D': batch} couples — G and D see different
        random items each step (≙ gan_dataset.py __getitem__ G/D split)."""
        from tts_tpu.data.sampler import shard_indices

        idxs = list(range(len(self.items)))
        if shuffle:
            random.Random(seed).shuffle(idxs)
        idxs = shard_indices(idxs, num_shards, shard_id)
        n_batches = len(idxs) // batch_size
        if n_batches == 0:
            return

        q: _queue.Queue = _queue.Queue(maxsize=prefetch)
        _SENTINEL = object()

        def producer():
            try:
                for b in range(n_batches):
                    sel = idxs[b * batch_size: (b + 1) * batch_size]
                    g = self.collate([self[i] for i in sel])
                    d = self.collate([self[self.G_to_D_mappings[i]] for i in sel])
                    q.put({"G": g, "D": d})
            except Exception as e:
                q.put(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, Exception):
                raise item
            yield item
        t.join()
