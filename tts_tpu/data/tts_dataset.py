"""TTS training dataset: phoneme caching, length bucketing, static-shape collate.

Capability parity with /root/reference/TTS/tts/datasets/TTSDataset.py:12-288
(phoneme .npy caching l.83-113, length sort + batch_group_size shuffle
l.149-179, collate computing mel/linear in the loader l.187-288) —
re-designed for XLA: batches are padded to *bucketed* (text, frame) shapes
(multiples of ``shape_pad``/reduction factor) so the jitted train step
compiles a small, bounded set of programs instead of one per batch shape.
"""

from __future__ import annotations

import hashlib
import os
import random
import threading
import queue as _queue
from typing import Dict, List, Optional, Sequence

import numpy as np

from tts_tpu.text import phoneme_to_sequence, text_to_sequence


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class TTSDataset:
    def __init__(
        self,
        ap,
        items: Sequence[Sequence],
        *,
        outputs_per_step: int = 1,
        text_cleaner="english_cleaners",
        compute_linear_spec: bool = False,
        min_seq_len: int = 0,
        max_seq_len: int = float("inf"),
        use_phonemes: bool = True,
        phoneme_cache_path: Optional[str] = None,
        phoneme_language: str = "en-us",
        enable_eos_bos: bool = False,
        speaker_id_mapping: Optional[Dict[str, int]] = None,
        speaker_embedding_mapping: Optional[Dict[str, np.ndarray]] = None,
        batch_group_size: int = 0,
        shape_pad: int = 32,
        tp=None,
        verbose: bool = False,
        cache_features: bool = False,
    ):
        self.ap = ap
        self.items = [list(it) for it in items]
        self.r = outputs_per_step
        self.cleaners = text_cleaner
        self.compute_linear_spec = compute_linear_spec
        self.min_seq_len = min_seq_len
        self.max_seq_len = max_seq_len
        self.use_phonemes = use_phonemes
        self.phoneme_cache_path = phoneme_cache_path
        self.phoneme_language = phoneme_language
        self.enable_eos_bos = enable_eos_bos
        self.speaker_id_mapping = speaker_id_mapping
        self.speaker_embedding_mapping = speaker_embedding_mapping
        self.batch_group_size = batch_group_size
        self.shape_pad = shape_pad
        self.tp = tp
        self.verbose = verbose
        # in-memory per-item feature memo (mel / linear spectrograms, keyed by
        # wav path): the reference recomputes STFTs in the loader every epoch
        # (TTSDataset.py:187-288); for small-corpus overfit runs that host
        # cost dominates the TPU step, so epoch 2+ reuses epoch 1's features.
        self.cache_features = cache_features
        self._feat_cache: Dict[str, Dict[str, np.ndarray]] = {}
        self._sample_cache: Dict[str, dict] = {}
        if phoneme_cache_path:
            os.makedirs(phoneme_cache_path, exist_ok=True)
        self.sort_items()

    # -- text --------------------------------------------------------------

    def _cache_key(self, text: str) -> str:
        return hashlib.md5(text.encode("utf-8")).hexdigest()

    def _load_or_generate_phoneme_sequence(self, text: str) -> np.ndarray:
        """Phoneme-id caching to .npy (≙ TTSDataset.py:83-113)."""
        if self.phoneme_cache_path:
            cache_file = os.path.join(
                self.phoneme_cache_path, self._cache_key(text) + "_phoneme.npy")
            if os.path.isfile(cache_file):
                try:
                    return np.load(cache_file)
                except (ValueError, OSError):
                    pass  # corrupt cache entry -> regenerate
        seq = np.asarray(
            phoneme_to_sequence(
                text, self.cleaners, language=self.phoneme_language,
                enable_eos_bos=self.enable_eos_bos, tp=self.tp),
            dtype=np.int32)
        if self.phoneme_cache_path:
            np.save(cache_file, seq)
        return seq

    def text_ids(self, text: str) -> np.ndarray:
        if self.use_phonemes:
            return self._load_or_generate_phoneme_sequence(text)
        return np.asarray(
            text_to_sequence(text, self.cleaners, tp=self.tp), dtype=np.int32)

    # -- ordering ----------------------------------------------------------

    def sort_items(self) -> None:
        """Sort by text length, filter by [min,max], bucket-shuffle
        (≙ TTSDataset.py:149-179)."""
        lengths = np.array([len(it[0]) if it[0] else 0 for it in self.items])
        order = np.argsort(lengths)
        kept: List[list] = []
        ignored = 0
        for idx in order:
            length = lengths[idx]
            if length < self.min_seq_len or length > self.max_seq_len:
                ignored += 1
                continue
            kept.append(self.items[idx])
        if self.batch_group_size > 0:
            rng = random.Random(0)
            for i in range(len(kept) // self.batch_group_size):
                offset = i * self.batch_group_size
                group = kept[offset: offset + self.batch_group_size]
                rng.shuffle(group)
                kept[offset: offset + self.batch_group_size] = group
        if self.verbose and ignored:
            print(f" | > {ignored} instances discarded by length filter")
        self.items = kept

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        item = self.items[idx]
        text, wav_file, speaker_name = item[:3]
        if self.cache_features and wav_file in self._sample_cache:
            return self._sample_cache[wav_file]
        wav = self.ap.load_wav(wav_file)
        ids = self.text_ids(text)
        # optional 4th column: precomputed attention-map .npy, stored
        # (mel_frames, text_len) (≙ TTSDataset.py:119-142)
        attn = np.load(item[3]) if len(item) > 3 and item[3] else None
        sample = {
            "text": ids,
            "wav": wav.astype(np.float32),
            "attn": attn,
            "item_idx": wav_file,
            "speaker_name": speaker_name,
        }
        if self.cache_features:
            # wav decode + silence trim re-ran every epoch otherwise —
            # seconds per epoch on real-speech corpora
            self._sample_cache[wav_file] = sample
        return sample

    def _feature(self, sample: dict, kind: str, fn) -> np.ndarray:
        if not self.cache_features:
            return fn(sample["wav"])
        memo = self._feat_cache.setdefault(sample["item_idx"], {})
        if kind not in memo:
            memo[kind] = fn(sample["wav"])
        return memo[kind]

    # -- collate -----------------------------------------------------------

    def collate(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        """Batch samples into padded arrays with bucketed static shapes.

        Returns time-major features: mel (B, T_frames, n_mels), optional
        linear (B, T_frames, n_freq), stop targets already grouped by r
        (B, T_frames // r).
        """
        B = len(samples)
        # sort batch desc by text length (keeps parity with the reference's
        # collate ordering so attention masks align with sorted lengths)
        samples = sorted(samples, key=lambda s: len(s["text"]), reverse=True)

        text_lens = np.array([len(s["text"]) for s in samples], dtype=np.int32)
        T_text = _round_up(int(text_lens.max()), self.shape_pad)

        mels = [self._feature(s, "mel", self.ap.melspectrogram)
                for s in samples]
        mel_lens = np.array([m.shape[0] for m in mels], dtype=np.int32)
        T_mel = _round_up(_round_up(int(mel_lens.max()), self.shape_pad), self.r)

        n_mels = mels[0].shape[1]
        text = np.zeros((B, T_text), dtype=np.int32)
        mel = np.zeros((B, T_mel, n_mels), dtype=np.float32)
        stop = np.zeros((B, T_mel), dtype=np.float32)
        for i, s in enumerate(samples):
            text[i, : text_lens[i]] = s["text"]
            mel[i, : mel_lens[i]] = mels[i]
            # pad frames repeat the last frame so stop prediction sees a
            # held frame (reference pads with zeros then marks stops)
            stop[i, mel_lens[i] - 1:] = 1.0
        # group stop targets by reduction factor: a decoder step stops when
        # any of its r frames is a stop frame (≙ train format_data reshape)
        stop = stop.reshape(B, T_mel // self.r, self.r).max(axis=-1)

        batch = {
            "text": text,
            "text_lengths": text_lens,
            "mel": mel,
            "mel_lengths": mel_lens,
            "stop_targets": stop,
            "item_idxs": [s["item_idx"] for s in samples],
        }

        if self.compute_linear_spec:
            linears = [self._feature(s, "linear", self.ap.spectrogram)
                       for s in samples]
            linear = np.zeros((B, T_mel, linears[0].shape[1]), dtype=np.float32)
            for i, sp in enumerate(linears):
                linear[i, : sp.shape[0]] = sp
            batch["linear"] = linear

        if samples[0].get("attn") is not None:
            # pad to (T_text, T_mel) like the reference collate
            # (TTSDataset.py:272-281); map stored as (mel, text)
            attns = np.zeros((B, T_text, T_mel), dtype=np.float32)
            for i, s in enumerate(samples):
                a = np.asarray(s["attn"], dtype=np.float32).T
                attns[i, : a.shape[0], : a.shape[1]] = a
            batch["attention_maps"] = attns

        if self.speaker_id_mapping is not None:
            batch["speaker_ids"] = np.array(
                [self.speaker_id_mapping[s["speaker_name"]] for s in samples],
                dtype=np.int32)
        if self.speaker_embedding_mapping is not None:
            batch["speaker_embeddings"] = np.stack(
                [np.asarray(self.speaker_embedding_mapping[s["item_idx"]],
                            dtype=np.float32)
                 for s in samples])
        return batch

    # -- iteration ---------------------------------------------------------

    def batches(self, batch_size: int, *, shuffle: bool = False, seed: int = 0,
                drop_last: bool = True, num_shards: int = 1, shard_id: int = 0,
                prefetch: int = 2):
        """Yield collated batches; shards across hosts; background prefetch.

        The DataLoader-worker equivalent: one producer thread computes
        features (STFT on host) while the consumer feeds the device.
        """
        from tts_tpu.data.sampler import shard_indices

        idxs = list(range(len(self.items)))
        if shuffle:
            random.Random(seed).shuffle(idxs)
        idxs = shard_indices(idxs, num_shards, shard_id)
        n_batches = len(idxs) // batch_size
        if not drop_last and len(idxs) % batch_size:
            n_batches += 1
        if n_batches == 0:
            return

        q: _queue.Queue = _queue.Queue(maxsize=prefetch)
        _SENTINEL = object()

        def producer():
            try:
                for b in range(n_batches):
                    sel = idxs[b * batch_size: (b + 1) * batch_size]
                    q.put(self.collate([self[i] for i in sel]))
            except Exception as e:  # surface loader errors to consumer
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
