"""Data pipeline tests (≙ reference tests/test_loader.py tier, SURVEY.md §4.5)."""

import numpy as np
import pytest

from tts_tpu.audio import AudioProcessor
from tts_tpu.data import TTSDataset, load_meta_data, shard_indices
from tts_tpu.data.formatters import get_speakers, ljspeech, split_dataset

from tests.fixtures import SR, make_ljspeech_fixture


@pytest.fixture(scope="module")
def lj_root(tmp_path_factory):
    return make_ljspeech_fixture(str(tmp_path_factory.mktemp("lj")))


@pytest.fixture(scope="module")
def ap():
    return AudioProcessor(sample_rate=SR, num_mels=80, fft_size=1024,
                          hop_length=256, win_length=1024, mel_fmax=8000.0)


class TestFormatters:
    def test_ljspeech(self, lj_root):
        items = ljspeech(lj_root, "metadata.csv")
        assert len(items) == 8
        text, wav, speaker = items[0]
        assert wav.endswith(".wav") and speaker == "ljspeech"
        assert isinstance(text, str) and len(text) > 0

    def test_load_meta_data_split(self, lj_root):
        train, evl = load_meta_data(
            [{"name": "ljspeech", "path": lj_root, "meta_file_train": "metadata.csv"}])
        assert len(train) + len(evl) == 8
        assert len(evl) >= 1

    def test_get_speakers(self, lj_root):
        items = ljspeech(lj_root, "metadata.csv")
        assert get_speakers(items) == ["ljspeech"]

    def test_split_multi_speaker(self):
        items = [[f"text {i}", f"w{i}.wav", f"spk{i % 4}"] for i in range(40)]
        evl, train = split_dataset(items, eval_split_size=0.1)
        assert len(evl) == 4
        assert len({it[-1] for it in evl}) == 4


class TestSharding:
    def test_stride_slice(self):
        idx = list(range(10))
        s0 = shard_indices(idx, 2, 0)
        s1 = shard_indices(idx, 2, 1)
        assert sorted(s0 + s1) == idx
        assert len(s0) == len(s1) == 5

    def test_padding_wraps(self):
        idx = list(range(7))
        shards = [shard_indices(idx, 4, i) for i in range(4)]
        assert all(len(s) == 2 for s in shards)
        assert set(sum(shards, [])) == set(idx)


class TestTTSDataset:
    def _ds(self, ap, lj_root, **kw):
        items = ljspeech(lj_root, "metadata.csv")
        kw.setdefault("use_phonemes", False)
        kw.setdefault("text_cleaner", "english_cleaners")
        return TTSDataset(ap, items, **kw)

    def test_getitem(self, ap, lj_root):
        ds = self._ds(ap, lj_root)
        s = ds[0]
        assert s["text"].dtype == np.int32 and len(s["text"]) > 0
        assert s["wav"].ndim == 1

    def test_length_sorted(self, ap, lj_root):
        ds = self._ds(ap, lj_root)
        lens = [len(it[0]) for it in ds.items]
        assert lens == sorted(lens)

    def test_length_filter(self, ap, lj_root):
        ds = self._ds(ap, lj_root, min_seq_len=12, max_seq_len=25)
        assert 0 < len(ds) < 8
        assert all(12 <= len(it[0]) <= 25 for it in ds.items)

    def test_collate_shapes_and_padding(self, ap, lj_root):
        r = 7
        ds = self._ds(ap, lj_root, outputs_per_step=r, shape_pad=32)
        batch = ds.collate([ds[i] for i in range(4)])
        B, T_text = batch["text"].shape
        _, T_mel, n_mels = batch["mel"].shape
        assert B == 4 and n_mels == 80
        assert T_text % 32 == 0
        assert T_mel % r == 0
        assert batch["stop_targets"].shape == (4, T_mel // r)
        # stop targets: 1 beyond each item's end, 0 before
        for i in range(4):
            L = batch["mel_lengths"][i]
            assert batch["stop_targets"][i, -1] == 1.0
            if L > 2 * r:
                assert batch["stop_targets"][i, 0] == 0.0
        # padding region of mel is zeros
        longest = int(batch["mel_lengths"].max())
        if longest < T_mel:
            assert np.allclose(batch["mel"][:, longest:, :], 0)

    def test_precomputed_attention_maps(self, ap, lj_root, tmp_path):
        """4th item column: precomputed attention .npy files are loaded and
        padded into (B, T_text, T_mel) (≙ TTSDataset.py:119-142,272-281)."""
        ds = self._ds(ap, lj_root)
        rng = np.random.default_rng(0)
        for i, it in enumerate(ds.items):
            n_text = len(it[0])
            mel = ds.ap.melspectrogram(ds.ap.load_wav(it[1]))
            a = rng.random((mel.shape[0], n_text)).astype(np.float32)
            f = tmp_path / f"attn_{i}.npy"
            np.save(f, a)
            if len(it) > 3:
                it[3] = str(f)
            else:
                it.append(str(f))
        batch = ds.collate([ds[i] for i in range(3)])
        assert "attention_maps" in batch
        B, T_text = batch["text"].shape
        T_mel = batch["mel"].shape[1]
        assert batch["attention_maps"].shape == (B, T_text, T_mel)
        # padded region zero; valid region preserved
        L_text = batch["text_lengths"][0]
        L_mel = batch["mel_lengths"][0]
        assert np.allclose(batch["attention_maps"][:, :, T_mel - 1], 0) or \
            int(batch["mel_lengths"].max()) == T_mel
        assert batch["attention_maps"][0, :L_text, :L_mel].sum() > 0

    def test_collate_sorted_desc(self, ap, lj_root):
        ds = self._ds(ap, lj_root)
        batch = ds.collate([ds[i] for i in range(4)])
        tl = batch["text_lengths"]
        assert all(tl[i] >= tl[i + 1] for i in range(len(tl) - 1))

    def test_linear_spec(self, ap, lj_root):
        ds = self._ds(ap, lj_root, compute_linear_spec=True)
        batch = ds.collate([ds[i] for i in range(2)])
        assert batch["linear"].shape[:2] == batch["mel"].shape[:2]
        assert batch["linear"].shape[2] == 513

    def test_speaker_ids(self, ap, lj_root):
        ds = self._ds(ap, lj_root, speaker_id_mapping={"ljspeech": 0})
        batch = ds.collate([ds[0], ds[1]])
        assert (batch["speaker_ids"] == 0).all()

    def test_phoneme_cache(self, ap, lj_root, tmp_path):
        ds = self._ds(ap, lj_root, use_phonemes=True,
                      phoneme_cache_path=str(tmp_path / "ph"))
        s1 = ds[0]["text"]
        s2 = ds[0]["text"]  # second call hits the cache
        np.testing.assert_array_equal(s1, s2)
        import os
        assert len(os.listdir(tmp_path / "ph")) > 0

    def test_batches_iterator(self, ap, lj_root):
        ds = self._ds(ap, lj_root)
        batches = list(ds.batches(batch_size=2))
        assert len(batches) == 4
        for b in batches:
            assert b["text"].shape[0] == 2

    def test_batches_sharded(self, ap, lj_root):
        ds = self._ds(ap, lj_root)
        b0 = list(ds.batches(batch_size=2, num_shards=2, shard_id=0))
        b1 = list(ds.batches(batch_size=2, num_shards=2, shard_id=1))
        assert len(b0) == len(b1) == 2
        ids0 = {i for b in b0 for i in b["item_idxs"]}
        ids1 = {i for b in b1 for i in b["item_idxs"]}
        assert ids0.isdisjoint(ids1)

    def test_bucketed_shapes_bounded(self, ap, lj_root):
        """Bucketed padding: few distinct compiled shapes across batches."""
        ds = self._ds(ap, lj_root, outputs_per_step=2)
        shapes = {tuple(b["mel"].shape) for b in ds.batches(batch_size=2)}
        assert len(shapes) <= 3
