"""VoxCeleb preparation tool (bin/prepare_voxceleb.py) — the processing
pipeline is covered offline (zero-egress CI): part concatenation, md5
verification, zip extraction with top-folder rename, tree walk + csv
emission with dense first-seen speaker ids (≙ the reference's
prepare_voxceleb.py:70-233 behavior). Only the network fetch itself is
untestable here."""

import csv
import hashlib
import os
import zipfile

import numpy as np
import pytest

from tts_tpu.bin.prepare_voxceleb import (concatenate_parts,
                                          convert_audio_and_make_label,
                                          extract_zip, processor, verify_md5)


def _write_wav(path, n=1600, sr=16000):
    from tts_tpu.audio.processor import write_wav
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_wav(path, np.zeros(n, np.float32), sr)


def _fixture_tree(root, subset="vox1_test_wav"):
    """speaker/session/utterance layout as shipped by VoxCeleb."""
    base = os.path.join(root, subset)
    _write_wav(os.path.join(base, "id10001", "clip_a", "00001.wav"), 1600)
    _write_wav(os.path.join(base, "id10001", "clip_b", "00002.wav"), 3200)
    _write_wav(os.path.join(base, "id10002", "clip_c", "00001.wav"), 800)
    return base


def test_concatenate_and_md5(tmp_path):
    parts = []
    blob = b""
    for i, chunk in enumerate([b"abc", b"defg", b"h"]):
        p = tmp_path / f"data_parta{chr(ord('a') + i)}"
        p.write_bytes(chunk)
        parts.append(str(p))
        blob += chunk
    out = concatenate_parts(parts, str(tmp_path / "data.zip"))
    assert open(out, "rb").read() == blob
    verify_md5(out, hashlib.md5(blob).hexdigest())
    with pytest.raises(ValueError, match="md5sum"):
        verify_md5(out, "0" * 32)


def test_single_zip_passthrough(tmp_path):
    z = tmp_path / "only.zip"
    z.write_bytes(b"zipbytes")
    assert concatenate_parts([str(z)], str(tmp_path / "x.zip")) == str(z)


def test_extract_renames_top_folder(tmp_path):
    z = tmp_path / "arch.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("wav_root/id1/s/a.txt", "x")
    out = extract_zip(str(z), str(tmp_path), "vox1_test_wav")
    assert out.endswith("vox1_test_wav")
    assert os.path.isfile(os.path.join(out, "id1", "s", "a.txt"))


def test_csv_emission_and_speaker_ids(tmp_path):
    _fixture_tree(str(tmp_path))
    ids = {}
    path = convert_audio_and_make_label(str(tmp_path), "vox1_test_wav",
                                        str(tmp_path), "vox1_test_wav.csv",
                                        ids)
    with open(path) as f:
        rows = list(csv.reader(f, delimiter="\t"))
    assert rows[0] == ["wav_filename", "wav_length_ms", "speaker_id",
                      "speaker_name"]
    body = rows[1:]
    assert len(body) == 3
    # dense first-seen speaker ids; the shared dict carries across subsets
    assert ids == {"id10001": 0, "id10002": 1}
    by_spk = {r[3]: r for r in body}
    assert by_spk["id10001"][2] == "0" and by_spk["id10002"][2] == "1"
    # lengths are real sample counts from the wav reader
    lengths = sorted(int(r[1]) for r in body)
    assert lengths == [800, 1600, 3200]
    assert all(os.path.isabs(r[0]) for r in body)


def test_processor_offline_with_extracted_tree(tmp_path):
    """With the subset directory already present (a pre-downloaded or
    mounted corpus), processor() skips the network entirely."""
    _fixture_tree(str(tmp_path))
    csv_path = processor(str(tmp_path), "vox1_test_wav")
    assert os.path.isfile(csv_path)
    # idempotent: cached csv is returned without re-processing
    assert processor(str(tmp_path), "vox1_test_wav") == csv_path


def test_processor_rejects_unknown_subset(tmp_path):
    with pytest.raises(ValueError):
        processor(str(tmp_path), "vox9_nope")


def test_resumed_run_replays_cached_speaker_ids(tmp_path):
    """processor() with a cached csv must still populate the shared
    speaker-id dict so a LATER subset keeps non-colliding dense ids."""
    _fixture_tree(str(tmp_path))
    ids = {}
    processor(str(tmp_path), "vox1_test_wav", speaker_id_dict=ids)
    assert ids == {"id10001": 0, "id10002": 1}
    # fresh dict, cached csv: the replay path
    ids2 = {}
    processor(str(tmp_path), "vox1_test_wav", speaker_id_dict=ids2)
    assert ids2 == ids
