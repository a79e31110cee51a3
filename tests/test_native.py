"""Native (C++) data-path tests: decode parity with the numpy codec,
threaded batch decode, and segment-plan semantics."""

import os

import numpy as np
import pytest

from convtasnet_tpu.data import native
from convtasnet_tpu.data.audio_io import read_wav, write_wav

SR = 8000

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built")


def test_decode_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, 12000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, SR)
    audio, lengths = native.decode_batch([p], 12000)
    want, _ = read_wav(p)
    assert lengths[0] == 12000
    np.testing.assert_allclose(audio[0], want, atol=1e-6)


def test_decode_float_subtype(tmp_path):
    x = np.random.default_rng(1).standard_normal(5000).astype(np.float32)
    p = str(tmp_path / "f.wav")
    write_wav(p, x, SR, subtype="FLOAT")
    audio, lengths = native.decode_batch([p], 5000)
    np.testing.assert_array_equal(audio[0], x)


def test_batch_decode_parallel_with_padding(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    lens = [8000, 6000, 7000, 5000]
    for i, n in enumerate(lens):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, rng.uniform(-0.5, 0.5, n).astype(np.float32), SR)
        paths.append(p)
    audio, lengths = native.decode_batch(paths, 8000, num_threads=4)
    np.testing.assert_array_equal(lengths, lens)
    for i, n in enumerate(lens):
        assert np.all(audio[i, n:] == 0)  # zero-padded tails
        want, _ = read_wav(paths[i])
        np.testing.assert_allclose(audio[i, :n], want, atol=1e-6)


def test_num_frames_and_sample_rate(tmp_path):
    p = str(tmp_path / "a.wav")
    write_wav(p, np.zeros(1234, np.float32), 16000)
    assert native.num_frames(p) == 1234
    assert native.load_library().wav_sample_rate(p.encode()) == 16000


def test_decode_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native.decode_batch([str(tmp_path / "missing.wav")], 100)


def test_segment_plan_matches_reference_semantics():
    # matches the python plan in dataset tests: 40000 @ seg 32000 bs 3
    assert native.segment_starts(40000, 32000, 3) == [0, 8000]
    # multiple of segment: no tail
    assert native.segment_starts(64000, 32000, 4) == [0, 32000]
    # huge utterance: capped at batch_size full strides, no tail
    assert native.segment_starts(200000, 32000, 3) == [0, 32000, 64000]
    # too short: nothing
    assert native.segment_starts(1000, 32000, 3) == []


def test_dataset_uses_native_path(tmp_path, monkeypatch):
    """load_waves produces identical batches with and without the native lib."""
    from tests.test_data import _write_corpus
    from convtasnet_tpu.data.manifest import build_manifests
    from convtasnet_tpu.data.dataset import SeparationDataset

    root = _write_corpus(str(tmp_path), [16000, 20000], seed=0)
    jd = os.path.join(root, "json")
    build_manifests(root, jd, SR)
    ds = SeparationDataset(os.path.join(jd, "tr"), 3, SR, segment=1.0)
    b_native = ds.load_batch(0)
    monkeypatch.setattr(native, "available", lambda: False)
    b_numpy = ds.load_batch(0)
    np.testing.assert_allclose(b_native.mixture, b_numpy.mixture, atol=1e-6)
    np.testing.assert_allclose(b_native.sources, b_numpy.sources, atol=1e-6)
