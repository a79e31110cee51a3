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


def test_native_shorten_matches_python_decoder():
    """Native Shorten v2 decode vs the pure-Python oracle, across channel
    counts, running means, bitshift, and sample types; plus capacity clip."""
    from convtasnet_tpu.data import shorten

    lib = native.load_library()
    if lib is None or not hasattr(lib, "shorten_decode"):
        pytest.skip("libwavio.so predates the shorten decoder")
    rng = np.random.default_rng(7)
    for nchan in (1, 2):
        for nmean in (0, 4):
            for bitshift in (0, 2):
                x = np.cumsum(
                    rng.integers(-300, 300, size=(777, nchan)), axis=0)
                if bitshift:
                    x = x << bitshift
                data = shorten.encode(
                    x, ftype=shorten.TYPE_S16HL, nmean=nmean,
                    bitshift=bitshift, blocksize=96,
                    verbatim=b"NIST" if nmean else b"")
                want, wt, _ = shorten.decode(data, max_samples=777)
                got = native.shorten_decode(data, 777)
                assert got is not None
                assert got[1] == wt
                np.testing.assert_array_equal(got[0], want)
                np.testing.assert_array_equal(
                    native.shorten_decode(data, 50)[0], want[:50])


def test_native_shorten_sphere_file_roundtrip(tmp_path):
    """A .wv1-style embedded-shorten SPHERE file decodes through read_wav's
    native fast path to the same samples as the Python decoder."""
    from convtasnet_tpu.data import shorten
    from convtasnet_tpu.data.audio_io import read_wav

    lib = native.load_library()
    if lib is None or not hasattr(lib, "shorten_decode"):
        pytest.skip("libwavio.so predates the shorten decoder")
    rng = np.random.default_rng(8)
    pcm = np.cumsum(rng.integers(-200, 200, size=1600)).astype(np.int64)
    payload = shorten.encode(pcm, ftype=shorten.TYPE_S16HL)
    head = (
        "NIST_1A\n   1024\nsample_rate -i 8000\nchannel_count -i 1\n"
        f"sample_count -i {len(pcm)}\nsample_n_bytes -i 2\n"
        "sample_coding -s24 pcm,embedded-shorten-v2\nend_head\n"
    ).encode()
    path = tmp_path / "utt.wv1"
    path.write_bytes(head + b" " * (1024 - len(head)) + payload)
    x, sr = read_wav(str(path))
    assert sr == 8000 and len(x) == len(pcm)
    np.testing.assert_allclose(x, pcm.astype(np.float32) / 32768.0, atol=1e-7)
