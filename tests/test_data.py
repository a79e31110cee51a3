"""Data pipeline tests: wav codec roundtrip, manifests, batch-planning parity
with the reference packing semantics (drop/spill/tail rules, max_hours), and
the loader."""

import json
import os

import numpy as np
import pytest

from convtasnet_tpu.data.audio_io import read_wav, wav_duration_samples, write_wav
from convtasnet_tpu.data.dataset import EvalDataset, SeparationDataset
from convtasnet_tpu.data.loader import BatchLoader
from convtasnet_tpu.data.manifest import build_manifests

SR = 8000


def _write_corpus(root, lengths, num_speakers=2, split="tr", seed=0):
    """Synthetic two-source corpus: sources are sines at distinct freqs."""
    rng = np.random.default_rng(seed)
    parts = ["mix"] + [f"s{i+1}" for i in range(num_speakers)]
    for p in parts:
        os.makedirs(os.path.join(root, split, p), exist_ok=True)
    for i, n in enumerate(lengths):
        t = np.arange(n) / SR
        srcs = []
        for c in range(num_speakers):
            f0 = rng.uniform(200, 1500)
            srcs.append(0.3 * np.sin(2 * np.pi * f0 * t).astype(np.float32))
        mix = np.sum(srcs, axis=0)
        name = f"utt{i:03d}.wav"
        write_wav(os.path.join(root, split, "mix", name), mix, SR)
        for c in range(num_speakers):
            write_wav(os.path.join(root, split, f"s{c+1}", name), srcs[c], SR)
    return root


def test_wav_roundtrip(tmp_path):
    x = np.random.default_rng(0).uniform(-0.9, 0.9, 4000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, SR)
    y, sr = read_wav(p)
    assert sr == SR
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)
    assert wav_duration_samples(p) == 4000
    # float subtype is lossless
    p2 = str(tmp_path / "b.wav")
    write_wav(p2, x, SR, subtype="FLOAT")
    y2, _ = read_wav(p2)
    np.testing.assert_array_equal(y2, x)


def test_wav_resample(tmp_path):
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = str(tmp_path / "a16k.wav")
    write_wav(p, x, 16000, subtype="FLOAT")
    y, sr = read_wav(p, sample_rate=8000)
    assert sr == 8000
    assert y.shape[0] == 8000
    # energy of a pure tone under Nyquist is preserved
    assert abs(np.std(y) - np.std(x)) < 0.02


def test_manifest(tmp_path):
    root = _write_corpus(str(tmp_path), [32000, 40000, 16000])
    build_manifests(root, os.path.join(root, "json"), SR)
    with open(os.path.join(root, "json", "tr", "mix.json")) as f:
        infos = json.load(f)
    assert len(infos) == 3
    got = sorted(int(r[1]) for r in infos)
    assert got == [16000, 32000, 40000]


def _dataset(tmp_path, lengths, batch_size=4, segment=4.0, **kw):
    root = _write_corpus(str(tmp_path), lengths)
    jd = os.path.join(root, "json")
    build_manifests(root, jd, SR)
    return SeparationDataset(os.path.join(jd, "tr"), batch_size,
                             sample_rate=SR, segment=segment, **kw)


def test_batch_plan_drops_short_utts(tmp_path):
    # 2s utt < 4s segment is dropped (src/data.py:89)
    ds = _dataset(tmp_path, [32000, 16000, 33000])
    planned = [u.num_samples for b in ds.plan for u in b]
    assert 16000 not in planned
    assert set(planned) == {32000, 33000}


def test_batch_plan_spill_and_tail(tmp_path):
    # 40000 samples = 1 full segment + tail -> 2 segments; with bs=4,
    # utts of [40000, 40000, 32000] pack as 2+2 then 1.
    ds = _dataset(tmp_path, [40000, 40000, 32000], batch_size=4)
    assert len(ds.plan) == 2
    assert [len(b) for b in ds.plan] == [2, 1]
    batch = ds.load_batch(0)
    assert batch.mixture.shape == (4, 32000)
    assert batch.sources.shape == (4, 2, 32000)
    np.testing.assert_array_equal(batch.weights, [1, 1, 1, 1])
    # tail segment is re-anchored: last 32000 of the 40000-sample utt
    # (src/data.py:294-296) -> rows 1 and 3 start mid-signal
    assert np.any(batch.mixture[1] != batch.mixture[0])


def test_huge_utt_gets_own_batch_capped(tmp_path):
    # an utterance longer than batch_size*segment_len alone: capped at
    # batch_size full segments, no tail (src/data.py:290-296)
    ds = _dataset(tmp_path, [200000, 32000], batch_size=3)
    assert [len(b) for b in ds.plan] == [1, 1]
    b0 = ds.load_batch(0)
    np.testing.assert_array_equal(b0.weights, [1, 1, 1])
    b1 = ds.load_batch(1)
    np.testing.assert_array_equal(b1.weights, [1, 0, 0])  # padded rows


def test_max_hours_cap(tmp_path):
    lengths = [32000] * 20  # 4s each = 80s total
    ds = _dataset(tmp_path, lengths, batch_size=2, max_hours=20 / 3600)
    seen = sum(len(b) for b in ds.plan)
    assert seen < 20  # capped well below all 20 utts


def test_full_utterance_mode_and_cv_maxlen(tmp_path):
    ds = _dataset(tmp_path, [80000, 40000, 30000], batch_size=2,
                  segment=-1.0, cv_maxlen=6.0)
    planned = [u.num_samples for b in ds.plan for u in b]
    assert 80000 not in planned  # 10s > cv_maxlen=6s skipped (src/data.py:126)
    batch = ds.load_batch(0, pad_to_multiple=160)
    assert batch.mixture.shape[1] % 160 == 0
    assert batch.lengths.max() == 40000
    # padding region is zeros
    assert np.all(batch.mixture[batch.lengths.argmin(), 30000:] == 0)


def test_cv_skip_semantics_fixed_vs_reference(tmp_path):
    """Pin both over-long-cv-utterance behaviors: 'fixed' drops only the
    offending utterance; 'reference' reproduces src/data.py:124-128, where
    a too-long window head discards the whole batch_size window (including
    the compliant utterances that share it)."""
    # sorted desc: [80000, 46000, 44000, 30000]; cv_maxlen=6s -> 48000 cap.
    lengths = [46000, 80000, 30000, 44000]
    fixed = _dataset(tmp_path, lengths, batch_size=2, segment=-1.0,
                     cv_maxlen=6.0, cv_skip_semantics="fixed")
    planned = [u.num_samples for b in fixed.plan for u in b]
    assert planned == [46000, 44000, 30000]  # only the 80000 dropped

    ref = _dataset(tmp_path, lengths, batch_size=2, segment=-1.0,
                   cv_maxlen=6.0, cv_skip_semantics="reference")
    planned_ref = [u.num_samples for b in ref.plan for u in b]
    # window [80000, 46000]: head too long -> whole window skipped,
    # 46000 is silently lost; next window [44000, 30000] survives.
    assert planned_ref == [44000, 30000]

    with pytest.raises(ValueError):
        _dataset(tmp_path, lengths, segment=-1.0, cv_skip_semantics="bogus")


def test_loader_iterates_and_shuffles(tmp_path):
    ds = _dataset(tmp_path, [32000] * 6, batch_size=2)
    loader = BatchLoader(ds, shuffle=True, seed=1)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == len(ds)
    mix, lengths, sources, weights = batches[0]
    assert mix.shape == (2, 32000)
    assert sources.shape == (2, 2, 32000)
    # deterministic per-epoch order
    again = list(loader)
    np.testing.assert_array_equal(np.asarray(batches[0][0]), np.asarray(again[0][0]))
    loader.set_epoch(1)
    order0 = loader._order()
    loader.set_epoch(2)
    assert not np.array_equal(order0, loader._order())


def test_eval_dataset(tmp_path):
    root = _write_corpus(str(tmp_path), [32000, 20000, 24000])
    ds = EvalDataset(mix_dir=os.path.join(root, "tr", "mix"), batch_size=2,
                     sample_rate=SR)
    assert len(ds) == 2
    mix, lengths, names = ds.load_batch(0)
    assert mix.shape[0] == 2
    assert lengths[0] >= lengths[1]  # length-sorted desc
    assert all(n.endswith(".wav") for n in names)


def test_loader_stress_deterministic_contents(tmp_path):
    """Concurrency stress: many small batches through the threaded loader;
    contents must match direct dataset reads exactly, every epoch."""
    ds = _dataset(tmp_path, [8000] * 12, batch_size=2, segment=0.5)
    loader = BatchLoader(ds, shuffle=True, seed=7, num_workers=4, prefetch=3)
    loader.set_epoch(0)
    order = loader._order()
    got = [np.asarray(b[0]) for b in loader]
    want = [ds.load_batch(int(i)).mixture for i in order]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def _write_extensible_wav(path, x, sr, subformat, bits):
    """Hand-rolled WAVE_FORMAT_EXTENSIBLE file (fmt code 0xFFFE + GUID)."""
    import struct

    if subformat == 3:  # IEEE float
        payload = x.astype("<f4").tobytes()
    else:  # PCM16
        payload = (np.clip(x, -1, 1 - 1 / 32768) * 32768).astype("<i2").tobytes()
    guid = struct.pack("<H", subformat) + b"\x00\x00" + bytes.fromhex(
        "00001000800000aa00389b71")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * bits // 8, bits // 8, bits)
    fmt += struct.pack("<HHI", 22, bits, 0x4) + guid
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(fmt) - 16 + len(payload)))
        f.write(b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)


def test_wav_extensible_subformats(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE must dispatch on the SubFormat GUID: an
    IEEE-float extensible file decodes as float, not garbage int PCM."""
    x = np.random.default_rng(1).uniform(-0.5, 0.5, 2000).astype(np.float32)
    pf = str(tmp_path / "ext_float.wav")
    _write_extensible_wav(pf, x, SR, subformat=3, bits=32)
    y, sr = read_wav(pf)
    assert sr == SR
    np.testing.assert_array_equal(y, x)
    pp = str(tmp_path / "ext_pcm.wav")
    _write_extensible_wav(pp, x, SR, subformat=1, bits=16)
    y2, _ = read_wav(pp)
    np.testing.assert_allclose(y2, x, atol=1.0 / 32768)


def test_wav_malformed_headers(tmp_path):
    """Malformed headers raise clean ValueErrors (not struct/ZeroDivision)."""
    import struct

    import pytest

    # data chunk before fmt
    p = str(tmp_path / "data_first.wav")
    payload = b"\x00\x00" * 10
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WAVE")
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    with pytest.raises(ValueError):
        wav_duration_samples(p)
    # fmt chunk smaller than 16 bytes
    p2 = str(tmp_path / "tiny_fmt.wav")
    with open(p2, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 30) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00")
        f.write(b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        wav_duration_samples(p2)
    with pytest.raises(ValueError):
        read_wav(p2)
