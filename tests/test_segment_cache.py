"""Decode-once memmapped segment cache (data/segment_cache.py).

The batch plan is static, so a filled cache must reproduce every planned
batch bit-for-bit (modulo the float16 storage quantization) with zero wav
decodes; the key must miss when the plan changes; partial fills (killed
mid-epoch-0) must resume per-slot.
"""

import os

import numpy as np
import pytest

from convtasnet_tpu.data import segment_cache as sc
from convtasnet_tpu.data.dataset import SeparationDataset
from convtasnet_tpu.data.loader import BatchLoader
from convtasnet_tpu.data.manifest import build_manifests

from test_data import SR, _write_corpus


def _dataset(root, lengths, batch_size=4, segment=4.0, **kw):
    _write_corpus(str(root), lengths)
    jd = os.path.join(str(root), "json")
    build_manifests(str(root), jd, SR)
    return SeparationDataset(os.path.join(jd, "tr"), batch_size,
                             sample_rate=SR, segment=segment, **kw)


def test_fill_then_hit_reproduces_batches(tmp_path, monkeypatch):
    ds = _dataset(tmp_path / "corpus", [SR * 5, SR * 4, SR * 9, SR * 6])
    cached = sc.CachedDataset(ds, str(tmp_path / "cache"))
    assert len(cached) == len(ds)
    assert cached.hit_fraction() == 0.0
    fill = [cached.load_batch(i) for i in range(len(cached))]
    assert cached.hit_fraction() == 1.0

    # a fresh instance over the same plan streams without ANY decode
    def boom(*a, **k):
        raise AssertionError("decode must not run on a cache hit")

    monkeypatch.setattr(sc.SeparationDataset, "load_batch", boom)
    cached2 = sc.CachedDataset(ds, str(tmp_path / "cache"))
    assert cached2.hit_fraction() == 1.0
    for i in range(len(cached2)):
        hit = cached2.load_batch(i)
        np.testing.assert_array_equal(hit.mixture, fill[i].mixture)
        np.testing.assert_array_equal(hit.sources, fill[i].sources)
        np.testing.assert_array_equal(hit.weights, fill[i].weights)
        np.testing.assert_array_equal(hit.lengths, fill[i].lengths)


def test_quantization_is_small_and_epochs_identical(tmp_path):
    ds = _dataset(tmp_path / "corpus", [SR * 5, SR * 6])
    raw = [ds.load_batch(i) for i in range(len(ds))]
    cached = sc.CachedDataset(ds, str(tmp_path / "cache"))
    e0 = [cached.load_batch(i) for i in range(len(cached))]
    e1 = [cached.load_batch(i) for i in range(len(cached))]
    for r, a, b in zip(raw, e0, e1):
        # epoch 0 returns the quantized values too -> identical epochs
        np.testing.assert_array_equal(a.mixture, b.mixture)
        np.testing.assert_array_equal(a.sources, b.sources)
        # float16 storage error stays ~5e-4 relative (66 dB down)
        assert np.max(np.abs(r.mixture - a.mixture)) < 1e-3
        assert np.max(np.abs(r.sources - a.sources)) < 1e-3


def test_partial_fill_resumes_per_slot(tmp_path):
    ds = _dataset(tmp_path / "corpus", [SR * 5, SR * 4, SR * 9, SR * 6])
    cached = sc.CachedDataset(ds, str(tmp_path / "cache"))
    cached.load_batch(0)  # only slot 0 filled, then "killed"
    cached2 = sc.CachedDataset(ds, str(tmp_path / "cache"))
    assert 0.0 < cached2.hit_fraction() < 1.0
    got = [cached2.load_batch(i) for i in range(len(cached2))]
    assert cached2.hit_fraction() == 1.0
    assert all(np.isfinite(b.mixture).all() for b in got)


def test_key_misses_on_plan_change(tmp_path):
    ds_a = _dataset(tmp_path / "a", [SR * 5, SR * 4])
    ds_b = _dataset(tmp_path / "b", [SR * 5, SR * 7])
    ca = sc.CachedDataset(ds_a, str(tmp_path / "cache"))
    cb = sc.CachedDataset(ds_b, str(tmp_path / "cache"))
    assert ca.dir != cb.dir


def test_maybe_cache_gating(tmp_path, monkeypatch):
    ds = _dataset(tmp_path / "corpus", [SR * 5])
    monkeypatch.setenv("CONVTASNET_SEGMENT_CACHE", str(tmp_path / "root"))
    out = sc.maybe_cache(ds)
    assert isinstance(out, sc.CachedDataset)
    assert str(tmp_path / "root") in out.dir

    monkeypatch.setenv("CONVTASNET_SEGMENT_CACHE", "0")
    assert sc.maybe_cache(ds) is ds                      # env kill switch
    monkeypatch.delenv("CONVTASNET_SEGMENT_CACHE")
    assert sc.maybe_cache(ds, enable=False) is ds        # config off

    # full-utterance datasets pass through (ragged shapes)
    full = SeparationDataset(os.path.join(str(tmp_path / "corpus"), "json",
                                          "tr"), 2, sample_rate=SR,
                             segment=-1.0)
    monkeypatch.setenv("CONVTASNET_SEGMENT_CACHE", str(tmp_path / "root"))
    assert sc.maybe_cache(full) is full


def test_loader_over_cached_dataset(tmp_path):
    """BatchLoader's threaded prefetch works over the cache (fill pass and
    hit pass yield identical device batches)."""
    ds = _dataset(tmp_path / "corpus", [SR * 5, SR * 4, SR * 9])
    cached = sc.CachedDataset(ds, str(tmp_path / "cache"))
    loader = BatchLoader(cached, shuffle=False, num_workers=2)
    a = [tuple(np.asarray(x) for x in b) for b in loader]
    b = [tuple(np.asarray(x) for x in b) for b in loader]
    assert len(a) == len(b) == len(ds)
    for ba, bb in zip(a, b):
        for xa, xb in zip(ba, bb):
            np.testing.assert_array_equal(xa, xb)
