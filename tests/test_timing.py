"""utils/timing — the single implementation of the relay timing protocol
(device_get forcing, RTT subtraction, minimum-integrated-work rescaling)."""

import jax
import jax.numpy as jnp

from convtasnet_tpu.utils.timing import (
    median_fetch_seconds,
    rtt_baseline,
    time_chained,
)


def test_rtt_baseline_positive():
    x = jnp.ones((8, 128), jnp.float32)
    assert rtt_baseline(x, trials=3) > 0


def test_median_fetch_seconds_runs_fn():
    calls = []
    f = jax.jit(lambda a: jnp.sum(a * 2))
    x = jnp.ones((4, 4), jnp.float32)

    def wrapped(a):
        calls.append(1)
        return f(a)

    t = median_fetch_seconds(wrapped, x, trials=3)
    assert t > 0
    assert len(calls) == 4  # warmup + 3 trials


def test_time_chained_rescales_tiny_work():
    """A near-free fn must trigger the min-work rescale and still return a
    sane positive per-iteration time (not pure RTT noise)."""
    fn = lambda a: a * 1.0001 + 0.1  # noqa: E731
    x = jnp.ones((4, 64), jnp.float32)
    per = time_chained(fn, x, inner=10, trials=3, min_work_s=0.01)
    assert 0 < per < 0.01  # far less than the min-work chain itself


def test_compile_cache_enable_and_disable(monkeypatch, tmp_path):
    from convtasnet_tpu.utils import compile_cache as cc

    monkeypatch.setattr(cc, "_ENABLED", False)
    monkeypatch.setenv("CONVTASNET_COMPILE_CACHE", "0")
    assert cc.enable_compile_cache() is None
    monkeypatch.setenv("CONVTASNET_COMPILE_CACHE", str(tmp_path / "xc"))
    try:
        d = cc.enable_compile_cache()
        assert d == str(tmp_path / "xc")
        import os

        assert os.path.isdir(d)
        # idempotent
        assert cc.enable_compile_cache() == d
    finally:
        # tmp_path is reclaimed after the test — don't leave jax pointed at it
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setattr(cc, "_ENABLED", False)
