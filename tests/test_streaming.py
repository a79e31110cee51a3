"""Streaming separator tests: exact equivalence with the batch causal model
under arbitrary chunking, state carry correctness, and the gLN guard."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
from convtasnet_tpu.models.streaming import (
    StreamingSeparator,
    init_stream_state,
    stream_flush,
    stream_step,
)

CAUSAL = ConvTasNetConfig(
    n_filters=16, kernel_size=8, bottleneck=12, hidden=24, conv_kernel=3,
    num_blocks=3, num_repeats=2, num_speakers=2, norm_type="cLN", causal=True)


def _batch_reference(cfg, variables, x):
    """Batch causal forward on the left-padded input (alignment contract)."""
    pad = cfg.kernel_size - cfg.stride
    xp = jnp.pad(x, ((0, 0), (pad, 0)))
    model = ConvTasNet(cfg)
    return np.asarray(model.apply(variables, xp, train=False))


@pytest.mark.parametrize("chunks", [[400, 400, 800], [80, 80, 80, 1360], [1600]])
def test_streaming_matches_batch(chunks):
    cfg = CAUSAL
    assert sum(chunks) == 1600
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1600)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1600))

    state = init_stream_state(cfg, batch_size=2)
    outs = []
    offset = 0
    for c in chunks:
        state, out = stream_step(cfg, variables, state, x[:, offset:offset + c])
        outs.append(np.asarray(out))
        offset += c
    outs.append(np.asarray(stream_flush(cfg, state)))
    got = np.concatenate(outs, axis=-1)

    want = _batch_reference(cfg, variables, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_streaming_chunk_independence():
    """Different chunkings of the same signal give identical outputs."""
    cfg = CAUSAL
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=800)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 800))

    def run(chunks):
        state = init_stream_state(cfg, 1)
        outs, off = [], 0
        for c in chunks:
            state, o = stream_step(cfg, variables, state, x[:, off:off + c])
            outs.append(np.asarray(o))
            off += c
        return np.concatenate(outs, axis=-1)

    a = run([800])
    b = run([40] * 20)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_streaming_wrapper_and_latency():
    cfg = CAUSAL
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=400)
    sep = StreamingSeparator(cfg, variables, batch_size=1)
    assert sep.latency_samples == cfg.kernel_size
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 400))
    out = sep.process(x)
    assert out.shape == (1, 2, 400)
    tail = sep.flush()
    assert tail.shape == (1, 2, cfg.kernel_size - cfg.stride)


def test_gln_not_streamable():
    cfg = ConvTasNetConfig(norm_type="gLN", causal=False)
    with pytest.raises(ValueError):
        init_stream_state(cfg, 1)


def test_streaming_bn_uses_running_stats():
    cfg = ConvTasNetConfig(
        n_filters=16, kernel_size=8, bottleneck=12, hidden=24, conv_kernel=3,
        num_blocks=2, num_repeats=1, num_speakers=2, norm_type="BN", causal=True)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=800)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 800))
    state = init_stream_state(cfg, 1)
    state, out = stream_step(cfg, variables, state, x)
    got = np.concatenate([np.asarray(out), np.asarray(stream_flush(cfg, state))],
                         axis=-1)
    want = _batch_reference(cfg, variables, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_stream_scan_matches_stepwise():
    from convtasnet_tpu.models.streaming import stream_scan

    cfg = CAUSAL
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1600)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 1600))
    chunk = 160
    chunks = jnp.stack([x[:, i:i + chunk] for i in range(0, 1600, chunk)])

    state = init_stream_state(cfg, 2)
    outs = []
    for i in range(chunks.shape[0]):
        state, o = stream_step(cfg, variables, state, chunks[i])
        outs.append(np.asarray(o))
    want = np.stack(outs)
    want_tail = np.asarray(stream_flush(cfg, state))

    final, got = jax.jit(
        lambda c: stream_scan(cfg, variables, c))(chunks)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stream_flush(cfg, final)),
                               want_tail, rtol=1e-4, atol=1e-5)


def test_stream_demo_end_to_end(tmp_path):
    """The serving demo: chunked separation with latency stats; output
    matches the batch causal forward on the same (padded) input."""
    import json as _json

    from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
    from convtasnet_tpu.data.audio_io import read_wav, write_wav
    from convtasnet_tpu.infer.stream_demo import stream_demo
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.train.checkpoint import save_checkpoint
    from convtasnet_tpu.train.train_step import create_train_state

    cfg = ConvTasNetConfig(
        n_filters=32, kernel_size=16, bottleneck=24, hidden=48,
        conv_kernel=3, num_blocks=3, num_repeats=2, num_speakers=2,
        causal=True, norm_type="cLN")
    state, _ = create_train_state(cfg, SolverConfig(lr=1e-3),
                                  jax.random.PRNGKey(0), 4000)
    ckpt = str(tmp_path / "causal.ckpt")
    save_checkpoint(ckpt, state, cfg, epoch=0)

    rng = np.random.default_rng(0)
    T = 6000
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(T) / 8000)
         + 0.1 * rng.standard_normal(T)).astype(np.float32)
    wav = str(tmp_path / "mix.wav")
    write_wav(wav, x, 8000)

    out_dir = str(tmp_path / "sep")
    stats = stream_demo(ckpt, wav, chunk_ms=20.0, out_dir=out_dir)
    for k in ("p50_ms", "p99_ms", "rtf", "deadline_met", "latency_ms"):
        assert k in stats
    assert stats["chunk_ms"] == 20.0  # 160 samples = whole hops at L=16
    y1, sr = read_wav(os.path.join(out_dir, "mix_s1.wav"))
    assert sr == 8000 and len(y1) == T

    # batch-forward consistency (same padding convention as the stream)
    x_file, _ = read_wav(wav)  # PCM16-quantized signal the demo actually saw
    hop = cfg.stride
    pad = cfg.kernel_size - hop
    model = ConvTasNet(cfg)
    sd, meta = __import__("convtasnet_tpu.train.checkpoint",
                          fromlist=["load_checkpoint"]).load_checkpoint(ckpt)
    variables = {"params": sd["params"]}
    want = np.asarray(model.apply(
        variables, jnp.pad(jnp.asarray(x_file)[None, :], ((0, 0), (pad, 0)))
    ))[0, 0, :T]
    np.testing.assert_allclose(y1, want, atol=2e-3)  # PCM16 write + float
