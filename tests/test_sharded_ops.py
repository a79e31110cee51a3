"""Sequence-parallel (time-sharded) inference vs the unsharded model on the
virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
from convtasnet_tpu.parallel.mesh import make_mesh
from convtasnet_tpu.parallel.sharded_ops import separate_sharded

pytestmark = pytest.mark.slow

TINY = dict(n_filters=16, kernel_size=8, bottleneck=12, hidden=24,
            conv_kernel=3, num_blocks=3, num_repeats=2, num_speakers=2)


def _reference(cfg, variables, mixture, Tp):
    """Unsharded forward on the input padded to Tp + hop (frame alignment of
    the sharded path), trimmed back."""
    hop = cfg.stride
    x = jnp.pad(mixture, (0, Tp + hop - mixture.shape[-1]))[None]
    out = ConvTasNet(cfg).apply(variables, x, train=False)
    return np.asarray(out[0])


@pytest.mark.parametrize("norm_type,causal", [("gLN", False), ("cLN", True),
                                              ("BN", False)])
def test_sharded_matches_unsharded(norm_type, causal):
    cfg = ConvTasNetConfig(**TINY, norm_type=norm_type, causal=causal)
    T = 8 * 1000  # divides evenly over 8 shards
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mixture = jax.random.normal(jax.random.PRNGKey(1), (T,))
    mesh = make_mesh(n_data=8)
    got = np.asarray(separate_sharded(cfg, variables, mixture, mesh))
    want = _reference(cfg, variables, mixture, T)[:, :T]
    assert got.shape == (2, T)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_uneven_length_pads():
    cfg = ConvTasNetConfig(**TINY, norm_type="gLN")
    T = 7777  # not a multiple of shards*hop
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    mixture = jax.random.normal(jax.random.PRNGKey(2), (T,))
    mesh = make_mesh(n_data=8)
    got = np.asarray(separate_sharded(cfg, variables, mixture, mesh))
    assert got.shape == (2, T)
    hop = cfg.stride
    quantum = 8 * hop
    Tp = ((T + quantum - 1) // quantum) * quantum
    want = _reference(cfg, variables, mixture, Tp)[:, :T]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_softmax_three_speakers():
    cfg = ConvTasNetConfig(**{**TINY, "num_speakers": 3},
                           mask_nonlinear="softmax")
    T = 8 * 800
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mixture = jax.random.normal(jax.random.PRNGKey(3), (T,))
    mesh = make_mesh(n_data=8)
    got = np.asarray(separate_sharded(cfg, variables, mixture, mesh))
    want = _reference(cfg, variables, mixture, T)[:, :T]
    assert got.shape == (3, T)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_separate_sequence_parallel_cli(tmp_path):
    """Sequence-parallel separation through the public separate() API."""
    import os
    from convtasnet_tpu.data.audio_io import read_wav, write_wav
    from convtasnet_tpu.infer.separate import separate
    from convtasnet_tpu.train.checkpoint import save_checkpoint

    cfg = ConvTasNetConfig(**TINY)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, {"params": variables["params"], "batch_stats": {}},
                    cfg, epoch=0)
    mix_dir = tmp_path / "mix"
    os.makedirs(mix_dir)
    rng = np.random.default_rng(0)
    write_wav(str(mix_dir / "long.wav"),
              0.3 * rng.standard_normal(20000).astype(np.float32), 8000)
    out = str(tmp_path / "out")
    n = separate(ckpt, out, mix_dir=str(mix_dir), sequence_parallel=True)
    assert n == 1
    y, sr = read_wav(os.path.join(out, "long_s2.wav"))
    assert y.shape[0] == 20000


DPT = dict(n_filters=16, kernel_size=8, bottleneck=16, hidden=24,
           num_blocks=2, num_repeats=1, num_speakers=2, separator="dpt",
           dpt_chunk=16, dpt_layers=2, dpt_heads=4, dpt_ff=32)


def _dpt_reference(cfg, variables, mixture, Tp):
    """Unsharded forward on the input padded to exactly Tp: the sharded
    path masks frames >= the unsharded model's frame count on THIS length,
    so the reference must use the same padded length (unlike the TCN
    helper's +hop, which would add one more valid attention key)."""
    x = jnp.pad(mixture, (0, Tp - mixture.shape[-1]))[None]
    out = ConvTasNet(cfg).apply(variables, x, train=False)
    return np.asarray(out[0])


def test_dpt_sharded_matches_unsharded():
    """Sequence-parallel dual-path: chunk axis sharded over 8 devices,
    inter-chunk attention over gathered keys/values matches the global
    attention of the unsharded model."""
    cfg = ConvTasNetConfig(**DPT)
    T = 5000
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mixture = jax.random.normal(jax.random.PRNGKey(4), (T,))
    mesh = make_mesh(n_data=8)
    got = np.asarray(separate_sharded(cfg, variables, mixture, mesh))
    assert got.shape == (2, T)
    hop = cfg.stride
    quantum = 8 * hop * cfg.dpt_chunk
    L = cfg.kernel_size
    Tp = -(-(T + L) // quantum) * quantum
    want = _dpt_reference(cfg, variables, mixture, Tp)[:, :T]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dpt_sharded_softmax_three_speakers():
    cfg = ConvTasNetConfig(**{**DPT, "num_speakers": 3},
                           mask_nonlinear="softmax")
    T = 4096
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mixture = jax.random.normal(jax.random.PRNGKey(5), (T,))
    mesh = make_mesh(n_data=8)
    got = np.asarray(separate_sharded(cfg, variables, mixture, mesh))
    assert got.shape == (3, T)
    hop = cfg.stride
    quantum = 8 * hop * cfg.dpt_chunk
    Tp = -(-(T + cfg.kernel_size) // quantum) * quantum
    want = _dpt_reference(cfg, variables, mixture, Tp)[:, :T]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dpt_ring_attention_matches_gathered_and_unsharded():
    """The ppermute/online-softmax ring inter path equals the gathered-KV
    path and the unsharded model on valid samples."""
    cfg = ConvTasNetConfig(**DPT)
    T = 5000
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mixture = jax.random.normal(jax.random.PRNGKey(6), (T,))
    mesh = make_mesh(n_data=8)
    ring = np.asarray(separate_sharded(cfg, variables, mixture, mesh,
                                       ring_attention=True))
    gathered = np.asarray(separate_sharded(cfg, variables, mixture, mesh))
    np.testing.assert_allclose(ring, gathered, rtol=1e-4, atol=1e-4)
    hop = cfg.stride
    quantum = 8 * hop * cfg.dpt_chunk
    Tp = -(-(T + cfg.kernel_size) // quantum) * quantum
    want = _dpt_reference(cfg, variables, mixture, Tp)[:, :T]
    np.testing.assert_allclose(ring, want, rtol=1e-4, atol=1e-4)


def test_separate_sequence_parallel_cli_dpt_ring(tmp_path):
    """DPT + ring attention through the public separate() API."""
    import os
    from convtasnet_tpu.data.audio_io import read_wav, write_wav
    from convtasnet_tpu.infer.separate import separate
    from convtasnet_tpu.train.checkpoint import save_checkpoint

    cfg = ConvTasNetConfig(**DPT)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, {"params": variables["params"], "batch_stats": {}},
                    cfg, epoch=0)
    mix_dir = tmp_path / "mix"
    os.makedirs(mix_dir)
    rng = np.random.default_rng(1)
    write_wav(str(mix_dir / "long.wav"),
              0.3 * rng.standard_normal(20000).astype(np.float32), 8000)
    out = str(tmp_path / "out")
    n = separate(ckpt, out, mix_dir=str(mix_dir), sequence_parallel=True,
                 ring_attention=True)
    assert n == 1
    y, sr = read_wav(os.path.join(out, "long_s2.wav"))
    assert y.shape[0] == 20000
