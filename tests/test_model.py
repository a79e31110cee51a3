"""Model tests: shapes/dtypes for all config knobs (the analog of the
reference's seeded ``__main__`` smoke blocks, ``src/conv_tasnet.py:364-394``),
causal-vs-noncausal structure, mask properties, and gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

TINY = dict(n_filters=16, kernel_size=8, bottleneck=12, hidden=24,
            conv_kernel=3, num_blocks=3, num_repeats=2, num_speakers=2,
            sample_rate=8000)


def _forward(cfg, T=1600, M=2, seed=0):
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(seed), example_len=T)
    mix = jax.random.normal(jax.random.PRNGKey(seed + 1), (M, T))
    out = model.apply(variables, mix, train=False)
    return np.asarray(out), variables


@pytest.mark.parametrize("norm_type", ["gLN", "cLN", "BN"])
@pytest.mark.parametrize("causal", [False, True])
def test_forward_shapes_all_norms(norm_type, causal):
    cfg = ConvTasNetConfig(**TINY, norm_type=norm_type, causal=causal)
    out, _ = _forward(cfg)
    assert out.shape == (2, 2, 1600)
    assert out.dtype == np.float32
    assert np.all(np.isfinite(out))


@pytest.mark.parametrize("mask_nonlinear", ["relu", "softmax"])
def test_mask_nonlinearities(mask_nonlinear):
    cfg = ConvTasNetConfig(**TINY, mask_nonlinear=mask_nonlinear)
    out, _ = _forward(cfg)
    assert np.all(np.isfinite(out))


def test_softmax_masks_sum_to_one():
    from convtasnet_tpu.models.conv_tasnet import Encoder, TemporalConvNet
    cfg = ConvTasNetConfig(**TINY, mask_nonlinear="softmax")
    enc = Encoder(cfg)
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (2, 1600))
    enc_vars = enc.init(rng, mix)
    w = enc.apply(enc_vars, mix)
    sep = TemporalConvNet(cfg)
    sep_vars = sep.init(rng, w)
    masks = sep.apply(sep_vars, w)  # [M, K, C, N]
    np.testing.assert_allclose(
        np.asarray(masks.sum(axis=2)), 1.0, rtol=1e-5, atol=1e-5)


def test_three_speakers():
    cfg = ConvTasNetConfig(**{**TINY, "num_speakers": 3})
    out, _ = _forward(cfg)
    assert out.shape == (2, 3, 1600)


def test_output_padding_to_input_length():
    # T chosen so the last partial frame is dropped; output must be padded back.
    cfg = ConvTasNetConfig(**TINY)
    T = 1600 + 5
    out, _ = _forward(cfg, T=T)
    assert out.shape[-1] == T
    # the unframed tail must be exactly zero (reference pads with zeros,
    # src/conv_tasnet.py:59)
    assert np.all(out[..., -1:] == 0)


def test_causal_model_is_causal():
    """Changing the future must not change past outputs (cLN + causal convs)."""
    cfg = ConvTasNetConfig(**TINY, norm_type="cLN", causal=True)
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1600)
    mix = jax.random.normal(jax.random.PRNGKey(1), (1, 1600))
    out1 = model.apply(variables, mix)
    mix2 = mix.at[:, 1200:].set(jax.random.normal(jax.random.PRNGKey(2), (1, 400)))
    out2 = model.apply(variables, mix2)
    # outputs strictly before the modified region (minus one encoder frame of
    # lookahead from the 50%-overlap framing) must be identical
    hop = cfg.stride
    safe = 1200 - cfg.kernel_size
    np.testing.assert_allclose(
        np.asarray(out1[..., :safe]), np.asarray(out2[..., :safe]), atol=1e-5)


def test_noncausal_model_uses_future():
    cfg = ConvTasNetConfig(**TINY, norm_type="gLN", causal=False)
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1600)
    mix = jax.random.normal(jax.random.PRNGKey(1), (1, 1600))
    out1 = model.apply(variables, mix)
    mix2 = mix.at[:, 1500:].set(0.0)
    out2 = model.apply(variables, mix2)
    assert not np.allclose(np.asarray(out1[..., :100]), np.asarray(out2[..., :100]))


def test_gradients_flow_everywhere():
    cfg = ConvTasNetConfig(**TINY)
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1600)
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 1600))

    def loss_fn(params):
        out = model.apply({"params": params}, mix)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert len(flat) > 0
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), path
        assert float(jnp.max(jnp.abs(g))) > 0, f"dead gradient at {path}"


def test_bn_updates_batch_stats():
    cfg = ConvTasNetConfig(**TINY, norm_type="BN")
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1600)
    assert "batch_stats" in variables
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 1600))
    out, updates = model.apply(
        variables, mix, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after))
    assert changed


def test_bf16_compute_path():
    cfg = ConvTasNetConfig(**TINY, compute_dtype="bfloat16")
    out, _ = _forward(cfg)
    assert out.dtype == np.float32  # outputs promoted back to f32
    assert np.all(np.isfinite(out))


def test_param_count_paper_config():
    """Paper config ≈ 8.7M params (SURVEY §6)."""
    cfg = ConvTasNetConfig()  # defaults = paper config
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 8.0e6 < n < 9.5e6, n


def test_remat_matches_no_remat():
    import dataclasses
    cfg = ConvTasNetConfig(**TINY)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1600)
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 1600))
    src = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 1600))

    def loss(c, params):
        out = ConvTasNet(c).apply({"params": params}, mix, train=True)
        return jnp.mean((out - src) ** 2)

    cfg_r = dataclasses.replace(cfg, remat=True)
    l1, g1 = jax.value_and_grad(lambda p: loss(cfg, p))(variables["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(cfg_r, p))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_apply_batch_chunked_matches_full():
    """lax.map batch chunking (the VMEM-residency serving optimization) is
    numerically identical to the one-call forward, and falls back cleanly
    when the batch doesn't divide."""
    import jax
    import jax.numpy as jnp
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import (
        ConvTasNet, apply_batch_chunked, init_params)

    cfg = ConvTasNetConfig(
        n_filters=16, kernel_size=8, bottleneck=12, hidden=24, conv_kernel=3,
        num_blocks=2, num_repeats=1, num_speakers=2)
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1600)
    mix = jax.random.normal(jax.random.PRNGKey(1), (4, 1600))
    full = model.apply(variables, mix, train=False)
    chunked = apply_batch_chunked(model, variables, mix, chunk=2, train=False)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-6, atol=1e-6)
    # non-divisible batch: falls back to the one-call path
    mix3 = mix[:3]
    fb = apply_batch_chunked(model, variables, mix3, chunk=2, train=False)
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(model.apply(variables, mix3, train=False)),
        rtol=1e-6, atol=1e-6)
