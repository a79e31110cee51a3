"""Normalization ops for channels-last ``[..., K, N]`` activations.

Parity targets (note the reference is channels-*first* ``[M, N, K]``):

- ``channelwise_layer_norm`` (cLN): per-(batch, timestep) statistics over the
  channel axis only — reference ``src/conv_tasnet.py:325-335`` (mean/var over
  dim=1 with ``unbiased=False``). Channels-last makes this a plain layernorm
  over the trailing axis, the cheapest possible reduction layout on TPU
  (lane-axis reduction on the VPU).
- ``global_layer_norm`` (gLN): statistics over channels *and* time —
  reference ``src/conv_tasnet.py:350-361``.
- ``batch_norm``: inference-style affine normalize with given statistics;
  training-time batch statistics live in the model layer (reference uses
  ``nn.BatchNorm1d``, ``src/conv_tasnet.py:306-309``).

All match the reference numerics: eps is *added to the variance* before the
square root (``(var + EPS).pow(0.5)``), EPS = 1e-8, biased variance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def _affine(x_hat: jax.Array, gamma: jax.Array, beta: jax.Array) -> jax.Array:
    # gamma/beta are [N]; broadcast over leading batch/time axes.
    return x_hat * gamma + beta


def channelwise_layer_norm(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = EPS
) -> jax.Array:
    """cLN: normalize each timestep over its channel vector. x: [..., K, N]."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x_hat = (x - mean) * jax.lax.rsqrt(var + eps)
    return _affine(x_hat, gamma, beta)


def global_layer_norm(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = EPS
) -> jax.Array:
    """gLN: normalize over channels and time jointly. x: [..., K, N].

    This is the only full-sequence reduction in the model (what makes the
    non-causal variant non-streamable, SURVEY §5). Under time-axis sharding
    the mean/var reductions must become ``psum`` over the time axis; see
    ``parallel/sharded_ops.py``.
    """
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(-2, -1), keepdims=True)
    x_hat = (x - mean) * jax.lax.rsqrt(var + eps)
    return _affine(x_hat, gamma, beta)


def batch_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Affine batch-norm transform with externally supplied statistics.

    ``mean``/``var`` are per-channel [N]; in training they are batch
    statistics over (batch, time) — computed in the model layer so they can be
    synced across data-parallel shards — and running averages at eval time.
    eps default matches ``nn.BatchNorm1d`` (1e-5).
    """
    x_hat = (x - mean) * jax.lax.rsqrt(var + eps)
    return _affine(x_hat, gamma, beta)
