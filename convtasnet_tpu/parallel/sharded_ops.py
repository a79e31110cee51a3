"""Sequence (time-axis) parallel inference: shard one long mixture over the
device mesh.

The reference has no sequence-length scaling story beyond chunking to 4 s
segments and capping cv lengths (SURVEY §5 "Long-context: absent") — a
minutes-long mixture OOMs or serializes. Here the separator itself runs SPMD
over the ``data`` axis with the time dimension sharded:

- encoder framing: each shard pulls one hop of *samples* from its right
  neighbor (``ppermute``) so boundary frames are exact;
- every dilated depthwise conv exchanges a ``(P-1)/2 * dilation``-frame halo
  with both neighbors (causal: left only), edge shards see zeros — exactly
  the zero padding of the unsharded op;
- gLN reduces via ``psum`` over the axis (mean/var over global channels x
  time); cLN/BN stay shard-local;
- decoder overlap-add sends its trailing ``L - hop`` samples to the right
  neighbor, which adds them to its head.

The result is bit-equivalent to the unsharded forward on the same (padded)
input — tested on the virtual 8-device mesh. Collectives are
nearest-neighbor ``ppermute`` + one small ``psum`` pair per gLN, so traffic
rides ICI and scales O(1) with sequence length.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.functional import (
    decode_frames,
    encode_frames,
    separator_forward,
)

EPS = 1e-8


def _shift_from_right(x: jax.Array, n: int, axis_name: str) -> jax.Array:
    """First n rows of the right neighbor (zeros on the last shard)."""
    num = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    head = jax.lax.slice_in_dim(x, 0, n, axis=0)
    recv = jax.lax.ppermute(
        head, axis_name, [(i, (i - 1) % num) for i in range(num)])
    return jnp.where(idx < num - 1, recv, jnp.zeros_like(recv))


def _shift_from_left(x: jax.Array, n: int, axis_name: str) -> jax.Array:
    """Last n rows of the left neighbor (zeros on the first shard)."""
    num = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    tail = jax.lax.slice_in_dim(x, x.shape[0] - n, x.shape[0], axis=0)
    recv = jax.lax.ppermute(
        tail, axis_name, [(i, (i + 1) % num) for i in range(num)])
    return jnp.where(idx > 0, recv, jnp.zeros_like(recv))


def _sharded_gln(y, gamma, beta, axis_name):
    """gLN with cross-shard statistics: two scalars psummed over the axis."""
    yf = y.astype(jnp.float32)
    local_n = jnp.float32(yf.size)
    s1 = jax.lax.psum(jnp.sum(yf), axis_name)
    s2 = jax.lax.psum(jnp.sum(yf * yf), axis_name)
    n = jax.lax.psum(local_n, axis_name)
    mean = s1 / n
    var = s2 / n - mean * mean
    out = (yf - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta
    return out.astype(y.dtype)


def _cln(y, gamma, beta):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    out = (yf - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta
    return out.astype(y.dtype)


def _norm(y, prm, stats, cfg, axis_name):
    if cfg.norm_type == "gLN":
        return _sharded_gln(y, prm["gamma"], prm["beta"], axis_name)
    if cfg.norm_type == "cLN":
        return _cln(y, prm["gamma"], prm["beta"])
    from convtasnet_tpu.ops.norm import batch_norm

    return batch_norm(y.astype(jnp.float32), prm["gamma"], prm["beta"],
                      stats["mean"], stats["var"]).astype(y.dtype)


def _sharded_dwconv(h, w, dilation, causal, axis_name):
    """Depthwise dilated conv on a time shard [K_s, H] with halo exchange."""
    Pk = w.shape[0]
    if causal:
        left, right = (Pk - 1) * dilation, 0
    else:
        left = right = ((Pk - 1) * dilation) // 2
    parts = [h]
    if left > 0:
        parts.insert(0, _shift_from_left(h, left, axis_name))
    if right > 0:
        parts.append(_shift_from_right(h, right, axis_name))
    hp = jnp.concatenate(parts, axis=0)
    K = h.shape[0]
    out = hp[0: K, :] * w[0]
    for p in range(1, Pk):
        out = out + hp[p * dilation: p * dilation + K, :] * w[p]
    return out


def _shard_forward(cfg: ConvTasNetConfig, variables, samples, axis_name: str):
    """Per-shard separator forward. samples: [T_s] local samples."""
    params = variables["params"]
    stats_all = variables.get("batch_stats", {}).get("separator", {})
    hop = cfg.stride
    L = cfg.kernel_size
    q = L // hop

    # encoder framing with (q-1) hops of right-neighbor samples
    tail = _shift_from_right(samples.reshape(-1, 1), (q - 1) * hop, axis_name)
    buf = jnp.concatenate([samples.reshape(-1), tail.reshape(-1)])
    n_sub = buf.shape[0] // hop
    sub = buf[: n_sub * hop].reshape(n_sub, hop)
    K = samples.shape[0] // hop  # frames owned by this shard
    frames = jnp.concatenate([sub[i: i + K, :] for i in range(q)], axis=-1)
    w = encode_frames(params["encoder"], frames)  # [K, N]

    sep = params["separator"]

    def make_block_ops(name, dilation):
        st = stats_all.get(name, {})
        return {
            "dwconv": lambda h, wdw: _sharded_dwconv(
                h, wdw, dilation, cfg.causal, axis_name),
            "norm1": lambda h: _norm(h, sep[name]["norm1"], st.get("norm1"),
                                     cfg, axis_name),
            "norm2": lambda h: _norm(h, sep[name]["norm2"], st.get("norm2"),
                                     cfg, axis_name),
        }

    mask = separator_forward(
        cfg, sep, w,
        input_norm=lambda v: _cln(v, sep["input_norm"]["gamma"],
                                  sep["input_norm"]["beta"]),
        make_block_ops=make_block_ops,
    )
    C = cfg.num_speakers

    # decoder + boundary overlap-add
    est = decode_frames(params["decoder"], w, mask)
    from convtasnet_tpu.ops.frames import overlap_and_add

    ola = overlap_and_add(est, hop)  # [C, (K-1)*hop + L] = [C, T_s + L - hop]
    T_s = K * hop
    body = ola[:, :T_s]
    spill = ola[:, T_s:]  # trailing L - hop samples belong to the right shard
    recv = _shift_from_left(spill.T.reshape(L - hop, C), L - hop, axis_name)
    body = body.at[:, : L - hop].add(recv.reshape(L - hop, C).T)
    return body  # [C, T_s]


def separate_sharded(
    cfg: ConvTasNetConfig,
    variables: Dict[str, Any],
    mixture: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
) -> jax.Array:
    """Separate one long mixture [T] with the time axis sharded over ``mesh``.

    Returns [C, T]; T is padded internally to n_shards * hop alignment.
    Equivalent to ``ConvTasNet(cfg).apply`` on the zero-padded input (the
    final ``L - hop`` overlap-add tail, which the unsharded model also only
    fills partially, is dropped consistently).
    """
    if cfg.separator != "tcn":
        raise ValueError(
            "sequence-parallel separation implements the TCN separator's "
            "halo/psum exchanges; dual-path attention shards differently "
            "(use data parallelism)")
    n = mesh.shape[axis_name]
    hop = cfg.stride
    T = mixture.shape[-1]
    quantum = n * hop
    Tp = ((T + quantum - 1) // quantum) * quantum
    x = jnp.pad(mixture.reshape(-1), (0, Tp - T))

    fn = jax.shard_map(
        functools.partial(_shard_forward, cfg, variables, axis_name=axis_name),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    out = fn(x)  # [C, Tp]
    return out[:, :T]
