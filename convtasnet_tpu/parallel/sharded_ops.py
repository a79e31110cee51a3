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

The dual-path family shards too (``_dpt_shard_forward``): chunks are
assigned whole to shards, intra-chunk attention and all norms/FFNs are
local, and inter-chunk attention gathers keys/values across the mesh
(one ``all_gather`` per layer) while queries stay local — attention
memory and compute split evenly over devices for minutes-long mixtures.
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


def _shard_encode(params, cfg, samples, axis_name):
    """Frame + encode this shard's samples [T_s] -> [K_s, N]; boundary
    frames pull ``(L/hop - 1)`` hops of samples from the right neighbor."""
    hop = cfg.stride
    L = cfg.kernel_size
    q = L // hop
    tail = _shift_from_right(samples.reshape(-1, 1), (q - 1) * hop, axis_name)
    buf = jnp.concatenate([samples.reshape(-1), tail.reshape(-1)])
    n_sub = buf.shape[0] // hop
    sub = buf[: n_sub * hop].reshape(n_sub, hop)
    K = samples.shape[0] // hop  # frames owned by this shard
    frames = jnp.concatenate([sub[i: i + K, :] for i in range(q)], axis=-1)
    return encode_frames(params["encoder"], frames)


def _decode_ola_spill(params, cfg, w, mask, axis_name):
    """Decode + shard-local overlap-add; the trailing ``L - hop`` spill is
    sent to the right neighbor and added to its head. Returns [C, T_s]."""
    from convtasnet_tpu.ops.frames import overlap_and_add

    hop = cfg.stride
    L = cfg.kernel_size
    C = mask.shape[-2]
    est = decode_frames(params["decoder"], w, mask)
    ola = overlap_and_add(est, hop)  # [C, (K-1)*hop + L] = [C, T_s + L - hop]
    T_s = w.shape[0] * hop
    body = ola[:, :T_s]
    spill = ola[:, T_s:]  # trailing L - hop samples belong to the right shard
    recv = _shift_from_left(spill.T.reshape(L - hop, C), L - hop, axis_name)
    return body.at[:, : L - hop].add(recv.reshape(L - hop, C).T)


def _shard_forward(cfg: ConvTasNetConfig, variables, samples, axis_name: str):
    """Per-shard separator forward. samples: [T_s] local samples."""
    params = variables["params"]
    stats_all = variables.get("batch_stats", {}).get("separator", {})
    w = _shard_encode(params, cfg, samples, axis_name)  # [K, N]

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
    return _decode_ola_spill(params, cfg, w, mask, axis_name)  # [C, T_s]


def _dpt_ln(prm, x):
    """Per-frame LayerNorm over features, f32 stats (``dual_path._LayerNorm``
    with the same 1e-6 eps)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * prm["gamma"] + prm["beta"]).astype(x.dtype)


def _dpt_att_local(prm, x, key_valid, n_heads):
    """Pre-LN MHA + residual on shard-local sequences (the intra path)."""
    from convtasnet_tpu.models.dual_path import masked_mha

    y = _dpt_ln(prm["norm"], x)
    qkv = y @ prm["qkv"]["kernel"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    a = masked_mha(q, k, v, key_valid, n_heads)
    return x + a @ prm["out"]["kernel"].astype(x.dtype)


def _dpt_att_inter(prm, xt, key_valid_g, n_heads, axis_name):
    """Sequence-parallel inter-chunk attention: queries stay local to this
    shard's chunks; keys/values are all-gathered over the shard axis so each
    chunk attends across the FULL global chunk sequence (one all_gather of
    [S, n_local, B] k and v per layer — O(K/n_shards) bytes, rides ICI)."""
    from convtasnet_tpu.models.dual_path import masked_mha

    y = _dpt_ln(prm["norm"], xt)
    qkv = y @ prm["qkv"]["kernel"].astype(xt.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    S, n_local, B = k.shape
    kg = jax.lax.all_gather(k, axis_name)  # [n_dev, S, n_local, B]
    vg = jax.lax.all_gather(v, axis_name)
    n_g = kg.shape[0] * n_local
    kg = jnp.moveaxis(kg, 0, 1).reshape(S, n_g, B)
    vg = jnp.moveaxis(vg, 0, 1).reshape(S, n_g, B)
    a = masked_mha(q, kg, vg, key_valid_g, n_heads)
    return xt + a @ prm["out"]["kernel"].astype(xt.dtype)


def _dpt_att_inter_ring(prm, xt, key_valid_g, n_heads, axis_name):
    """Ring-attention inter path: same math as ``_dpt_att_inter`` but the
    key/value blocks ROTATE around the mesh with ``ppermute`` while each
    shard folds one block per step into an online-softmax accumulator
    (running max / denominator, flash-attention style). Peak memory is
    O(n_local) per device — independent of the global chunk count — vs the
    gathered path's O(n_global); bandwidth is the same total bytes but
    nearest-neighbor, and each step's matmul overlaps the next ppermute.
    Numerically equivalent to the gathered path up to fp reordering.
    """
    import numpy as np

    y = _dpt_ln(prm["norm"], xt)
    qkv = y @ prm["qkv"]["kernel"].astype(xt.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    S, n_local, B = q.shape
    Dh = B // n_heads
    num = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    qh = q.reshape(S, n_local, n_heads, Dh).astype(jnp.float32)
    qh = qh / np.sqrt(Dh)

    perm = [(i, (i - 1) % num) for i in range(num)]
    m_i = jnp.full((S, n_heads, n_local), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((S, n_heads, n_local), jnp.float32)
    acc = jnp.zeros((S, n_heads, n_local, Dh), jnp.float32)
    kb, vb = k, v
    for t in range(num):
        owner = (idx + t) % num  # whose block this shard holds now
        block_valid = jax.lax.dynamic_slice_in_dim(
            key_valid_g, owner * n_local, n_local, axis=1)  # [S, n_local]
        kh = kb.reshape(S, n_local, n_heads, Dh).astype(jnp.float32)
        vh = vb.reshape(S, n_local, n_heads, Dh).astype(jnp.float32)
        logits = jnp.einsum("sqhd,skhd->shqk", qh, kh)
        logits = jnp.where(block_valid[:, None, None, :], logits, -jnp.inf)
        m_new = jnp.maximum(m_i, jnp.max(logits, axis=-1))
        # exp(-inf - -inf) would be NaN on all-invalid rows; clamp the shift
        shift = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(logits - shift[..., None])
        scale = jnp.exp(jnp.where(jnp.isfinite(m_i), m_i - shift, -jnp.inf))
        scale = jnp.where(jnp.isfinite(m_i), scale, 0.0)
        acc = acc * scale[..., None] + jnp.einsum("shqk,skhd->shqd", p, vh)
        l_i = l_i * scale + jnp.sum(p, axis=-1)
        m_i = m_new
        if t + 1 < num:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
    out = acc / jnp.where(l_i == 0.0, 1.0, l_i)[..., None]
    a = jnp.moveaxis(out, 1, 2).reshape(S, n_local, B).astype(xt.dtype)
    return xt + a @ prm["out"]["kernel"].astype(xt.dtype)


def _dpt_ffn(prm, x):
    """Pre-LN GELU MLP + residual (shard-local)."""
    y = _dpt_ln(prm["norm"], x)
    y = y @ prm["up"]["kernel"].astype(x.dtype) + prm["up"]["bias"].astype(
        x.dtype)
    y = jax.nn.gelu(y)
    y = y @ prm["down"]["kernel"].astype(x.dtype) + prm["down"]["bias"].astype(
        x.dtype)
    return x + y


def _dpt_shard_forward(cfg: ConvTasNetConfig, variables, samples,
                       K_valid: int, axis_name: str,
                       ring_attention: bool = False):
    """Per-shard dual-path forward. samples: [T_s]; this shard owns
    ``K_s = T_s/hop`` frames = ``n_local = K_s/S`` whole chunks (the caller
    pads so chunks never straddle shards).

    Intra-chunk attention, FFNs, and every LayerNorm are frame/chunk-local —
    only the inter-chunk attention needs communication (gathered keys/values,
    ``_dpt_att_inter``). ``K_valid`` is the unsharded model's frame count on
    the same padded input: frames beyond it are masked out of every softmax,
    so valid outputs match the unsharded forward exactly.
    """
    from convtasnet_tpu.models.dual_path import sinusoid_encoding
    from convtasnet_tpu.models.functional import mask_from_scores

    params = variables["params"]
    x_in = samples.astype(jnp.dtype(cfg.compute_dtype))
    w = _shard_encode(params, cfg, x_in, axis_name)  # [K_s, N]
    sep = params["separator"]
    S, B, H = cfg.dpt_chunk, cfg.bottleneck, cfg.dpt_num_heads

    y = _dpt_ln(sep["input_norm"], w)
    y = y @ sep["bottleneck"]["kernel"].astype(y.dtype)
    K_s = y.shape[0]
    n_local = K_s // S
    x = y.reshape(n_local, S, B)

    num = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    n_g = num * n_local

    # global frame validity [n_g, S] is static; this shard's slice is not
    valid_g = (jnp.arange(n_g * S) < K_valid).reshape(n_g, S)
    valid_local = jax.lax.dynamic_slice_in_dim(
        valid_g, idx * n_local, n_local, axis=0)  # [n_local, S]

    intra_pos = jnp.asarray(sinusoid_encoding(S, B))
    inter_pos_g = jnp.asarray(sinusoid_encoding(n_g, B))
    inter_local = jax.lax.dynamic_slice_in_dim(
        inter_pos_g, idx * n_local, n_local, axis=0)  # [n_local, B]
    x = x + intra_pos[None].astype(x.dtype) \
        + inter_local[:, None].astype(x.dtype)

    chunk_valid_g = valid_g.T  # [S, n_g]
    inter = _dpt_att_inter_ring if ring_attention else _dpt_att_inter
    for i in range(cfg.dpt_layers):
        lp = sep[f"layer_{i}"]
        x = _dpt_att_local(lp["intra_att"], x, valid_local, H)
        x = _dpt_ffn(lp["intra_ffn"], x)
        xt = jnp.swapaxes(x, 0, 1)  # [S, n_local, B]
        xt = inter(lp["inter_att"], xt, chunk_valid_g, H, axis_name)
        xt = _dpt_ffn(lp["inter_ffn"], xt)
        x = jnp.swapaxes(xt, 0, 1)

    x = _dpt_ln(sep["output_norm"], x).reshape(K_s, B)
    score = jax.nn.relu(x) @ sep["mask_conv"].astype(x.dtype)
    mask = mask_from_scores(cfg, score)  # [K_s, C, N]
    out = _decode_ola_spill(params, cfg, w, mask, axis_name)
    return out.astype(jnp.float32)


def separate_sharded(
    cfg: ConvTasNetConfig,
    variables: Dict[str, Any],
    mixture: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    ring_attention: bool = False,
) -> jax.Array:
    """Separate one long mixture [T] with the time axis sharded over ``mesh``.

    Returns [C, T]; T is padded internally to n_shards * hop alignment.
    Equivalent to ``ConvTasNet(cfg).apply`` on the zero-padded input (the
    final ``L - hop`` overlap-add tail, which the unsharded model also only
    fills partially, is dropped consistently).

    Both separator families are supported: the TCN exchanges conv halos and
    gLN statistics (module docstring); the dual-path family shards the
    chunk axis — intra attention is chunk-local, inter attention gathers
    keys/values across shards (``_dpt_att_inter``), so a minutes-long
    mixture's attention memory and compute split evenly over the mesh.
    ``ring_attention=True`` swaps the gathered inter path for the
    ppermute/online-softmax ring (``_dpt_att_inter_ring``): peak memory
    O(chunks/device) instead of O(total chunks), for extreme lengths.
    """
    n = mesh.shape[axis_name]
    hop = cfg.stride
    T = mixture.shape[-1]
    if cfg.separator == "dpt":
        # chunks must not straddle shards; pad >= L extra samples so the
        # trailing invalid frames' overlap-add lands beyond the crop (their
        # values differ from the unsharded model's zero-padded chunk rows)
        quantum = n * hop * cfg.dpt_chunk
        L = cfg.kernel_size
        Tp = -(-(T + L) // quantum) * quantum
        K_valid = (Tp - L) // hop + 1
        body = functools.partial(_dpt_shard_forward, cfg, variables,
                                 K_valid=K_valid, axis_name=axis_name,
                                 ring_attention=ring_attention)
    elif cfg.separator == "tcn":
        quantum = n * hop
        Tp = ((T + quantum - 1) // quantum) * quantum
        body = functools.partial(_shard_forward, cfg, variables,
                                 axis_name=axis_name)
    else:
        raise ValueError(f"unsupported separator family: {cfg.separator}")
    x = jnp.pad(mixture.reshape(-1), (0, Tp - T))

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    out = fn(x)  # [C, Tp]
    return out[:, :T]
