"""Fused dual-path intra-chunk attention sublayer (Pallas/Mosaic).

Companion to ``dpt_attention.py`` (the inter-chunk sublayer): with the
inter and FFN sublayers fused, the *intra* sublayer is the dual-path
layer's last XLA-resident piece. Its attention is local to each chunk —
per (chunk, head) ``[S, d] x [d, S]`` score/mix contractions with
``S = 128`` positions and head-dim 32 — which XLA runs as batched
matmuls near their floor, but still pays full-tensor HBM round trips
for the pre-LN, the QKV/output projections, and the residual, plus the
head split/merge layout copies. This kernel fuses the whole sublayer
(pre-LN + QKV + per-chunk MHA + out proj + residual) into one
VMEM-resident pass per (batch row, chunk tile):

- projections run as large MXU matmuls in the natural ``[ct*S, B]``
  layout (same as the inter kernel);
- attention works in the transposed ``[B, S]`` per-chunk layout the
  QKV swapaxes already produces: per head, scores are one
  ``[d, S]^T x [d, S]`` MXU contraction (positions in lanes) and the
  mix is one ``[d, S] x [S, S]^T`` contraction — 2-D dots only, no
  gathers, no sub-128-lane reductions (Mosaic hard constraints);
- everything between first read and final write stays in VMEM.

Probe discipline matches the other fused kernels: candidates
AOT-compile, are numerics-gated on-device against the XLA sublayer,
then race it on time; winners persist in the shared autotune cache
under ``dpt:intra:`` keys. An unprobed / losing / non-compiling shape
keeps the XLA path.

Reference parity: computes exactly
``models/dual_path._AttentionSublayer`` with ``attend_axis=2`` (itself
a TPU-native capability extension; the reference ships only the TCN
separator, ``src/conv_tasnet.py:149-215``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convtasnet_tpu.ops.pallas import probe_budget
from convtasnet_tpu.ops.pallas.dpt_attention import _out_vma

NEG_INF = -1e9
_EPS = 1e-6


def _intra_kernel(x_ref, wqkv_ref, wout_ref, aff_ref, bias_ref, o_ref,
                  at_ref, *, n_heads: int, partial: bool = False):
    """One (batch row, chunk tile): fused pre-LN + per-chunk MHA.

    x_ref:    [1, ct, S, B]  input block (residual source)
    wqkv_ref: [B, 3*Bq]      QKV projection (Bq == B unless the weights
                             are a tensor-parallel head-group shard)
    wout_ref: [Bq, B]        output projection
    aff_ref:  [2, B] f32     LN gamma / beta
    bias_ref: [ct, 1, S] f32 additive key bias (0 valid / -1e9 pad; the
                             unit middle dim keeps the block's last-two
                             dims Mosaic-legal for any ct)
    o_ref:    [1, ct, S, B]  output block
    at_ref:   [ct, Bq, S]    scratch — attention output, transposed layout

    ``partial=True`` emits the output projection ONLY (no residual add):
    the tensor-parallel caller psums partial projections over the model
    axis and adds the residual once (``parallel/dpt_tp.py``).
    """
    _, ct, S, B = x_ref.shape
    Bq = wqkv_ref.shape[1] // 3     # local attention width (heads on shard)
    h = n_heads
    d = Bq // h
    cdtype = x_ref.dtype

    # pre-LN over channels (f32 statistics, same as models/dual_path)
    xf = x_ref[0].astype(jnp.float32)                       # [ct, S, B]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    g = aff_ref[0:1, :].reshape(1, 1, B)
    b = aff_ref[1:2, :].reshape(1, 1, B)
    y = ((xf - mean) * jax.lax.rsqrt(var + _EPS) * g + b).astype(cdtype)

    # QKV: one [ct*S, B] x [B, 3*Bq] MXU matmul (f32 accumulate, round once)
    qkv = jnp.dot(y.reshape(ct * S, B), wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(cdtype)
    qkv = qkv.reshape(ct, S, 3 * Bq)
    # transposed per-chunk layout [ct, Bq, S]: positions in lanes; per-head
    # operands are then 32-aligned SUBLANE slices (lane slices below 128
    # would force relayouts)
    q = jnp.swapaxes(qkv[:, :, 0 * Bq:1 * Bq], 1, 2)
    k = jnp.swapaxes(qkv[:, :, 1 * Bq:2 * Bq], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2 * Bq:3 * Bq], 1, 2)

    scale = 1.0 / float(np.sqrt(d))
    for c in range(ct):
        bias_c = bias_ref[c].reshape(1, S)                  # keys in lanes
        for i in range(h):
            q_i = q[c:c + 1, i * d:(i + 1) * d, :].reshape(d, S)
            k_i = k[c:c + 1, i * d:(i + 1) * d, :].reshape(d, S)
            v_i = v[c:c + 1, i * d:(i + 1) * d, :].reshape(d, S)
            # scores[q, k] = sum_d q_i[d, q] k_i[d, k] — one MXU dot with
            # the contraction on the sublane axis of both operands
            s = jax.lax.dot_general(
                q_i, k_i, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [S, S]
            s = s * scale + bias_c
            m_ = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m_)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
            # mix[d, q] = sum_k v_i[d, k] p[q, k]
            at_ref[c, i * d:(i + 1) * d, :] = jax.lax.dot_general(
                v_i, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdtype)

    a = jnp.swapaxes(at_ref[:], 1, 2)                       # [ct, S, Bq]
    out = jnp.dot(a.reshape(ct * S, Bq), wout_ref[:],
                  preferred_element_type=jnp.float32).astype(cdtype)
    if partial:
        o_ref[0] = out.reshape(ct, S, B)
    else:
        o_ref[0] = x_ref[0] + out.reshape(ct, S, B)


def _chunk_tiles(n: int) -> list:
    """Candidate chunks-per-grid-step values: 1 (smallest kernel body,
    most grid steps) plus the smallest nontrivial divisor of ``n`` up to
    8 (amortizes per-step overhead without exploding the unroll)."""
    tiles = [1]
    for ct in range(2, 9):
        if n % ct == 0:
            tiles.append(ct)
            break
    return tiles


def fused_intra_attention(
    x: jax.Array,                    # [M, n, S, B]
    gamma: jax.Array,                # [B] f32
    beta: jax.Array,                 # [B] f32
    w_qkv: jax.Array,                # [B, 3*Bq] (Bq == B unless partial)
    w_out: jax.Array,                # [Bq, B]
    key_bias: Optional[jax.Array],   # [n, S] f32 additive (None = no mask)
    *,
    n_heads: int,
    c_tile: Optional[int] = None,
    interpret: bool = False,
    partial: bool = False,
) -> jax.Array:
    """Fused intra-chunk attention sublayer. Returns [M, n, S, B].

    ``c_tile``: chunks per grid step (None = 1; raced by the probe as
    ``ct<val>`` variants — larger tiles amortize per-step overhead at the
    cost of a bigger kernel body and working set).

    ``partial=True``: the weights are a tensor-parallel head-group shard
    (``w_qkv [B, 3*Bq]`` / ``w_out [Bq, B]`` with ``n_heads`` the LOCAL
    head count); the kernel returns the output projection only — no
    residual — for the caller to ``psum`` over the model axis and add to
    ``x`` once (``parallel/dpt_tp.py``).
    """
    M, n, S, B = x.shape
    Bq = w_qkv.shape[1] // 3
    if Bq % n_heads:
        raise ValueError(f"n_heads {n_heads} must divide qkv width {Bq}")
    if w_out.shape != (Bq, B):
        raise ValueError(f"w_out {w_out.shape} != ({Bq}, {B})")
    ct = int(c_tile) if c_tile else 1
    if n % ct:
        raise ValueError(f"c_tile {ct} must divide n_chunks {n}")
    cdtype = x.dtype
    aff = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)])
    if key_bias is None:
        key_bias = jnp.zeros((n, S), jnp.float32)
    flops = (2 * M * n * S * B * 3 * Bq         # qkv
             + 2 * M * n * S * Bq * B           # out proj
             + 4 * M * n * S * S * Bq)          # scores + mix
    out = pl.pallas_call(
        functools.partial(_intra_kernel, n_heads=n_heads, partial=partial),
        grid=(M, n // ct),
        in_specs=[
            pl.BlockSpec((1, ct, S, B), lambda m, c: (m, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3 * Bq), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, B), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 1, S), lambda m, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ct, S, B), lambda m, c: (m, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (M, n, S, B), cdtype, vma=_out_vma(x, w_qkv, w_out)),
        scratch_shapes=[pltpu.VMEM((ct, Bq, S), cdtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * M * n * S * B * jnp.dtype(cdtype).itemsize
                            + 4 * B * Bq * jnp.dtype(cdtype).itemsize),
            transcendentals=M * n * n_heads * S * S),
        # same rationale as the other fused kernels: keep XLA's memory-
        # space assignment from homing the output in VMEM next to the
        # kernel's working set and OOMing the compile
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w_qkv.astype(cdtype), w_out.astype(cdtype), aff,
      key_bias.astype(jnp.float32).reshape(n, 1, S))
    return out


def xla_intra_attention(x, gamma, beta, w_qkv, w_out, key_bias, *,
                        n_heads: int, partial: bool = False) -> jax.Array:
    """The same sublayer through plain XLA ops — mirrors
    ``models/dual_path._AttentionSublayer`` with ``attend_axis=2`` (kept
    in sync by ``tests/test_dpt_pallas.py``); the probe's numerics
    reference and timing baseline. ``partial``: head-group weight shard,
    projection only (same contract as ``fused_intra_attention``)."""
    M, n, S, B = x.shape
    h = n_heads
    Bq = w_qkv.shape[1] // 3
    d = Bq // h
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + _EPS)
         * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    y = y.astype(x.dtype)
    qkv = y @ w_qkv.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(M, n, S, h, d)
    kh = k.reshape(M, n, S, h, d)
    vh = v.reshape(M, n, S, h, d)
    logits = jnp.einsum("mnqhd,mnkhd->mnhqk", qh, kh)
    logits = logits.astype(jnp.float32) / np.sqrt(d)
    if key_bias is not None:
        logits = logits + key_bias[None, :, None, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    a = jnp.einsum("mnhqk,mnkhd->mnqhd", w, vh).reshape(M, n, S, Bq)
    proj = a @ w_out.astype(x.dtype)
    return proj if partial else x + proj


# --------------------------------------------------------------------------
# Fused backward (training path): recompute-in-VMEM, single kernel.
# --------------------------------------------------------------------------

def _intra_bwd_kernel(x_ref, g_ref, wqkv_ref, wout_ref, aff_ref, bias_ref,
                      dx_ref, dwqkv_ref, dwout_ref, dgb_ref,
                      at_ref, dqkv_t_ref, *, n_heads: int,
                      partial: bool = False):
    """Backward of ``_intra_kernel`` for one (batch row, chunk tile).

    ``x`` is the only residual: the forward intermediates (LN, QKV,
    per-chunk softmax, mix) are recomputed in VMEM, then every cotangent
    — dx and the weight/affine grads — is emitted in the same pass.
    Weight grads accumulate across the sequential grid into
    constant-index f32 output blocks (initialized at the first step),
    the same discipline as ``dpt_attention._inter_bwd_kernel``.

    dx_ref:     [1, ct, S, B]; dwqkv_ref: [B, 3*Bq] f32; dwout_ref:
    [Bq, B] f32; dgb_ref: [2, B] f32 (dgamma, dbeta).
    at_ref:     [ct, Bq, S] cdtype scratch (recomputed attention output);
    dqkv_t_ref: [ct, 3*Bq, S] cdtype scratch (dq|dk|dv, transposed
    layout).

    ``partial=True`` is the backward of the ``partial`` forward
    (projection-only, head-group weight shard): ``dx`` omits the residual
    passthrough term.
    """
    _, ct, S, B = x_ref.shape
    Bq = wqkv_ref.shape[1] // 3
    h = n_heads
    d = Bq // h
    cdtype = x_ref.dtype

    # ---- recompute the forward intermediates ----
    xf = x_ref[0].astype(jnp.float32)                       # [ct, S, B]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mean) * r                                  # f32
    gam = aff_ref[0:1, :].reshape(1, 1, B)
    y = (xhat * gam + aff_ref[1:2, :].reshape(1, 1, B)).astype(cdtype)
    y2 = y.reshape(ct * S, B)
    qkv = jnp.dot(y2, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(cdtype)
    qkv = qkv.reshape(ct, S, 3 * Bq)
    q = jnp.swapaxes(qkv[:, :, 0 * Bq:1 * Bq], 1, 2)        # [ct, Bq, S]
    k = jnp.swapaxes(qkv[:, :, 1 * Bq:2 * Bq], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2 * Bq:3 * Bq], 1, 2)

    # dA = g @ Wout^T, in the transposed per-chunk layout
    gt = g_ref[0]                                           # [ct, S, B]
    g2 = gt.reshape(ct * S, B)
    dA = jax.lax.dot_general(
        g2, wout_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdtype)
    dA_t = jnp.swapaxes(dA.reshape(ct, S, Bq), 1, 2)        # [ct, Bq, S]

    scale = 1.0 / float(np.sqrt(d))
    for c in range(ct):
        bias_c = bias_ref[c].reshape(1, S)
        for i in range(h):
            q_i = q[c:c + 1, i * d:(i + 1) * d, :].reshape(d, S)
            k_i = k[c:c + 1, i * d:(i + 1) * d, :].reshape(d, S)
            v_i = v[c:c + 1, i * d:(i + 1) * d, :].reshape(d, S)
            dA_i = dA_t[c:c + 1, i * d:(i + 1) * d, :].reshape(d, S)
            # recompute the softmax
            s = jax.lax.dot_general(
                q_i, k_i, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [S, S]
            s = s * scale + bias_c
            m_ = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m_)
            p = e / jnp.sum(e, axis=-1, keepdims=True)      # f32 [Sq, Sk]
            pc = p.astype(cdtype)
            # attention output (for dWout)
            at_ref[c, i * d:(i + 1) * d, :] = jax.lax.dot_general(
                v_i, pc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdtype)
            # dp[q, k] = sum_d dA_i[d, q] v_i[d, k]
            dp = jax.lax.dot_general(
                dA_i, v_i, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [Sq, Sk]
            # dv[d, k] = sum_q dA_i[d, q] p[q, k]
            dqkv_t_ref[c, 2 * Bq + i * d:2 * Bq + (i + 1) * d, :] = (
                jax.lax.dot_general(
                    dA_i, pc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdtype))
            # softmax backward (score scale folded in once)
            rowsum = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = ((p * (dp - rowsum)) * scale).astype(cdtype)
            # dq[d, q] = sum_k k_i[d, k] ds[q, k]
            dqkv_t_ref[c, 0 * Bq + i * d:0 * Bq + (i + 1) * d, :] = (
                jax.lax.dot_general(
                    k_i, ds, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdtype))
            # dk[d, k] = sum_q q_i[d, q] ds[q, k]
            dqkv_t_ref[c, 1 * Bq + i * d:1 * Bq + (i + 1) * d, :] = (
                jax.lax.dot_general(
                    q_i, ds, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdtype))

    a2 = jnp.swapaxes(at_ref[:], 1, 2).reshape(ct * S, Bq)
    dwout_acc = jax.lax.dot_general(
        a2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [Bq, B]
    dqkv2 = jnp.swapaxes(dqkv_t_ref[:], 1, 2).reshape(ct * S, 3 * Bq)
    dwqkv_acc = jax.lax.dot_general(
        y2, dqkv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [B, 3Bq]
    dy = jax.lax.dot_general(
        dqkv2, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [ct*S, B] f32
    # LN backward (f32 statistics)
    xhat2 = xhat.reshape(ct * S, B)
    dgamma = jnp.sum(dy * xhat2, axis=0, keepdims=True)     # [1, B]
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy.reshape(ct, S, B) * gam
    mean_d = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_xd = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = r * (dxhat - mean_d - xhat * mean_xd)
    if partial:  # no residual passthrough in the partial forward
        dx_ref[0] = dx_ln.astype(cdtype)
    else:
        dx_ref[0] = (gt.astype(jnp.float32) + dx_ln).astype(cdtype)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    dgb = jnp.concatenate([dgamma, dbeta], axis=0)          # [2, B]

    @pl.when(first)
    def _():
        dwqkv_ref[:] = dwqkv_acc
        dwout_ref[:] = dwout_acc
        dgb_ref[:] = dgb

    @pl.when(jnp.logical_not(first))
    def _():
        dwqkv_ref[:] = dwqkv_ref[:] + dwqkv_acc
        dwout_ref[:] = dwout_ref[:] + dwout_acc
        dgb_ref[:] = dgb_ref[:] + dgb


def fused_intra_attention_bwd(
    x: jax.Array,                    # [M, n, S, B]
    g: jax.Array,                    # [M, n, S, B] cotangent of the output
    gamma: jax.Array, beta: jax.Array,
    w_qkv: jax.Array, w_out: jax.Array,
    key_bias: Optional[jax.Array],
    *,
    n_heads: int,
    c_tile: Optional[int] = None,
    interpret: bool = False,
    partial: bool = False,
):
    """Single-kernel backward of the fused intra sublayer. Returns
    ``(dx, dgamma, dbeta, dw_qkv, dw_out)`` in the primals' dtypes.
    ``partial``: backward of the partial (head-group shard) forward."""
    M, n, S, B = x.shape
    Bq = w_qkv.shape[1] // 3
    ct = int(c_tile) if c_tile else 1
    cdtype = x.dtype
    aff = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)])
    if key_bias is None:
        key_bias = jnp.zeros((n, S), jnp.float32)
    flops = (2 * M * n * S * B * 3 * Bq * 3     # qkv fwd + dWqkv + dy
             + 2 * M * n * S * Bq * B * 3       # out fwd + dWout + dA
             + 4 * M * n * S * S * Bq * 3)      # attention fwd + bwd
    dx, dwqkv, dwout, dgb = pl.pallas_call(
        functools.partial(_intra_bwd_kernel, n_heads=n_heads,
                          partial=partial),
        grid=(M, n // ct),
        in_specs=[
            pl.BlockSpec((1, ct, S, B), lambda m, c: (m, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, S, B), lambda m, c: (m, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3 * Bq), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, B), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 1, S), lambda m, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ct, S, B), lambda m, c: (m, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3 * Bq), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, B), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(sh, dt_, vma=_out_vma(x, g, w_qkv,
                                                       w_out))
            for sh, dt_ in (((M, n, S, B), cdtype),
                            ((B, 3 * Bq), jnp.float32),
                            ((Bq, B), jnp.float32),
                            ((2, B), jnp.float32))),
        scratch_shapes=[
            pltpu.VMEM((ct, Bq, S), cdtype),
            pltpu.VMEM((ct, 3 * Bq, S), cdtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * M * n * S * B * jnp.dtype(cdtype).itemsize,
            transcendentals=M * n * n_heads * S * S),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, g, w_qkv.astype(cdtype), w_out.astype(cdtype), aff,
      key_bias.astype(jnp.float32).reshape(n, 1, S))
    return (dx, dgb[0].astype(gamma.dtype), dgb[1].astype(beta.dtype),
            dwqkv.astype(w_qkv.dtype), dwout.astype(w_out.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_intra_ad(static, x, gamma, beta, w_qkv, w_out, key_bias):
    n_heads, c_tile, _, interpret, partial = static
    return fused_intra_attention(x, gamma, beta, w_qkv, w_out, key_bias,
                                 n_heads=n_heads, c_tile=c_tile,
                                 interpret=interpret, partial=partial)


def _fused_intra_fwd(static, *args):
    # Residuals are just the primals: the backward rematerializes the
    # intermediates in VMEM (jax.checkpoint semantics).
    return _fused_intra_ad(static, *args), args


def _fused_intra_bwd(static, residuals, g):
    n_heads, c_tile, bwd, interpret, partial = static
    if bwd:
        x, gamma, beta, w_qkv, w_out, key_bias = residuals
        dx, dgamma, dbeta, dwqkv, dwout = fused_intra_attention_bwd(
            x, g, gamma, beta, w_qkv, w_out, key_bias,
            n_heads=n_heads, c_tile=c_tile, interpret=interpret,
            partial=partial)
        return dx, dgamma, dbeta, dwqkv, dwout, jnp.zeros_like(residuals[5])
    _, vjp = jax.vjp(
        lambda *a: xla_intra_attention(*a, n_heads=n_heads,
                                       partial=partial), *residuals)
    return vjp(g)


_fused_intra_ad.defvjp(_fused_intra_fwd, _fused_intra_bwd)


def fused_intra_attention_ad(
    x, gamma, beta, w_qkv, w_out, key_bias, *,
    n_heads: int,
    c_tile: Optional[int] = None,
    bwd: bool = True,
    interpret: bool = False,
    partial: bool = False,
):
    """Differentiable fused intra sublayer: Pallas forward + selectable
    backward — the single-kernel fused backward (``bwd=True``) or XLA
    rematerialize-and-autodiff (``bwd=False``). Safe under ``jax.grad``;
    use ``fused_intra_train_ready`` to pick it safely on a real backend.
    ``partial``: tensor-parallel head-group shard (see
    ``fused_intra_attention``)."""
    if key_bias is None:
        M, n, S, B = x.shape
        key_bias = jnp.zeros((n, S), jnp.float32)
    static = (n_heads, c_tile, bool(bwd), interpret, bool(partial))
    return _fused_intra_ad(static, x, gamma, beta, w_qkv, w_out, key_bias)


# --------------------------------------------------------------------------
# Probe / autotune registry (same discipline as dpt_attention's).
# --------------------------------------------------------------------------

# (M, n, S, B, n_heads, dtype-str) -> c_tile int (use fused) | None (XLA
# wins). M (batch) is part of the key: whether engaging the fused sublayer
# helps the FULL model is batch-dependent (the custom call is a fusion
# barrier whose cost shrinks relative to the saved HBM traffic as M grows),
# so winners raced at one batch must not be trusted at another.
_INTRA_READY: dict = {}
_INTRA_PROBED: set = set()
# (M, S, B, n_heads, dtype-str) -> first raced winner; later shapes of the
# same config only compile+numerics-verify it instead of re-racing
_INTRA_CONFIG_WINNERS: dict = {}
# same key as _INTRA_READY -> fastest numerics-passing fused c_tile even
# when XLA won the isolated race — the in-model validator's promotion
# candidate (dpt_inmodel: the isolated race can mispredict full-model cost
# in either direction)
_INTRA_BEST_FUSED: dict = {}


def fused_intra_ready(M: int, n: int, S: int, B: int, n_heads: int, dtype,
                      interpret: bool):
    """Trace-time gate. Returns a ``c_tile`` (or "auto" in interpret mode)
    when the fused kernel may engage for this shape, else None. On a real
    backend a shape is only enabled after ``probe_fused_intra`` compiled,
    numerics-checked AND raced it at this batch."""
    if interpret:
        return "auto"
    return _INTRA_READY.get((M, n, S, B, n_heads, str(jnp.dtype(dtype))))


def probe_fused_intra(
    *,
    M: int,
    n: int,
    S: int,
    B: int,
    n_heads: int,
    dtype=jnp.bfloat16,
    retries: int = 2,
    verbose: bool = False,
    interpret: bool = False,
    autotune: bool = True,
    check_numerics: Optional[bool] = None,
    only_tile: Optional[int] = None,
):
    """AOT-compile, numerics-gate, and race the fused intra-attention
    kernel against the XLA sublayer at one concrete shape. Records the
    winning ``c_tile`` (or None = XLA) in the registry and returns it."""
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _numerics_tol,
        _race,
        _verify_numerics,
    )

    if check_numerics is None:
        check_numerics = not interpret

    key = (M, n, S, B, n_heads, str(jnp.dtype(dtype)))
    # on-device probe arrays (host->device = one PRNG key; relay bandwidth)
    from convtasnet_tpu.ops.pallas.tcn_block import _probe_inputs

    x, w_qkv, w_out = _probe_inputs(
        [((M, n, S, B), 1.0), ((B, 3 * B), 1.0 / np.sqrt(B)),
         ((B, B), 1.0 / np.sqrt(B))], dtype)
    gamma = jnp.ones((B,), jnp.float32)
    beta = jnp.zeros((B,), jnp.float32)
    valid = np.ones((n, S), bool)
    valid[-1, S // 2:] = False
    bias = jnp.asarray(np.where(valid, 0.0, NEG_INF), jnp.float32)
    wargs = (gamma, beta, w_qkv, w_out, bias)

    def xla_fn(xx):
        return xla_intra_attention(xx, *wargs, n_heads=n_heads)

    tiles = [int(only_tile)] if only_tile is not None else _chunk_tiles(n)
    compiled, aot = {}, {}
    for ct in tiles:
        name = f"ct{ct}"
        fn = functools.partial(fused_intra_attention, n_heads=n_heads,
                               c_tile=ct, interpret=interpret)
        err = None
        for _ in range(retries + 1):
            try:
                aot[name] = jax.jit(fn).lower(x, *wargs).compile()
                compiled[name] = (lambda xx, _fn=fn: _fn(xx, *wargs))
                err = None
                break
            except Exception as e:  # noqa: BLE001 — any compile failure
                err = e
        if err is not None and verbose:
            import sys as _sys

            print(f"dpt intra probe {key}: ct{ct} compile failed "
                  f"({type(err).__name__})", file=_sys.stderr)
    if compiled and check_numerics:
        tol = _numerics_tol(dtype)
        ok, errs, verified = _verify_numerics(
            {nm: (lambda _e=aot[nm]: _e(x, *wargs)) for nm in compiled},
            lambda: jax.jit(xla_fn)(x), tol)
        if verbose:
            import sys as _sys

            if verified:
                detail = " ".join(f"{k_}={errs[k_]:.2e}"
                                  for k_ in sorted(errs))
                print(f"dpt intra probe {key}: numerics vs xla "
                      f"(tol {tol:g}): {detail}", file=_sys.stderr)
            else:
                print(f"dpt intra probe {key}: numerics UNVERIFIED "
                      f"(xla reference failed)", file=_sys.stderr)
            for nm in sorted(set(compiled) - ok):
                print(f"dpt intra probe {key} {nm}: REJECTED on numerics "
                      f"(rel err {errs[nm]:.2e})", file=_sys.stderr)
        compiled = {nm: f for nm, f in compiled.items() if nm in ok}
    if not compiled:
        best = None
    elif autotune and not interpret:
        best, timed = _race(compiled, xla_fn, x, inner=100)
        fused_times = {nm: t for nm, t in timed.items() if nm != "xla"}
        if fused_times:
            _INTRA_BEST_FUSED[key] = int(
                min(fused_times, key=fused_times.get)[2:])
        if verbose:
            import sys as _sys

            detail = " ".join(f"{k_}={v * 1e3:.3f}ms"
                              for k_, v in sorted(timed.items()))
            print(f"dpt intra probe {key}: best={best or 'xla'} ({detail})",
                  file=_sys.stderr)
    else:
        best = next(iter(compiled))
    win = int(best[2:]) if best else None
    _INTRA_READY[key] = win
    return win


# (M, n, S, B, n_heads, dtype-str) -> True (fused pair) | None (autodiff)
_INTRA_BWD_READY: dict = {}
_INTRA_BWD_CONFIG: dict = {}


def fused_intra_train_ready(M: int, n: int, S: int, B: int, n_heads: int,
                            dtype, interpret: bool):
    """Trace-time gate for the fused train pair (Pallas forward + fused
    single-kernel backward). True when this shape's pair compiled, won the
    on-device race against XLA autodiff AND reproduced all five autodiff
    cotangents; None keeps plain autodiff. Interpret mode returns True
    (correctness testing)."""
    if interpret:
        return True
    return _INTRA_BWD_READY.get((M, n, S, B, n_heads, str(jnp.dtype(dtype))))


def probe_fused_intra_train(
    *,
    M: int,
    n: int,
    S: int,
    B: int,
    n_heads: int,
    dtype=jnp.bfloat16,
    retries: int = 2,
    verbose: bool = False,
    interpret: bool = False,
    autotune: bool = True,
    check_numerics: Optional[bool] = None,
    verify_only: bool = False,
):
    """AOT-compile and race the TRAINING path at one shape: full
    forward+backward through (a) XLA autodiff of the sublayer vs (b) the
    fused Pallas forward + fused single-kernel backward. A fused winner
    must also reproduce ALL five autodiff cotangents on-device before it
    is recorded — a fast-but-wrong backward would silently corrupt
    training. Records True/None in ``_INTRA_BWD_READY`` and returns it."""
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _numerics_tol,
        _race,
    )

    if check_numerics is None:
        check_numerics = not interpret

    key = (M, n, S, B, n_heads, str(jnp.dtype(dtype)))
    if verify_only and _INTRA_BWD_READY.get(key) is None:
        return None
    from convtasnet_tpu.ops.pallas.tcn_block import _probe_inputs

    x, w_qkv, w_out = _probe_inputs(
        [((M, n, S, B), 1.0), ((B, 3 * B), 1.0 / np.sqrt(B)),
         ((B, B), 1.0 / np.sqrt(B))], dtype)
    gamma = jnp.ones((B,), jnp.float32)
    beta = jnp.zeros((B,), jnp.float32)
    valid = np.ones((n, S), bool)
    valid[-1, S // 2:] = False
    bias = jnp.asarray(np.where(valid, 0.0, NEG_INF), jnp.float32)
    wargs = (gamma, beta, w_qkv, w_out)
    ct = _INTRA_READY.get(key) or 1

    def grad_fn(sublayer):
        """x -> dx with all five input cotangents computed."""

        def f(xx):
            def loss(*a):
                return jnp.sum(sublayer(*a).astype(jnp.float32))

            grads = jax.grad(loss, argnums=tuple(range(5)))(xx, *wargs)
            return grads[0].astype(xx.dtype)

        return f

    def fused(xx, *a):
        return fused_intra_attention_ad(xx, *a, bias, n_heads=n_heads,
                                        c_tile=ct, bwd=True,
                                        interpret=interpret)

    def xla(xx, *a):
        return xla_intra_attention(xx, *a, bias, n_heads=n_heads)

    fn = grad_fn(fused)
    err = None
    for _ in range(retries + 1):
        try:
            jax.jit(fn).lower(x).compile()
            err = None
            break
        except Exception as e:  # noqa: BLE001 — any compile failure
            err = e
    if err is not None:
        if verbose:
            import sys as _sys

            print(f"dpt intra train probe {key}: compile failed "
                  f"({type(err).__name__})", file=_sys.stderr)
        _INTRA_BWD_READY[key] = None
        return None
    if verify_only:
        best = True
    elif autotune and not interpret:
        best_name, timed = _race({"fused": fn}, grad_fn(xla), x, inner=30)
        best = best_name is not None
        if verbose:
            import sys as _sys

            detail = " ".join(f"{k_}={v * 1e3:.3f}ms"
                              for k_, v in sorted(timed.items()))
            print(f"dpt intra train probe {key}: best="
                  f"{'fused' if best else 'xla'} ({detail})",
                  file=_sys.stderr)
    else:
        best = True
    if best and check_numerics:
        tol = 2 * _numerics_tol(dtype)

        def full_grads(sublayer):
            def f(xx):
                def loss(*a):
                    return jnp.sum(sublayer(*a).astype(jnp.float32))

                return jax.grad(loss, argnums=tuple(range(5)))(xx, *wargs)

            return f

        from convtasnet_tpu.ops.pallas.tcn_block import _rel_err_device

        try:
            ref = jax.jit(full_grads(xla))(x)  # stays on device
            got = jax.jit(full_grads(fused))(x)
            merr = float(jax.device_get(_rel_err_device(got, ref)))
            ok = merr <= tol
        except Exception:  # noqa: BLE001 — reference failed: cannot verify
            ok, merr = True, float("nan")
        if verbose:
            import sys as _sys

            state = "ok" if ok else "REJECTED"
            print(f"dpt intra train probe {key}: grads numerics vs "
                  f"autodiff (tol {tol:g}): max rel err {merr:.2e} "
                  f"[{state}]", file=_sys.stderr)
        if not ok:
            best = False
    win = True if best else None
    _INTRA_BWD_READY[key] = win
    return win


def ensure_probed_dpt_intra_train(cfg, batch: int, T: int,
                                  verbose: bool = True) -> None:
    """Probe the fused intra train pair for a concrete [batch, T] shape
    (idempotent per shape; no-op on CPU). Probes the inference forward
    first (the train pair reuses its c_tile winner); winners persist in
    the shared autotune cache under ``dpt:intra-train:`` keys."""
    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "dpt"):
        return
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
    )

    K = (T - cfg.kernel_size) // cfg.stride + 1
    S = cfg.dpt_chunk
    n = -(-K // S)
    B = cfg.bottleneck
    h = cfg.dpt_num_heads
    dt = str(jnp.dtype(cfg.compute_dtype))
    key = (batch, n, S, B, h, dt)
    shape_key = ("dpt-intra-train",) + key
    if shape_key in _INTRA_PROBED:
        return
    if probe_budget.exhausted():
        if verbose:
            import sys as _sys

            print("dpt intra train probe: probe budget exhausted -> xla this run "
                  "(undecided at this shape)", file=_sys.stderr)
        return
    ensure_probed_dpt_intra(cfg, batch, T, verbose=verbose)
    disk_key = "dpt:intra-train:" + ":".join(str(v) for v in shape_key[1:])
    cached = _autotune_cache_load().get(disk_key)  # truthy: {} re-probes
    kw = dict(M=batch, n=n, S=S, B=B, n_heads=h,
              dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose)
    if cached:
        win = cached.get("train")
        _INTRA_BWD_READY[key] = True if win else None
        _INTRA_PROBED.add(shape_key)
        if verbose:
            import sys as _sys

            print(f"dpt intra train probe: autotune winner loaded from "
                  f"disk ({disk_key} -> {win})", file=_sys.stderr)
        if win:
            probe_fused_intra_train(verify_only=True, autotune=False,
                                    check_numerics=False, **kw)
        return
    cfg_key = (batch, S, B, h, dt)
    if cfg_key in _INTRA_BWD_CONFIG:
        # config already raced at another shape: skip the timing race but
        # keep the compile + cotangent-numerics gate at THIS shape
        if _INTRA_BWD_CONFIG[cfg_key] is None:
            _INTRA_BWD_READY[key] = None
            win = None
        else:
            win = probe_fused_intra_train(autotune=False, **kw)
    else:
        win = probe_fused_intra_train(**kw)
        if win is not None or not probe_budget.exhausted():
            _INTRA_BWD_CONFIG[cfg_key] = win
    if win is None and probe_budget.exhausted():
        return  # budget-cut race is not evidence: don't persist/memoize
    _autotune_cache_store(disk_key, {"train": bool(win) if win else None})
    _INTRA_PROBED.add(shape_key)


def ensure_probed_dpt_intra(cfg, batch: int, T: int,
                            verbose: bool = True) -> None:
    """Probe the fused intra-attention kernel for a concrete [batch, T]
    input to a dual-path config (idempotent per shape; no-op on CPU).
    Winners persist in the shared autotune cache (``dpt:intra:`` keys)."""
    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "dpt"):
        return
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
    )

    K = (T - cfg.kernel_size) // cfg.stride + 1
    S = cfg.dpt_chunk
    n = -(-K // S)
    B = cfg.bottleneck
    h = cfg.dpt_num_heads
    dt = str(jnp.dtype(cfg.compute_dtype))
    key = (batch, n, S, B, h, dt)
    cfg_key = (batch, S, B, h, dt)
    shape_key = ("dpt-intra",) + key
    if shape_key in _INTRA_PROBED:
        return
    if probe_budget.exhausted():
        if verbose:
            import sys as _sys

            print("dpt intra probe: probe budget exhausted -> xla this run "
                  "(undecided at this shape)", file=_sys.stderr)
        return
    disk_key = "dpt:intra:" + ":".join(str(v) for v in shape_key[1:])
    cached = _autotune_cache_load().get(disk_key)  # truthy: {} re-probes
    if cached:
        win = cached.get("intra")
        _INTRA_READY[key] = int(win) if win is not None else None
        bf = cached.get("best_fused")
        if bf is not None:  # rehydrate the in-model promotion candidate
            _INTRA_BEST_FUSED[key] = int(bf)
        _INTRA_CONFIG_WINNERS.setdefault(cfg_key, _INTRA_READY[key])
        _INTRA_PROBED.add(shape_key)
        if verbose:
            import sys as _sys

            print(f"dpt intra probe: autotune winner loaded from disk "
                  f"({disk_key} -> {win})", file=_sys.stderr)
        if win is not None:
            probe_fused_intra(
                M=batch, n=n, S=S, B=B, n_heads=h,
                dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose,
                autotune=False, check_numerics=False,
                only_tile=int(win))
        return
    kw = dict(M=batch, n=n, S=S, B=B, n_heads=h,
              dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose)
    if cfg_key in _INTRA_CONFIG_WINNERS:
        # config already raced at another shape: trust its winner but
        # prove the compile + numerics at THIS shape
        prev = _INTRA_CONFIG_WINNERS[cfg_key]
        if prev is None:
            _INTRA_READY[key] = None
            win = None
        else:
            # a different n may not divide by the previous tile
            ot = int(prev) if n % int(prev) == 0 else 1
            win = probe_fused_intra(autotune=False, only_tile=ot, **kw)
    else:
        win = probe_fused_intra(**kw)
        if win is not None or not probe_budget.exhausted():
            _INTRA_CONFIG_WINNERS[cfg_key] = win
    if win is None and probe_budget.exhausted():
        return  # budget-cut race is not evidence: don't persist/memoize
    _autotune_cache_store(disk_key, {"intra": win,
                                     "best_fused": _INTRA_BEST_FUSED.get(key)})
    _INTRA_PROBED.add(shape_key)
