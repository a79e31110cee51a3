"""Fused dual-path inter-chunk attention sublayer (Pallas/Mosaic).

The dual-path separator's quality-default shape (head-dim 32, chunk 128)
spends most of its forward in the *inter*-chunk attention sublayers: the
chunk axis ``n`` is tiny (~25 for 4 s at 8 kHz), so XLA lowers the per-
(position, head) ``[n, d] x [d, n]`` score/mix einsums to thousands of
sliver matmuls plus 5-6 full-tensor layout copies per sublayer (HLO
inspection, docs/RESULTS.md). This kernel fuses the whole sublayer —
pre-LN, QKV projection, attention over chunks, output projection,
residual — into one VMEM-resident pass per (batch row, position tile):

- the QKV / output projections run as two large MXU matmuls in the
  natural ``[n*S_tile, B]`` layout (that part XLA also gets right);
- the tiny attention contractions run on the VPU instead: chunks in
  sublanes, positions in lanes, one multiply+reduce per key chunk —
  a ``[n, B, S]`` elementwise op, fully lane-filled, no sliver matmuls;
- everything between first read and final write stays in VMEM, so the
  5-6 HBM-round-trip layout copies disappear.

Same probe discipline as the TCN kernels (``tcn_block.py``): candidates
AOT-compile, are numerics-gated against the XLA sublayer on-device, then
race it on time; winners persist in the shared autotune cache. An
unprobed / losing / non-compiling shape keeps the XLA path — the fused
kernel can make the model faster, never break it.

Reference parity: this computes exactly
``models/dual_path._AttentionSublayer`` with ``attend_axis=1`` (itself a
TPU-native capability extension; the reference ships only the TCN
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

NEG_INF = -1e9
_EPS = 1e-6


def _out_vma(*args):
    """Varying-mesh-axes set for ``pallas_call`` outputs when tracing
    inside a vma-checked ``shard_map`` (the TP train step): outputs vary
    over the union of the inputs' varying axes. Returns None outside such
    contexts (plain jit / eager / ``check_vma=False`` shard_maps), which
    keeps the default behavior."""
    try:
        s = frozenset().union(*(jax.typeof(a).vma for a in args))
        return s if s else None
    except Exception:  # noqa: BLE001 — older tracers without vma
        return None


def _inter_kernel(x_ref, wqkv_ref, wout_ref, aff_ref, bias_ref, o_ref,
                  scores_ref, *, n_heads: int, partial: bool = False):
    """One (batch row, position tile): fused pre-LN + MHA over chunks.

    x_ref:      [1, n, st, B]  input block (residual source)
    wqkv_ref:   [B, 3*Bq]      QKV projection (Bq == B unless the weights
                               are a tensor-parallel head-group shard)
    wout_ref:   [Bq, B]        output projection
    aff_ref:    [2, B] f32     LN gamma / beta
    bias_ref:   [1, n, st] f32 additive key bias (0 valid / -1e9 pad),
                               position-tiled on its leading axis
    o_ref:      [1, n, st, B]  output block
    scores_ref: [n, n, h, st] f32 scratch — logits/weights, chunk x chunk

    ``partial=True`` emits the output projection ONLY (no residual add):
    the tensor-parallel caller psums partial projections over the model
    axis and adds the residual once (Megatron g-operator, see
    ``parallel/dpt_tp.py``).
    """
    _, n, st, B = x_ref.shape
    Bq = wqkv_ref.shape[1] // 3     # local attention width (heads on shard)
    h = n_heads
    d = Bq // h
    cdtype = x_ref.dtype

    # pre-LN over channels (f32 statistics, same as models/dual_path)
    xf = x_ref[0].astype(jnp.float32)                       # [n, st, B]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    g = aff_ref[0:1, :].reshape(1, 1, B)
    b = aff_ref[1:2, :].reshape(1, 1, B)
    y = ((xf - mean) * jax.lax.rsqrt(var + _EPS) * g + b).astype(cdtype)

    # QKV: one [n*st, B] x [B, 3B] MXU matmul. Mosaic requires a 32-bit
    # accumulator; the cast back to compute dtype right after matches the
    # XLA Dense semantics (f32 accumulate, round once).
    qkv = jnp.dot(y.reshape(n * st, B), wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(cdtype)
    qkv = qkv.reshape(n, st, 3 * Bq)
    # transpose to [n, Bq, st]: chunk axis leading, positions in lanes —
    # the attention reductions below are then fully lane-filled VPU ops
    q = jnp.swapaxes(qkv[:, :, 0 * Bq:1 * Bq], 1, 2)
    k = jnp.swapaxes(qkv[:, :, 1 * Bq:2 * Bq], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2 * Bq:3 * Bq], 1, 2)

    # scores[q, k, h, st] = sum_d qh . kh  (f32), one key chunk at a time:
    # [n, Bq, st] multiply + per-head sublane reduction — no sliver matmuls
    scale = 1.0 / float(np.sqrt(d))
    for kk in range(n):
        k_kk = jax.lax.slice_in_dim(k, kk, kk + 1, axis=0)  # [1, Bq, st]
        prod = (q * k_kk).astype(jnp.float32)               # [n, Bq, st]
        sc = jnp.sum(prod.reshape(n, h, d, st), axis=2)     # [n, h, st]
        bias_k = bias_ref[0, kk:kk + 1, :].reshape(1, 1, st)
        scores_ref[:, kk] = sc * scale + bias_k

    sc = scores_ref[:]                                      # [n, n, h, st]
    m_ = jnp.max(sc, axis=1, keepdims=True)
    e = jnp.exp(sc - m_)
    w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(cdtype)

    # mix: acc[q, h, d, st] = sum_k w[q, k, h, st] * v[k, h, d, st]
    acc = jnp.zeros((n, h, d, st), jnp.float32)
    for kk in range(n):
        w_kk = jax.lax.slice_in_dim(w, kk, kk + 1, axis=1)  # [n, 1, h, st]
        v_kk = jax.lax.slice_in_dim(v, kk, kk + 1, axis=0)  # [1, Bq, st]
        acc = acc + (w_kk.reshape(n, h, 1, st).astype(jnp.float32)
                     * v_kk.reshape(1, h, d, st).astype(jnp.float32))

    a = jnp.swapaxes(acc.reshape(n, Bq, st).astype(cdtype), 1, 2)
    out = jnp.dot(a.reshape(n * st, Bq), wout_ref[:],
                  preferred_element_type=jnp.float32).astype(cdtype)
    if partial:
        o_ref[0] = out.reshape(n, st, B)
    else:
        o_ref[0] = x_ref[0] + out.reshape(n, st, B)


def _pick_s_tile(n: int, S: int, n_heads: int) -> int:
    """Largest position tile whose f32 score scratch stays under ~6 MB.

    Never splits below 128 lanes: Mosaic's sublane-group reductions (the
    per-head score sums) crash the backend compiler on sub-128-lane
    arrays (verified on v5e), so a chunk length that isn't a multiple of
    128 compiles only in interpret mode — on hardware the probe's compile
    failure degrades that shape to XLA."""
    st = S
    while (st % 2 == 0 and st // 2 >= 128
           and n * n * n_heads * st * 4 > 6 * 2 ** 20):
        st //= 2
    return st


def fused_inter_attention(
    x: jax.Array,                    # [M, n, S, B]
    gamma: jax.Array,                # [B] f32
    beta: jax.Array,                 # [B] f32
    w_qkv: jax.Array,                # [B, 3*Bq] (Bq == B unless partial)
    w_out: jax.Array,                # [Bq, B]
    key_bias: Optional[jax.Array],   # [n, S] f32 additive (None = no mask)
    *,
    n_heads: int,
    s_tile: Optional[int] = None,
    interpret: bool = False,
    partial: bool = False,
) -> jax.Array:
    """Fused inter-chunk attention sublayer. Returns [M, n, S, B].

    ``s_tile``: positions per grid step (None = auto; raced by the probe as
    ``st<val>`` variants — smaller tiles shrink the score scratch for long
    inputs at the cost of thinner projection matmuls).

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
    st = int(s_tile) if s_tile else _pick_s_tile(n, S, n_heads)
    if S % st:
        raise ValueError(f"s_tile {st} must divide chunk length {S}")
    cdtype = x.dtype
    aff = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)])
    if key_bias is None:
        key_bias = jnp.zeros((n, S), jnp.float32)
    # position-tile the bias on a leading axis ([S//st, n, st]) so its
    # block shape satisfies the Mosaic (sublane, lane) tiling constraint
    # for any tile size
    bias_t = jnp.transpose(
        key_bias.astype(jnp.float32).reshape(n, S // st, st), (1, 0, 2))
    flops = (2 * M * n * S * B * 3 * Bq         # qkv
             + 2 * M * n * S * Bq * B           # out proj
             + 4 * M * n * n * S * Bq)          # scores + mix
    out = pl.pallas_call(
        functools.partial(_inter_kernel, n_heads=n_heads, partial=partial),
        grid=(M, S // st),
        in_specs=[
            pl.BlockSpec((1, n, st, B), lambda m, s: (m, 0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3 * Bq), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, st), lambda m, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, st, B), lambda m, s: (m, 0, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (M, n, S, B), cdtype, vma=_out_vma(x, w_qkv, w_out)),
        scratch_shapes=[pltpu.VMEM((n, n, n_heads, st), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * M * n * S * B * jnp.dtype(cdtype).itemsize
                            + 4 * B * Bq * jnp.dtype(cdtype).itemsize),
            transcendentals=M * n * n * n_heads * S),
        # Same rationale as fused_tcn_block: keep XLA's memory-space
        # assignment from homing the [M, n, S, B] output in VMEM next to
        # the kernel's own working set (~12 MB) and OOMing the compile.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w_qkv.astype(cdtype), w_out.astype(cdtype), aff, bias_t)
    return out


def xla_inter_attention(x, gamma, beta, w_qkv, w_out, key_bias, *,
                        n_heads: int, partial: bool = False) -> jax.Array:
    """The same sublayer through plain XLA ops — mirrors
    ``models/dual_path._AttentionSublayer`` with ``attend_axis=1`` (kept in
    sync by ``tests/test_dpt_pallas.py``); the probe's numerics reference
    and timing baseline. ``partial``: head-group weight shard, projection
    only (same contract as ``fused_inter_attention``)."""
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
    logits = jnp.einsum("mqshd,mkshd->mshqk", qh, kh)
    logits = logits.astype(jnp.float32) / np.sqrt(d)
    if key_bias is not None:
        logits = logits + key_bias.T[None, :, None, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    a = jnp.einsum("mshqk,mkshd->mqshd", w, vh).reshape(M, n, S, Bq)
    proj = a @ w_out.astype(x.dtype)
    return proj if partial else x + proj


# --------------------------------------------------------------------------
# Fused backward (training path): recompute-in-VMEM, single kernel.
# --------------------------------------------------------------------------

def _inter_bwd_kernel(x_ref, g_ref, wqkv_ref, wout_ref, aff_ref, bias_ref,
                      dx_ref, dwqkv_ref, dwout_ref, dgb_ref,
                      p_ref, ds_ref, dqkv_t_ref, *, n_heads: int,
                      partial: bool = False):
    """Backward of ``_inter_kernel`` for one (batch row, position tile).

    ``x`` is the only residual: the forward intermediates (LN, QKV,
    softmax probabilities, mix) are recomputed in VMEM, then every
    cotangent — dx and the weight/affine grads — is emitted in the same
    pass. Weight grads accumulate across the sequential grid into
    constant-index f32 output blocks (initialized at the first step),
    the same discipline as ``tcn_block_bwd``.

    dx_ref:     [1, n, st, B]; dwqkv_ref: [B, 3*Bq] f32; dwout_ref:
    [Bq, B] f32; dgb_ref: [2, B] f32 (dgamma, dbeta).
    p_ref/ds_ref: [n, n, h, st] f32 scratch (probs / score cotangents);
    dqkv_t_ref: [n, 3*Bq, st] compute-dtype scratch (dq|dk|dv, transposed
    layout).

    ``partial=True`` is the backward of the ``partial`` forward
    (projection-only, head-group weight shard): ``dx`` omits the residual
    passthrough term.
    """
    _, n, st, B = x_ref.shape
    Bq = wqkv_ref.shape[1] // 3
    h = n_heads
    d = Bq // h
    cdtype = x_ref.dtype

    # ---- recompute the forward intermediates ----
    xf = x_ref[0].astype(jnp.float32)                       # [n, st, B]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mean) * r                                  # f32
    gam = aff_ref[0:1, :].reshape(1, 1, B)
    y = (xhat * gam + aff_ref[1:2, :].reshape(1, 1, B)).astype(cdtype)
    y2 = y.reshape(n * st, B)
    qkv = jnp.dot(y2, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(cdtype)
    qkv = qkv.reshape(n, st, 3 * Bq)
    q = jnp.swapaxes(qkv[:, :, 0 * Bq:1 * Bq], 1, 2)        # [n, Bq, st]
    k = jnp.swapaxes(qkv[:, :, 1 * Bq:2 * Bq], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2 * Bq:3 * Bq], 1, 2)
    scale = 1.0 / float(np.sqrt(d))
    for kk in range(n):
        k_kk = jax.lax.slice_in_dim(k, kk, kk + 1, axis=0)
        prod = (q * k_kk).astype(jnp.float32)
        sc = jnp.sum(prod.reshape(n, h, d, st), axis=2)
        bias_k = bias_ref[0, kk:kk + 1, :].reshape(1, 1, st)
        p_ref[:, kk] = sc * scale + bias_k
    sc = p_ref[:]                                           # [n, n, h, st]
    m_ = jnp.max(sc, axis=1, keepdims=True)
    e = jnp.exp(sc - m_)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    p_ref[:] = p
    pc = p.astype(cdtype)

    # ---- grads ----
    gt = g_ref[0]                                           # [n, st, B]
    g2 = gt.reshape(n * st, B)
    # dWout = A^T g, with A recomputed exactly like the forward mix
    acc = jnp.zeros((n, h, d, st), jnp.float32)
    for kk in range(n):
        w_kk = jax.lax.slice_in_dim(pc, kk, kk + 1, axis=1)
        v_kk = jax.lax.slice_in_dim(v, kk, kk + 1, axis=0)
        acc = acc + (w_kk.reshape(n, h, 1, st).astype(jnp.float32)
                     * v_kk.reshape(1, h, d, st).astype(jnp.float32))
    a2 = jnp.swapaxes(acc.reshape(n, Bq, st).astype(cdtype),
                      1, 2).reshape(n * st, Bq)
    dwout_acc = jax.lax.dot_general(
        a2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [Bq, B]
    # dA = g @ Wout^T, then to the transposed attention layout
    dA = jax.lax.dot_general(
        g2, wout_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdtype)
    dA_t = jnp.swapaxes(dA.reshape(n, st, Bq), 1, 2)        # [n, Bq, st]

    # dp[q,k] = sum_d dA'[q] . v[k];  dv[k] = sum_q p[q,k] dA'[q]
    dA_t4 = dA_t.reshape(n, h, d, st).astype(jnp.float32)
    for kk in range(n):
        v_kk = jax.lax.slice_in_dim(v, kk, kk + 1, axis=0)
        prod = (dA_t * v_kk).astype(jnp.float32)
        ds_ref[:, kk] = jnp.sum(prod.reshape(n, h, d, st), axis=2)
        p_kk = jax.lax.slice_in_dim(pc, kk, kk + 1, axis=1)  # [n,1,h,st]
        dv_k = jnp.sum(
            p_kk.reshape(n, h, 1, st).astype(jnp.float32) * dA_t4, axis=0)
        dqkv_t_ref[kk, 2 * Bq:3 * Bq, :] = dv_k.reshape(
            Bq, st).astype(cdtype)
    # softmax backward (score scale folded in once)
    dp = ds_ref[:]
    p = p_ref[:]
    rowsum = jnp.sum(p * dp, axis=1, keepdims=True)
    dsc = ((p * (dp - rowsum)) * scale).astype(cdtype)      # [n, n, h, st]

    # dq[q] = sum_k ds[q,k] k[k];  dk[k] = sum_q ds[q,k] q[q]
    q4 = q.reshape(n, h, d, st).astype(jnp.float32)
    dq_acc = jnp.zeros((n, h, d, st), jnp.float32)
    for kk in range(n):
        ds_kk = jax.lax.slice_in_dim(dsc, kk, kk + 1, axis=1)  # [n,1,h,st]
        ds_kk = ds_kk.reshape(n, h, 1, st).astype(jnp.float32)
        k_kk = jax.lax.slice_in_dim(k, kk, kk + 1, axis=0)
        dq_acc = dq_acc + ds_kk * k_kk.reshape(1, h, d, st).astype(
            jnp.float32)
        dk_k = jnp.sum(ds_kk * q4, axis=0)                  # [h, d, st]
        dqkv_t_ref[kk, 1 * Bq:2 * Bq, :] = dk_k.reshape(
            Bq, st).astype(cdtype)
    dqkv_t_ref[:, 0 * Bq:1 * Bq, :] = dq_acc.reshape(
        n, Bq, st).astype(cdtype)

    dqkv2 = jnp.swapaxes(dqkv_t_ref[:], 1, 2).reshape(n * st, 3 * Bq)
    dwqkv_acc = jax.lax.dot_general(
        y2, dqkv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [B, 3Bq]
    dy = jax.lax.dot_general(
        dqkv2, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [n*st, B] f32
    # LN backward (f32 statistics)
    xhat2 = xhat.reshape(n * st, B)
    dgamma = jnp.sum(dy * xhat2, axis=0, keepdims=True)     # [1, B]
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy.reshape(n, st, B) * gam
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


def fused_inter_attention_bwd(
    x: jax.Array,                    # [M, n, S, B]
    g: jax.Array,                    # [M, n, S, B] cotangent of the output
    gamma: jax.Array, beta: jax.Array,
    w_qkv: jax.Array, w_out: jax.Array,
    key_bias: Optional[jax.Array],
    *,
    n_heads: int,
    s_tile: Optional[int] = None,
    interpret: bool = False,
    partial: bool = False,
):
    """Single-kernel backward of the fused inter sublayer. Returns
    ``(dx, dgamma, dbeta, dw_qkv, dw_out)`` in the primals' dtypes.
    ``partial``: backward of the partial (head-group shard) forward."""
    M, n, S, B = x.shape
    Bq = w_qkv.shape[1] // 3
    st = int(s_tile) if s_tile else _pick_s_tile(n, S, n_heads)
    cdtype = x.dtype
    aff = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)])
    if key_bias is None:
        key_bias = jnp.zeros((n, S), jnp.float32)
    bias_t = jnp.transpose(
        key_bias.astype(jnp.float32).reshape(n, S // st, st), (1, 0, 2))
    flops = (2 * M * n * S * B * 3 * Bq * 3     # qkv fwd + dWqkv + dy
             + 2 * M * n * S * Bq * B * 3       # out fwd + dWout + dA
             + 4 * M * n * n * S * Bq * 3)      # attention fwd + bwd
    dx, dwqkv, dwout, dgb = pl.pallas_call(
        functools.partial(_inter_bwd_kernel, n_heads=n_heads,
                          partial=partial),
        grid=(M, S // st),
        in_specs=[
            pl.BlockSpec((1, n, st, B), lambda m, s: (m, 0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, st, B), lambda m, s: (m, 0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3 * Bq), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, st), lambda m, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, st, B), lambda m, s: (m, 0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3 * Bq), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bq, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, s: (0, 0),
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
            pltpu.VMEM((n, n, n_heads, st), jnp.float32),
            pltpu.VMEM((n, n, n_heads, st), jnp.float32),
            pltpu.VMEM((n, 3 * Bq, st), cdtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * M * n * S * B * jnp.dtype(cdtype).itemsize,
            transcendentals=M * n * n * n_heads * S),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, g, w_qkv.astype(cdtype), w_out.astype(cdtype), aff, bias_t)
    return (dx, dgb[0].astype(gamma.dtype), dgb[1].astype(beta.dtype),
            dwqkv.astype(w_qkv.dtype), dwout.astype(w_out.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_inter_ad(static, x, gamma, beta, w_qkv, w_out, key_bias):
    n_heads, s_tile, _, interpret, partial = static
    return fused_inter_attention(x, gamma, beta, w_qkv, w_out, key_bias,
                                 n_heads=n_heads, s_tile=s_tile,
                                 interpret=interpret, partial=partial)


def _fused_inter_fwd(static, *args):
    # Residuals are just the primals: the backward rematerializes the
    # intermediates in VMEM (jax.checkpoint semantics).
    return _fused_inter_ad(static, *args), args


def _fused_inter_bwd(static, residuals, g):
    n_heads, s_tile, bwd, interpret, partial = static
    if bwd:
        x, gamma, beta, w_qkv, w_out, key_bias = residuals
        dx, dgamma, dbeta, dwqkv, dwout = fused_inter_attention_bwd(
            x, g, gamma, beta, w_qkv, w_out, key_bias,
            n_heads=n_heads, s_tile=s_tile, interpret=interpret,
            partial=partial)
        return dx, dgamma, dbeta, dwqkv, dwout, jnp.zeros_like(residuals[5])
    _, vjp = jax.vjp(
        lambda *a: xla_inter_attention(*a, n_heads=n_heads,
                                       partial=partial), *residuals)
    return vjp(g)


_fused_inter_ad.defvjp(_fused_inter_fwd, _fused_inter_bwd)


def fused_inter_attention_ad(
    x, gamma, beta, w_qkv, w_out, key_bias, *,
    n_heads: int,
    s_tile: Optional[int] = None,
    bwd: bool = True,
    interpret: bool = False,
    partial: bool = False,
):
    """Differentiable fused inter sublayer: Pallas forward + selectable
    backward — the single-kernel fused backward (``bwd=True``) or XLA
    rematerialize-and-autodiff (``bwd=False``). Safe under ``jax.grad``;
    use ``fused_inter_train_ready`` to pick it safely on a real backend.
    ``partial``: tensor-parallel head-group shard (see
    ``fused_inter_attention``)."""
    if key_bias is None:
        M, n, S, B = x.shape
        key_bias = jnp.zeros((n, S), jnp.float32)
    static = (n_heads, s_tile, bool(bwd), interpret, bool(partial))
    return _fused_inter_ad(static, x, gamma, beta, w_qkv, w_out, key_bias)


# --------------------------------------------------------------------------
# Probe / autotune registry (same discipline as tcn_block's).
# --------------------------------------------------------------------------

# (M, n, S, B, n_heads, dtype-str) -> s_tile int (use fused) | None (XLA
# wins). M (batch) is part of the key: the custom call is a fusion barrier
# whose in-model cost is batch-dependent, so winners raced at one batch
# must not be trusted at another.
_DPT_READY: dict = {}
_DPT_PROBED: set = set()
# (M, S, B, n_heads, dtype-str) -> first raced winner; later shapes of the
# same config (eval/separate batches vary in [M, T] and therefore n) only
# compile+numerics-verify it instead of re-racing — races through the
# relay's compile service cost minutes each
_DPT_CONFIG_WINNERS: dict = {}
# same key as _DPT_READY -> fastest numerics-passing fused s_tile even when
# XLA won the isolated race — the in-model validator's promotion candidate
_DPT_BEST_FUSED: dict = {}


def fused_inter_ready(M: int, n: int, S: int, B: int, n_heads: int, dtype,
                      interpret: bool):
    """Trace-time gate. Returns an ``s_tile`` (or "auto" in interpret mode)
    when the fused kernel may engage for this shape, else None. On a real
    backend a shape is only enabled after ``probe_fused_inter`` compiled,
    numerics-checked AND raced it at this batch."""
    if interpret:
        return "auto"
    return _DPT_READY.get((M, n, S, B, n_heads, str(jnp.dtype(dtype))))


def probe_fused_inter(
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
    """AOT-compile, numerics-gate, and race the fused inter-attention
    kernel against the XLA sublayer at one concrete shape. Records the
    winning ``s_tile`` (or None = XLA) in the registry and returns it.

    Mirrors ``probe_fused_block``: compile failures retry then degrade;
    each surviving candidate's output is compared on-device against the
    XLA sublayer before any timing race (a silent Mosaic miscompile must
    not win on speed)."""
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
    # a realistic pad mask: last chunk half-invalid
    valid = np.ones((n, S), bool)
    valid[-1, S // 2:] = False
    bias = jnp.asarray(np.where(valid, 0.0, NEG_INF), jnp.float32)
    wargs = (gamma, beta, w_qkv, w_out, bias)

    def xla_fn(xx):
        return xla_inter_attention(xx, *wargs, n_heads=n_heads)

    if only_tile is not None:
        tiles = [int(only_tile)]
    else:
        tiles = [_pick_s_tile(n, S, n_heads)]
        if S % 2 == 0 and S // 2 >= 128 and S // 2 not in tiles \
                and S in tiles:
            tiles.append(S // 2)
    compiled, aot = {}, {}
    for st in tiles:
        name = f"st{st}"
        fn = functools.partial(fused_inter_attention, n_heads=n_heads,
                               s_tile=st, interpret=interpret)
        err = None
        for _ in range(retries + 1):
            try:
                aot[name] = jax.jit(fn).lower(x, *wargs).compile()
                compiled[name] = (
                    lambda xx, _fn=fn: _fn(xx, *wargs))
                err = None
                break
            except Exception as e:  # noqa: BLE001 — any compile failure
                err = e
        if err is not None and verbose:
            import sys as _sys

            print(f"dpt probe {key}: st{st} compile failed "
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
                print(f"dpt probe {key}: numerics vs xla (tol {tol:g}): "
                      f"{detail}", file=_sys.stderr)
            else:
                print(f"dpt probe {key}: numerics UNVERIFIED "
                      f"(xla reference failed)", file=_sys.stderr)
            for nm in sorted(set(compiled) - ok):
                print(f"dpt probe {key} {nm}: REJECTED on numerics "
                      f"(rel err {errs[nm]:.2e})", file=_sys.stderr)
        compiled = {nm: f for nm, f in compiled.items() if nm in ok}
    if not compiled:
        best = None
    elif autotune and not interpret:
        best, timed = _race(compiled, xla_fn, x, inner=100)
        fused_times = {nm: t for nm, t in timed.items() if nm != "xla"}
        if fused_times:
            _DPT_BEST_FUSED[key] = int(
                min(fused_times, key=fused_times.get)[2:])
        if verbose:
            import sys as _sys

            detail = " ".join(f"{k_}={v * 1e3:.3f}ms"
                              for k_, v in sorted(timed.items()))
            print(f"dpt probe {key}: best={best or 'xla'} ({detail})",
                  file=_sys.stderr)
    else:
        best = next(iter(compiled))
    win = int(best[2:]) if best else None
    _DPT_READY[key] = win
    return win


# (M, n, S, B, n_heads, dtype-str) -> True (fused pair) | None (autodiff)
_DPT_BWD_READY: dict = {}
_DPT_BWD_CONFIG: dict = {}


def fused_inter_train_ready(M: int, n: int, S: int, B: int, n_heads: int,
                            dtype, interpret: bool):
    """Trace-time gate for the fused train pair (Pallas forward + fused
    single-kernel backward). True when this shape's pair compiled, won the
    on-device race against XLA autodiff AND reproduced all five autodiff
    cotangents; None keeps plain autodiff. Interpret mode returns True
    (correctness testing)."""
    if interpret:
        return True
    return _DPT_BWD_READY.get((M, n, S, B, n_heads, str(jnp.dtype(dtype))))


def probe_fused_inter_train(
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
    training. Records True/None in ``_DPT_BWD_READY`` and returns it."""
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _numerics_tol,
        _race,
    )

    if check_numerics is None:
        check_numerics = not interpret

    key = (M, n, S, B, n_heads, str(jnp.dtype(dtype)))
    if verify_only and _DPT_BWD_READY.get(key) is None:
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
    st = _DPT_READY.get(key) or _pick_s_tile(n, S, n_heads)

    def grad_fn(sublayer):
        """x -> dx with all five input cotangents computed."""

        def f(xx):
            def loss(*a):
                return jnp.sum(sublayer(*a).astype(jnp.float32))

            grads = jax.grad(loss, argnums=tuple(range(5)))(xx, *wargs)
            return grads[0].astype(xx.dtype)

        return f

    def fused(xx, *a):
        return fused_inter_attention_ad(xx, *a, bias, n_heads=n_heads,
                                        s_tile=st, bwd=True,
                                        interpret=interpret)

    def xla(xx, *a):
        return xla_inter_attention(xx, *a, bias, n_heads=n_heads)

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

            print(f"dpt train probe {key}: compile failed "
                  f"({type(err).__name__})", file=_sys.stderr)
        _DPT_BWD_READY[key] = None
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
            print(f"dpt train probe {key}: best="
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
            print(f"dpt train probe {key}: grads numerics vs autodiff "
                  f"(tol {tol:g}): max rel err {merr:.2e} [{state}]",
                  file=_sys.stderr)
        if not ok:
            best = False
    win = True if best else None
    _DPT_BWD_READY[key] = win
    return win


def ensure_probed_dpt_train(cfg, batch: int, T: int,
                            verbose: bool = True) -> None:
    """Probe the fused DPT train pair for a concrete [batch, T] shape
    (idempotent per shape; no-op on CPU). Probes the inference forward
    first (the train pair reuses its s_tile winner); winners persist in
    the shared autotune cache under ``dpt:train:`` keys."""
    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "dpt"):
        return
    from convtasnet_tpu.ops.pallas.dpt_ffn import ensure_probed_dpt_ffn_train
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
    )

    # the FFN and intra sublayers have their own fused train pairs +
    # probes (idempotent)
    ensure_probed_dpt_ffn_train(cfg, batch, T, verbose=verbose)
    from convtasnet_tpu.ops.pallas.dpt_intra import (
        ensure_probed_dpt_intra_train,
    )

    ensure_probed_dpt_intra_train(cfg, batch, T, verbose=verbose)

    K = (T - cfg.kernel_size) // cfg.stride + 1
    S = cfg.dpt_chunk
    n = -(-K // S)
    B = cfg.bottleneck
    h = cfg.dpt_num_heads
    dt = str(jnp.dtype(cfg.compute_dtype))
    key = (batch, n, S, B, h, dt)
    shape_key = ("dpt-train",) + key
    if shape_key in _DPT_PROBED:
        return
    if probe_budget.exhausted():
        if verbose:
            import sys as _sys

            print("dpt train probe: probe budget exhausted -> xla this run "
                  "(undecided at this shape)", file=_sys.stderr)
        return
    ensure_probed_dpt(cfg, batch, T, verbose=verbose)
    disk_key = "dpt:train:" + ":".join(str(v) for v in shape_key[1:])
    cached = _autotune_cache_load().get(disk_key)  # truthy: {} re-probes
    kw = dict(M=batch, n=n, S=S, B=B, n_heads=h,
              dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose)
    if cached:
        win = cached.get("train")
        _DPT_BWD_READY[key] = True if win else None
        _DPT_PROBED.add(shape_key)
        if verbose:
            import sys as _sys

            print(f"dpt train probe: autotune winner loaded from disk "
                  f"({disk_key} -> {win})", file=_sys.stderr)
        if win:
            # compile-verify the pair at this shape; a failure degrades
            # this shape to plain autodiff
            probe_fused_inter_train(verify_only=True, autotune=False,
                                    check_numerics=False, **kw)
        return
    cfg_key = (batch, S, B, h, dt)
    if cfg_key in _DPT_BWD_CONFIG:
        # config already raced at another shape: skip the timing race but
        # keep the compile + cotangent-numerics gate at THIS shape
        if _DPT_BWD_CONFIG[cfg_key] is None:
            _DPT_BWD_READY[key] = None
            win = None
        else:
            win = probe_fused_inter_train(autotune=False, **kw)
    else:
        win = probe_fused_inter_train(**kw)
        if win is not None or not probe_budget.exhausted():
            _DPT_BWD_CONFIG[cfg_key] = win
    if win is None and probe_budget.exhausted():
        return  # budget-cut race is not evidence: don't persist/memoize
    _autotune_cache_store(disk_key, {"train": bool(win) if win else None})
    _DPT_PROBED.add(shape_key)


def ensure_probed_dpt(cfg, batch: int, T: int, verbose: bool = True) -> None:
    """Probe the fused dual-path sublayer kernels (ffn, intra, inter) for a
    concrete [batch, T] input (idempotent per shape; no-op on CPU), then
    re-validate the engaged winners IN-MODEL (each Pallas call is a fusion
    barrier whose full-model cost the isolated races can't see — see
    ``dpt_inmodel.validate_in_model``). Winners persist in the shared
    autotune cache (``dpt:`` keys), so repeat processes skip the races."""
    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "dpt"):
        return
    from convtasnet_tpu.ops.pallas.dpt_ffn import ensure_probed_dpt_ffn

    # the FFN and intra sublayers have their own fused kernels + probes
    # (idempotent)
    ensure_probed_dpt_ffn(cfg, batch, T, verbose=verbose)
    from convtasnet_tpu.ops.pallas.dpt_intra import ensure_probed_dpt_intra

    ensure_probed_dpt_intra(cfg, batch, T, verbose=verbose)
    _ensure_probed_inter(cfg, batch, T, verbose=verbose)

    from convtasnet_tpu.ops.pallas.dpt_inmodel import validate_in_model

    validate_in_model(cfg, batch, T, verbose=verbose)


def _ensure_probed_inter(cfg, batch: int, T: int,
                         verbose: bool = True) -> None:
    """Probe the fused inter-attention kernel for a concrete [batch, T]
    shape (idempotent per shape)."""
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
    shape_key = ("dpt",) + key
    if shape_key in _DPT_PROBED:
        return
    if probe_budget.exhausted():
        if verbose:
            import sys as _sys

            print("dpt probe: probe budget exhausted -> xla this run "
                  "(undecided at this shape)", file=_sys.stderr)
        return
    disk_key = "dpt:inter:" + ":".join(str(v) for v in shape_key[1:])
    cached = _autotune_cache_load().get(disk_key)  # truthy: {} re-probes
    if cached:
        win = cached.get("inter")
        _DPT_READY[key] = int(win) if win is not None else None
        bf = cached.get("best_fused")
        if bf is not None:  # rehydrate the in-model promotion candidate
            _DPT_BEST_FUSED[key] = int(bf)
        _DPT_CONFIG_WINNERS.setdefault(cfg_key, _DPT_READY[key])
        _DPT_PROBED.add(shape_key)
        if verbose:
            import sys as _sys

            print(f"dpt probe: autotune winner loaded from disk "
                  f"({disk_key} -> {win})", file=_sys.stderr)
        if win is not None:
            # compile-verify the winner at this shape (cheap via the XLA
            # disk cache); a failure degrades this shape to XLA
            probe_fused_inter(
                M=batch, n=n, S=S, B=B, n_heads=h,
                dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose,
                autotune=False, check_numerics=False,
                only_tile=int(win))
        return
    if cfg_key in _DPT_CONFIG_WINNERS:
        # config already raced at another shape: trust its winner but
        # prove the compile + numerics at THIS shape (a larger n can VMEM-
        # OOM the same tile; a failure degrades this shape to XLA)
        prev = _DPT_CONFIG_WINNERS[cfg_key]
        if prev is None:
            _DPT_READY[key] = None
            win = None
        else:
            win = probe_fused_inter(
                M=batch, n=n, S=S, B=B, n_heads=h,
                dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose,
                autotune=False, only_tile=int(prev))
    else:
        win = probe_fused_inter(M=batch, n=n, S=S, B=B, n_heads=h,
                                dtype=jnp.dtype(cfg.compute_dtype),
                                verbose=verbose)
        if win is not None or not probe_budget.exhausted():
            _DPT_CONFIG_WINNERS[cfg_key] = win
    if win is None and probe_budget.exhausted():
        return  # budget-cut race is not evidence: don't persist/memoize
    _autotune_cache_store(disk_key, {"inter": win,
                                     "best_fused": _DPT_BEST_FUSED.get(key)})
    _DPT_PROBED.add(shape_key)
