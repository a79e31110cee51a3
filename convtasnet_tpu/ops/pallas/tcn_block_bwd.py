"""Fused Pallas BACKWARD kernel for one TCN block (training hot path).

Round 2 established that the recompute-through-XLA custom VJP makes training
*slower* than plain XLA autodiff (docs/RESULTS.md): the custom_vjp boundary
blocks cross-op fusion and the backward re-streams every [K, H] intermediate
through HBM anyway. This kernel is the actual fix: the entire block backward
— gLN₂ → PReLU₂ → depthwise-conv transpose → gLN₁ → PReLU₁ plus both 1x1
weight grads — executes as ONE kernel per batch element with every [K, H]
intermediate resident in VMEM.

Only the block *inputs* are saved as residuals (rematerialization, like
``jax.checkpoint``): the kernel recomputes the forward intermediates it
needs (one extra [K,B]x[B,H] matmul + the cheap VPU depthwise conv) inside
VMEM. Per-block HBM traffic is x-in + g-in + dx-out (three [K, B] arrays)
plus the small weight grads — vs ~15 [K, H]-sized operand streams for the
XLA autodiff chain (reference hot loop: ``src/conv_tasnet.py:218-278``
under ``loss.backward()``, ``src/solver.py:192-196``).

Pass structure (grid over batch; K padded to a tile multiple; all stats in
f32; P1..P6 below, tile loops unrolled in Python like the forward kernel):

  P1  recompute h_pre = x @ W_in per tile → h_buf; gLN₁ stats of
      h1 = PReLU(h_pre)
  P2  recompute c = dwconv(gLN₁(h1)) per tile (norm folded into the taps,
      halo handled by static edge-tile masks) → c_buf; gLN₂ stats of
      h2 = PReLU(c)
  P3  dhn2 = g @ W_outᵀ → e_buf; dW_out += hn2ᵀ @ g; gLN₂ backward
      reductions (t1, t2, dγ₂, dβ₂)
  P4  dh2 = rs₂(γ₂ dhn2 − t̄1 − ĥ₂ t̄2); da₂; dc = dh2 ⊙ PReLU'(c) —
      written over c in place
  P5  conv transpose: dhn1 = Σ_p w_p dc[·+(P−1−p)d]; d_dw[p] += Σ dc ⊙ hn1;
      gLN₁ backward reductions (u1, u2, dγ₁, dβ₁); dhn1 written over dc in
      place (reads only look rightward of writes — safe tile-sequentially)
  P6  dh1 = rs₁(γ₁ dhn1 − ū1 − ĥ₁ ū2); da₁; dh_pre = dh1 ⊙ PReLU'(h_pre);
      dx = g + dh_pre @ W_inᵀ; dW_in += xᵀ @ dh_pre

Weight gradients accumulate across the (sequential) batch grid in
VMEM-resident f32 output blocks (constant index_map, initialized at m == 0).
Scalar PReLU grads and the per-channel γ/β grads ride in one [16, H] f32
auxiliary output (rows: 0..P-1 d_dw, 8..11 dγ₁ dβ₁ dγ₂ dβ₂, 12..13
per-channel partials of da₁/da₂ — summed on the host side of the wrapper).

Two norm variants: gLN (the paper config / flagship training path —
``_bwd_kernel``, six passes with global two-pass stats) and cLN
(causal/streaming training — ``_bwd_kernel_cln``, THREE passes: the
per-row stats make every norm backward row-local, so [dhn2 → dh2 → dc]
and [conv-transpose → dh1 → dx] each fuse into single passes and no e_buf
exists). BN training keeps the recompute-XLA VJP.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rows_mask(tk: int, k0: int, shift: int, K: int):
    """[tk, 1] f32 mask: logical row (k0 + i + shift) inside [0, K)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0) + (k0 + shift)
    return ((rows >= 0) & (rows < K)).astype(jnp.float32)


def _bwd_kernel(
    x_ref,      # [1, Kp, B]
    g_ref,      # [1, Kp, B]  upstream cotangent (zero on pad rows)
    w_in_ref,   # [B, H]
    dw_ref,     # [P, H]
    w_out_ref,  # [H, B]
    aff_ref,    # [4, H] f32: gamma1, beta1, gamma2, beta2
    scal_ref,   # [1, 2] SMEM f32: prelu slopes a1, a2
    dx_ref,     # [1, Kp, B]
    dwin_ref,   # [B, H] f32 (accumulated over the batch grid)
    dwout_ref,  # [H, B] f32 (accumulated)
    daux_ref,   # [16, H] f32 (accumulated; see module docstring)
    h_buf,      # VMEM [(P-1)d + Kp, H] x.dtype — h_pre at [left + r]
    c_buf,      # VMEM [(P-1)d + Kp, H] x.dtype — c / dc at [pad_l + r],
                #   then dhn1 at [r]
    *scratch,   # (e_buf [Kp, H],) when store_e
    K: int,
    tile: int,
    dilation: int,
    conv_kernel: int,
    causal: bool,
    store_e: bool,
):
    m = pl.program_id(0)
    Kp = x_ref.shape[1]
    H = w_in_ref.shape[1]
    P = conv_kernel
    d = dilation
    left = (P - 1) * d if causal else ((P - 1) * d) // 2
    pad_l = (P - 1) * d - left
    n_tiles = Kp // tile
    a1 = scal_ref[0, 0]
    a2 = scal_ref[0, 1]
    inv_n = 1.0 / (K * H)
    # matmul-operand dtype (bf16 keeps the MXU at full rate) vs scratch
    # dtype (h_buf/c_buf/e_buf may be f32 — the *_f32 probe variants — to
    # drop the converts on scratch traffic)
    mdtype = x_ref.dtype
    cdtype = h_buf.dtype

    w_in = w_in_ref[:]
    w_out = w_out_ref[:]
    dw = dw_ref[:].astype(jnp.float32)
    g1 = aff_ref[0:1, :]
    b1 = aff_ref[1:2, :]
    g2 = aff_ref[2:3, :]
    b2 = aff_ref[3:4, :]

    def prelu(v, a):
        return jnp.where(v >= 0, v, a * v)

    def maybe_mask(y, k0):
        return y * _rows_mask(tile, k0, 0, K) if k0 + tile > K else y

    # zero the halo/pad regions the passes below rely on reading as zeros
    # (scratch is uninitialized, and dhn1 writes from the previous grid step
    # clobber c_buf's bottom pad)
    if left > 0:
        h_buf[:left, :] = jnp.zeros((left, H), cdtype)
    if (P - 1) * d - left > 0:
        h_buf[left + Kp:, :] = jnp.zeros(((P - 1) * d - left, H), cdtype)
    if pad_l > 0:
        c_buf[:pad_l, :] = jnp.zeros((pad_l, H), cdtype)
    if (P - 1) * d - pad_l > 0:
        c_buf[pad_l + Kp:, :] = jnp.zeros(((P - 1) * d - pad_l, H), cdtype)

    # ---- P1: recompute h_pre, gLN1 stats of h1 = prelu(h_pre) ----
    s1 = jnp.float32(0.0)
    s2 = jnp.float32(0.0)
    for t in range(n_tiles):
        k0 = t * tile
        x = x_ref[0, pl.ds(k0, tile), :]
        hp = jnp.dot(x, w_in, preferred_element_type=jnp.float32)
        hp = maybe_mask(hp, k0)
        h1 = prelu(hp, a1)
        s1 += jnp.sum(h1)
        s2 += jnp.sum(h1 * h1)
        h_buf[pl.ds(left + k0, tile), :] = hp.astype(cdtype)
    mean1 = s1 * inv_n
    rs1 = jax.lax.rsqrt(s2 * inv_n - mean1 * mean1 + EPS)
    s_vec = rs1 * g1                      # [1, H]
    b_vec = b1 - mean1 * s_vec
    dw_eff = dw * s_vec                   # [P, H] norm folded into taps
    bias = b_vec * jnp.sum(dw, axis=0, keepdims=True)

    def h1_read(k0, p):
        """prelu(h_pre) rows [k0 + p*d, +tile) in absolute h_buf space."""
        return prelu(
            h_buf[pl.ds(k0 + p * d, tile), :].astype(jnp.float32), a1)

    def edge_tile(k0):
        return (k0 - left < 0) or (k0 + tile - 1 + (P - 1) * d - left >= K)

    def conv_tile(k0):
        """Recompute c rows [k0, +tile): dwconv(gLN1(h1)) with the norm
        folded into the taps; out-of-range taps masked on edge tiles."""
        if not edge_tile(k0):
            acc = bias
            for p in range(P):
                acc = acc + h1_read(k0, p) * dw_eff[p:p + 1, :]
            return acc
        acc = jnp.zeros((tile, H), jnp.float32)
        for p in range(P):
            mask = _rows_mask(tile, k0, p * d - left, K)
            acc = acc + mask * (h1_read(k0, p) * dw_eff[p:p + 1, :]
                                + dw[p:p + 1, :] * b_vec)
        return acc

    # ---- P2: recompute c, gLN2 stats of h2 = prelu(c) ----
    s3 = jnp.float32(0.0)
    s4 = jnp.float32(0.0)
    for t in range(n_tiles):
        k0 = t * tile
        c = maybe_mask(conv_tile(k0), k0)
        h2 = prelu(c, a2)
        s3 += jnp.sum(h2)
        s4 += jnp.sum(h2 * h2)
        c_buf[pl.ds(pad_l + k0, tile), :] = c.astype(cdtype)
    mean2 = s3 * inv_n
    rs2 = jax.lax.rsqrt(s4 * inv_n - mean2 * mean2 + EPS)

    # ---- P3: dhn2 = g @ W_out^T; dW_out; gLN2 backward reductions ----
    t1 = jnp.float32(0.0)
    t2 = jnp.float32(0.0)
    dg2 = jnp.zeros((1, H), jnp.float32)
    db2 = jnp.zeros((1, H), jnp.float32)
    dwout_acc = jnp.zeros(dwout_ref.shape, jnp.float32)
    e_buf = scratch[0] if store_e else None

    def dhn2_tile(k0):
        gt = g_ref[0, pl.ds(k0, tile), :]
        return jax.lax.dot_general(
            gt, w_out, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    for t in range(n_tiles):
        k0 = t * tile
        gt = g_ref[0, pl.ds(k0, tile), :]
        dhn2 = dhn2_tile(k0)
        c = c_buf[pl.ds(pad_l + k0, tile), :].astype(jnp.float32)
        h2 = prelu(c, a2)
        hhat2 = (h2 - mean2) * rs2
        hn2 = g2 * hhat2 + b2
        dwout_acc += jax.lax.dot_general(
            hn2.astype(mdtype), gt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gdh = g2 * dhn2
        t1 += jnp.sum(gdh)
        t2 += jnp.sum(gdh * hhat2)
        dg2 += jnp.sum(dhn2 * hhat2, axis=0, keepdims=True)
        db2 += jnp.sum(dhn2, axis=0, keepdims=True)
        if store_e:
            e_buf[pl.ds(k0, tile), :] = dhn2.astype(e_buf.dtype)
    t1n = t1 * inv_n
    t2n = t2 * inv_n

    # ---- P4: dh2 -> dc (over c in place) ----
    da2 = jnp.zeros((1, H), jnp.float32)
    for t in range(n_tiles):
        k0 = t * tile
        if store_e:
            dhn2 = e_buf[pl.ds(k0, tile), :].astype(jnp.float32)
        else:
            dhn2 = dhn2_tile(k0)
        c = c_buf[pl.ds(pad_l + k0, tile), :].astype(jnp.float32)
        hhat2 = (prelu(c, a2) - mean2) * rs2
        dh2 = rs2 * (g2 * dhn2 - t1n - hhat2 * t2n)
        dh2 = maybe_mask(dh2, k0)
        da2 += jnp.sum(dh2 * jnp.minimum(c, 0.0), axis=0, keepdims=True)
        dc = dh2 * jnp.where(c >= 0, 1.0, a2)
        c_buf[pl.ds(pad_l + k0, tile), :] = dc.astype(cdtype)

    # ---- P5: conv transpose + dw grads + gLN1 backward reductions ----
    # dhn1[j] = sum_p dw[p] * dc[j - p*d + left]; dc row r lives at
    # c_buf[pad_l + r] so the read for tap p is c_buf[j + (P-1-p)*d] — always
    # >= j, so writing dhn1[j] to c_buf[j] after the tile's reads is safe.
    u1 = jnp.float32(0.0)
    u2 = jnp.float32(0.0)
    dg1 = jnp.zeros((1, H), jnp.float32)
    db1 = jnp.zeros((1, H), jnp.float32)
    ddw = [jnp.zeros((1, H), jnp.float32) for _ in range(P)]
    for t in range(n_tiles):
        k0 = t * tile
        dc_t = c_buf[pl.ds(pad_l + k0, tile), :].astype(jnp.float32)
        acc = None
        for p in range(P):
            seg = c_buf[pl.ds(k0 + (P - 1 - p) * d, tile), :].astype(
                jnp.float32)
            term = seg * dw[p:p + 1, :]
            acc = term if acc is None else acc + term
            # d_dw[p] += sum_j dc[j] * hn1[j + p*d - left]
            if edge_tile(k0):
                mask = _rows_mask(tile, k0, p * d - left, K)
                hn1 = mask * (s_vec * h1_read(k0, p) + b_vec)
            else:
                hn1 = s_vec * h1_read(k0, p) + b_vec
            ddw[p] += jnp.sum(dc_t * hn1, axis=0, keepdims=True)
        dhn1 = maybe_mask(acc, k0)
        hp = h_buf[pl.ds(left + k0, tile), :].astype(jnp.float32)
        hhat1 = (prelu(hp, a1) - mean1) * rs1
        gdh = g1 * dhn1
        u1 += jnp.sum(gdh)
        u2 += jnp.sum(gdh * hhat1)
        dg1 += jnp.sum(dhn1 * hhat1, axis=0, keepdims=True)
        db1 += jnp.sum(dhn1, axis=0, keepdims=True)
        c_buf[pl.ds(k0, tile), :] = dhn1.astype(cdtype)
    u1n = u1 * inv_n
    u2n = u2 * inv_n

    # ---- P6: dh1 -> dh_pre -> dx, dW_in ----
    da1 = jnp.zeros((1, H), jnp.float32)
    dwin_acc = jnp.zeros(dwin_ref.shape, jnp.float32)
    for t in range(n_tiles):
        k0 = t * tile
        dhn1 = c_buf[pl.ds(k0, tile), :].astype(jnp.float32)
        hp = h_buf[pl.ds(left + k0, tile), :].astype(jnp.float32)
        hhat1 = (prelu(hp, a1) - mean1) * rs1
        dh1 = rs1 * (g1 * dhn1 - u1n - hhat1 * u2n)
        dh1 = maybe_mask(dh1, k0)
        da1 += jnp.sum(dh1 * jnp.minimum(hp, 0.0), axis=0, keepdims=True)
        dhp = (dh1 * jnp.where(hp >= 0, 1.0, a1)).astype(mdtype)
        x = x_ref[0, pl.ds(k0, tile), :]
        dx = jax.lax.dot_general(
            dhp, w_in, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        gt = g_ref[0, pl.ds(k0, tile), :]
        dx_ref[0, pl.ds(k0, tile), :] = (
            gt.astype(jnp.float32) + dx).astype(dx_ref.dtype)
        dwin_acc += jax.lax.dot_general(
            x, dhp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- weight-grad accumulation across the (sequential) batch grid ----
    zrow = jnp.zeros((1, H), jnp.float32)
    aux = jnp.concatenate(
        ddw + [zrow] * (8 - P)
        + [dg1, db1, dg2, db2, da1, da2, zrow, zrow], axis=0)

    @pl.when(m == 0)
    def _():
        dwin_ref[:] = dwin_acc
        dwout_ref[:] = dwout_acc
        daux_ref[:] = aux

    @pl.when(m != 0)
    def _():
        dwin_ref[:] = dwin_ref[:] + dwin_acc
        dwout_ref[:] = dwout_ref[:] + dwout_acc
        daux_ref[:] = daux_ref[:] + aux


def _bwd_kernel_cln(
    x_ref,      # [1, Kp, B]
    g_ref,      # [1, Kp, B]
    w_in_ref,   # [B, H]
    dw_ref,     # [P, H]
    w_out_ref,  # [H, B]
    aff_ref,    # [4, H] f32: gamma1, beta1, gamma2, beta2
    scal_ref,   # [1, 2] SMEM f32: prelu slopes a1, a2
    dx_ref,     # [1, Kp, B]
    dwin_ref,   # [B, H] f32 (accumulated over the batch grid)
    dwout_ref,  # [H, B] f32 (accumulated)
    daux_ref,   # [16, H] f32 (accumulated)
    h_buf,      # VMEM [(P-1)d + Kp, H] x.dtype — h_pre at [left + r]
    st_buf,     # VMEM [(P-1)d + Kp, 128] f32 — per-row (mu1, rs1) in lanes 0/1
    c_buf,      # VMEM [(P-1)d + Kp, H] x.dtype — dc at [pad_l + r], then dhn1
    *,
    K: int,
    tile: int,
    dilation: int,
    conv_kernel: int,
    causal: bool,
):
    """cLN variant: per-row (channel-axis) norm stats make every norm
    backward row-local, so the whole chain runs in THREE tile passes —
    recompute+stats, [dhn2 → dh2 → dc] fused, and [conv-transpose → dh1 →
    dx] fused. No e_buf and no cross-tile reductions beyond the γ/β/slope
    grad accumulators."""
    m = pl.program_id(0)
    Kp = x_ref.shape[1]
    H = w_in_ref.shape[1]
    P = conv_kernel
    d = dilation
    left = (P - 1) * d if causal else ((P - 1) * d) // 2
    pad_l = (P - 1) * d - left
    n_tiles = Kp // tile
    a1 = scal_ref[0, 0]
    a2 = scal_ref[0, 1]
    inv_h = 1.0 / H
    mdtype = x_ref.dtype
    cdtype = h_buf.dtype

    w_in = w_in_ref[:]
    w_out = w_out_ref[:]
    dw = dw_ref[:].astype(jnp.float32)
    g1 = aff_ref[0:1, :]
    b1 = aff_ref[1:2, :]
    g2 = aff_ref[2:3, :]
    b2 = aff_ref[3:4, :]

    def prelu(v, a):
        return jnp.where(v >= 0, v, a * v)

    def maybe_mask(y, k0):
        return y * _rows_mask(tile, k0, 0, K) if k0 + tile > K else y

    if left > 0:
        h_buf[:left, :] = jnp.zeros((left, H), cdtype)
        # st halo must be finite: hn1_read computes before masking, and
        # NaN * 0 would poison the edge tiles
        st_buf[:left, :] = jnp.zeros((left, 128), jnp.float32)
    if (P - 1) * d - left > 0:
        h_buf[left + Kp:, :] = jnp.zeros(((P - 1) * d - left, H), cdtype)
        st_buf[left + Kp:, :] = jnp.zeros(
            ((P - 1) * d - left, 128), jnp.float32)
    if pad_l > 0:
        c_buf[:pad_l, :] = jnp.zeros((pad_l, H), cdtype)
    if (P - 1) * d - pad_l > 0:
        c_buf[pad_l + Kp:, :] = jnp.zeros(((P - 1) * d - pad_l, H), cdtype)

    # ---- P1: recompute h_pre; per-row cLN1 stats -> st_buf ----
    for t in range(n_tiles):
        k0 = t * tile
        xt = x_ref[0, pl.ds(k0, tile), :]
        hp = jnp.dot(xt, w_in, preferred_element_type=jnp.float32)
        hp = maybe_mask(hp, k0)
        h1 = prelu(hp, a1)
        mu = jnp.sum(h1, axis=1, keepdims=True) * inv_h          # [tile, 1]
        var = jnp.sum(h1 * h1, axis=1, keepdims=True) * inv_h - mu * mu
        rs = jax.lax.rsqrt(var + EPS)
        h_buf[pl.ds(left + k0, tile), :] = hp.astype(cdtype)
        st_buf[pl.ds(left + k0, tile), :] = jnp.concatenate(
            [mu, rs, jnp.zeros((tile, 126), jnp.float32)], axis=1)

    def hn1_read(k0, p, edge: bool):
        """cLN1-normalized h1 rows [k0 + p*d, +tile) (absolute h_buf space);
        out-of-range rows masked to the zero-padding the unfused math sees."""
        h1 = prelu(h_buf[pl.ds(k0 + p * d, tile), :].astype(jnp.float32), a1)
        st = st_buf[pl.ds(k0 + p * d, tile), :]
        hn = g1 * ((h1 - st[:, 0:1]) * st[:, 1:2]) + b1
        if edge:
            hn = hn * _rows_mask(tile, k0, p * d - left, K)
        return hn

    def edge_tile(k0):
        return (k0 - left < 0) or (k0 + tile - 1 + (P - 1) * d - left >= K)

    # ---- P2: dhn2 -> dh2 -> dc (row-local cLN2 backward), dW_out ----
    dg2 = jnp.zeros((1, H), jnp.float32)
    db2 = jnp.zeros((1, H), jnp.float32)
    da2 = jnp.zeros((1, H), jnp.float32)
    dwout_acc = jnp.zeros(dwout_ref.shape, jnp.float32)
    for t in range(n_tiles):
        k0 = t * tile
        edge = edge_tile(k0)
        c = None
        for p in range(P):
            term = hn1_read(k0, p, edge) * dw[p:p + 1, :]
            c = term if c is None else c + term
        c = maybe_mask(c, k0)
        h2 = prelu(c, a2)
        mu2 = jnp.sum(h2, axis=1, keepdims=True) * inv_h
        var2 = jnp.sum(h2 * h2, axis=1, keepdims=True) * inv_h - mu2 * mu2
        rs2 = jax.lax.rsqrt(var2 + EPS)
        hhat2 = (h2 - mu2) * rs2
        gt = g_ref[0, pl.ds(k0, tile), :]
        dhn2 = jax.lax.dot_general(
            gt, w_out, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        hn2 = g2 * hhat2 + b2
        dwout_acc += jax.lax.dot_general(
            hn2.astype(mdtype), gt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dg2 += jnp.sum(dhn2 * hhat2, axis=0, keepdims=True)
        db2 += jnp.sum(dhn2, axis=0, keepdims=True)
        gdh = g2 * dhn2
        m1r = jnp.sum(gdh, axis=1, keepdims=True) * inv_h
        m2r = jnp.sum(gdh * hhat2, axis=1, keepdims=True) * inv_h
        dh2 = rs2 * (gdh - m1r - hhat2 * m2r)
        dh2 = maybe_mask(dh2, k0)
        da2 += jnp.sum(dh2 * jnp.minimum(c, 0.0), axis=0, keepdims=True)
        dc = dh2 * jnp.where(c >= 0, 1.0, a2)
        c_buf[pl.ds(pad_l + k0, tile), :] = dc.astype(cdtype)

    # ---- P3: conv transpose -> dh1 -> dx / dW_in (all row-local) ----
    dg1 = jnp.zeros((1, H), jnp.float32)
    db1 = jnp.zeros((1, H), jnp.float32)
    da1 = jnp.zeros((1, H), jnp.float32)
    ddw = [jnp.zeros((1, H), jnp.float32) for _ in range(P)]
    dwin_acc = jnp.zeros(dwin_ref.shape, jnp.float32)
    for t in range(n_tiles):
        k0 = t * tile
        edge = edge_tile(k0)
        dc_t = c_buf[pl.ds(pad_l + k0, tile), :].astype(jnp.float32)
        acc = None
        for p in range(P):
            seg = c_buf[pl.ds(k0 + (P - 1 - p) * d, tile), :].astype(
                jnp.float32)
            term = seg * dw[p:p + 1, :]
            acc = term if acc is None else acc + term
            ddw[p] += jnp.sum(dc_t * hn1_read(k0, p, edge), axis=0,
                              keepdims=True)
        dhn1 = maybe_mask(acc, k0)
        hp = h_buf[pl.ds(left + k0, tile), :].astype(jnp.float32)
        st = st_buf[pl.ds(left + k0, tile), :]
        hhat1 = (prelu(hp, a1) - st[:, 0:1]) * st[:, 1:2]
        dg1 += jnp.sum(dhn1 * hhat1, axis=0, keepdims=True)
        db1 += jnp.sum(dhn1, axis=0, keepdims=True)
        gdh = g1 * dhn1
        m1r = jnp.sum(gdh, axis=1, keepdims=True) * inv_h
        m2r = jnp.sum(gdh * hhat1, axis=1, keepdims=True) * inv_h
        dh1 = st[:, 1:2] * (gdh - m1r - hhat1 * m2r)
        dh1 = maybe_mask(dh1, k0)
        da1 += jnp.sum(dh1 * jnp.minimum(hp, 0.0), axis=0, keepdims=True)
        dhp = (dh1 * jnp.where(hp >= 0, 1.0, a1)).astype(mdtype)
        xt = x_ref[0, pl.ds(k0, tile), :]
        dx = jax.lax.dot_general(
            dhp, w_in, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        gt = g_ref[0, pl.ds(k0, tile), :]
        dx_ref[0, pl.ds(k0, tile), :] = (
            gt.astype(jnp.float32) + dx).astype(dx_ref.dtype)
        dwin_acc += jax.lax.dot_general(
            xt, dhp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    zrow = jnp.zeros((1, H), jnp.float32)
    aux = jnp.concatenate(
        ddw + [zrow] * (8 - P)
        + [dg1, db1, dg2, db2, da1, da2, zrow, zrow], axis=0)

    @pl.when(m == 0)
    def _():
        dwin_ref[:] = dwin_acc
        dwout_ref[:] = dwout_acc
        daux_ref[:] = aux

    @pl.when(m != 0)
    def _():
        dwin_ref[:] = dwin_ref[:] + dwin_acc
        dwout_ref[:] = dwout_ref[:] + dwout_acc
        daux_ref[:] = daux_ref[:] + aux


def fused_tcn_block_bwd(
    x: jax.Array,            # [M, K, B] block input (the only residual)
    g: jax.Array,            # [M, K, B] cotangent of the block output
    w_in: jax.Array,         # [B, H]
    dw: jax.Array,           # [P, H]
    w_out: jax.Array,        # [H, B]
    a1: jax.Array, a2: jax.Array,
    gamma1: jax.Array, beta1: jax.Array,
    gamma2: jax.Array, beta2: jax.Array,
    *,
    dilation: int,
    causal: bool,
    norm_type: str = "gLN",
    tile: int = 1600,
    interpret: bool = False,
    store_e: bool = True,
    s_dtype=None,
) -> Tuple[jax.Array, ...]:
    """Fused backward of one TCN block (gLN or cLN).

    Returns ``(dx, dW_in, d_dw, dW_out, da1, da2, dγ1, dβ1, dγ2, dβ2)`` with
    dtypes matching the primals. ``store_e`` (gLN only): park
    dhn2 = g @ W_outᵀ in a [Kp, H] VMEM scratch between P3 and P4 (default)
    vs recompute that matmul in P4 (smaller VMEM footprint; the MXU is far
    from saturated in this kernel so the extra matmul is nearly free when
    VMEM is tight). The cLN variant has a single shape (row-local stats
    need no second pass). ``s_dtype``: dtype of the activation scratches
    (default x.dtype); f32 under bf16 compute drops the converts on scratch
    traffic (the ``*_f32`` train-probe variants) — matmul operands stay in
    x.dtype either way so the MXU runs at full rate.
    """
    M, K, B = x.shape
    H = w_in.shape[1]
    P = dw.shape[0]
    assert P <= 8, "daux layout packs d_dw rows 0..7"
    if norm_type not in ("gLN", "cLN"):
        raise ValueError("fused backward supports gLN and cLN only")
    Kp = _round_up(K, tile)
    if Kp != K:
        pad = ((0, 0), (0, Kp - K), (0, 0))
        x = jnp.pad(x, pad)
        g = jnp.pad(g, pad)
    cdtype = x.dtype
    sdtype = jnp.dtype(s_dtype) if s_dtype is not None else jnp.dtype(cdtype)

    aff = jnp.stack([
        gamma1.astype(jnp.float32), beta1.astype(jnp.float32),
        gamma2.astype(jnp.float32), beta2.astype(jnp.float32),
    ])
    scal = jnp.reshape(jnp.stack([a1, a2]).astype(jnp.float32), (1, 2))

    if norm_type == "cLN":
        kernel = functools.partial(
            _bwd_kernel_cln, K=K, tile=tile, dilation=dilation,
            conv_kernel=P, causal=causal)
    else:
        kernel = functools.partial(
            _bwd_kernel, K=K, tile=tile, dilation=dilation, conv_kernel=P,
            causal=causal, store_e=store_e)
    halo = (P - 1) * dilation
    # 5 tile-level matmuls (P1, P3 x2, P6 x2) + the VPU conv/transpose work
    flops = 5 * 2 * M * Kp * B * H + M * Kp * H * (4 * P + 40)
    dx, dwin, dwout, daux = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, B), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda m: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, B), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, Kp, B), cdtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, B), jnp.float32),
            jax.ShapeDtypeStruct((16, H), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((halo + Kp, H), sdtype)]
            + ([pltpu.VMEM((halo + Kp, 128), jnp.float32)]
               if norm_type == "cLN" else [])
            + [pltpu.VMEM((halo + Kp, H), sdtype)]
            + ([pltpu.VMEM((Kp, H), sdtype)]
               if (norm_type == "gLN" and store_e) else [])
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * M * Kp * B * jnp.dtype(cdtype).itemsize
            + (2 * B * H + 20 * H) * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.astype(cdtype), g.astype(cdtype), w_in.astype(cdtype),
      dw.astype(cdtype), w_out.astype(cdtype), aff, scal)
    if Kp != K:
        dx = dx[:, :K, :]
    return (
        dx,
        dwin.astype(w_in.dtype),
        daux[:P, :].astype(dw.dtype),
        dwout.astype(w_out.dtype),
        jnp.sum(daux[12, :]).astype(a1.dtype),
        jnp.sum(daux[13, :]).astype(a2.dtype),
        daux[8, :].astype(gamma1.dtype),
        daux[9, :].astype(beta1.dtype),
        daux[10, :].astype(gamma2.dtype),
        daux[11, :].astype(beta2.dtype),
    )
