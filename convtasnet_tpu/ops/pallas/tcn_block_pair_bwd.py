"""Fused Pallas BACKWARD kernel for a PAIR of consecutive TCN blocks.

Training counterpart of ``tcn_block_pair`` (the two-block forward kernel):
one kernel per batch element recomputes BOTH blocks' intermediates in VMEM
from the pair input x0 and emits dx0 plus every weight/affine/slope grad of
both blocks. Relative to the two single-block custom-VJP pairs
(``tcn_block_bwd``), the pair internalizes three [K, B] HBM round-trips per
fused boundary:

- forward: the inter-block residual x1 (write + read) — already saved by
  the pair forward kernel, which grad would otherwise re-expose as a
  residual;
- backward: the boundary cotangent dx1 (write + read) and the x1 residual
  read — both now live in [Kp, B] VMEM scratches.

The price is ONE extra [K, B] x [B, H]-class matmul (re-forming x1 from the
recomputed block-1 conv output; the single-block backward gets its input
for free from the residual) — ~8% more MXU work against three fewer
boundary streams plus two fewer kernel launches per pair.

Pass structure (gLN; grid over batch, K padded to a tile multiple, stats in
f32; per-block math identical to ``tcn_block_bwd._bwd_kernel`` with the
``recompute`` dhn2 strategy — no e_buf, the pair's VMEM budget goes to the
second block's buffers instead):

  A1  recompute h_pre1 = x0 @ W_in1 → h1_buf; gLN stats
  A2  recompute c1 = dwconv(gLN(prelu(h_pre1))) → c1_buf; gLN stats
  A3  x1 = x0 + gLN2(prelu(c1)) @ W_out1 → x1_buf        (the extra matmul;
      gLN2 folded into W_out exactly like the forward kernel)
  B1/B2  same recompute for block 2 from x1_buf → h2_buf, c2_buf
  C1..C4 block-2 backward (= ``_bwd_kernel`` P3..P6) reading g_ref,
      writing the boundary cotangent dx1 → g1_buf
  D1..D4 block-1 backward reading g1_buf, writing dx0 → dx_ref

The cLN variant mirrors ``_bwd_kernel_cln``: per-row stats make every norm
backward row-local, so each block's backward collapses to two passes and
the recompute stage needs no separate x1 pass (the conv output normalizes
and projects tile-locally). Reference scope: this is the backward of the
reference's hot loop (``src/conv_tasnet.py:218-278`` under
``loss.backward()``); the reference has no kernel, torch autodiff streams
every intermediate through HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convtasnet_tpu.ops.pallas.tcn_block_bwd import _rows_mask

EPS = 1e-8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pair_bwd_kernel(
    x_ref,       # [1, Kp, B] pair input x0
    g_ref,       # [1, Kp, B] cotangent of the pair output x2
    w_in1_ref, dw1_ref, w_out1_ref,    # block 1 weights
    w_in2_ref, dw2_ref, w_out2_ref,    # block 2 weights
    aff_ref,     # [8, H] f32: g1a b1a g2a b2a g1b b1b g2b b2b
    scal_ref,    # [1, 4] SMEM f32: a1a a2a a1b a2b
    dx_ref,      # [1, Kp, B]
    dwin1_ref, dwout1_ref, daux1_ref,  # block 1 weight grads (f32, summed
    dwin2_ref, dwout2_ref, daux2_ref,  # over the batch grid); daux layout
                                       # matches tcn_block_bwd
    h1_buf,      # VMEM [(P-1)d1 + Kp, H] — h_pre1
    c1_buf,      # VMEM [(P-1)d1 + Kp, H] — c1 / dc1 / dhn1_1
    h2_buf,      # VMEM [(P-1)d2 + Kp, H] — h_pre2
    c2_buf,      # VMEM [(P-1)d2 + Kp, H] — c2 / dc2 / dhn1_2
    x1_buf,      # VMEM [Kp, B] — recomputed inter-block residual
    g1_buf,      # VMEM [Kp, B] — boundary cotangent dx1
    *,
    K: int,
    tile: int,
    d1: int,
    d2: int,
    conv_kernel: int,
    causal: bool,
):
    m = pl.program_id(0)
    Kp = x_ref.shape[1]
    H = w_in1_ref.shape[1]
    P = conv_kernel
    n_tiles = Kp // tile
    inv_n = 1.0 / (K * H)
    mdtype = x_ref.dtype
    cdtype = h1_buf.dtype

    def prelu(v, a):
        return jnp.where(v >= 0, v, a * v)

    def maybe_mask(y, k0):
        return y * _rows_mask(tile, k0, 0, K) if k0 + tile > K else y

    def recompute_block(read_x, h_buf, c_buf, w_in_ref, dw_ref, row0: int,
                        a1, d: int):
        """A1+A2: fill h_buf with h_pre and c_buf with the conv output c;
        returns the gLN fold constants the backward passes reuse
        (s_vec, b_vec, mean1, rs1, mean2, rs2, dw f32)."""
        left = (P - 1) * d if causal else ((P - 1) * d) // 2
        pad_l = (P - 1) * d - left
        w_in = w_in_ref[:]
        g1 = aff_ref[row0:row0 + 1, :]
        b1 = aff_ref[row0 + 1:row0 + 2, :]

        if left > 0:
            h_buf[:left, :] = jnp.zeros((left, H), cdtype)
        if (P - 1) * d - left > 0:
            h_buf[left + Kp:, :] = jnp.zeros(((P - 1) * d - left, H), cdtype)
        if pad_l > 0:
            c_buf[:pad_l, :] = jnp.zeros((pad_l, H), cdtype)
        if (P - 1) * d - pad_l > 0:
            c_buf[pad_l + Kp:, :] = jnp.zeros(
                ((P - 1) * d - pad_l, H), cdtype)

        s1 = jnp.float32(0.0)
        s2 = jnp.float32(0.0)
        for t in range(n_tiles):
            k0 = t * tile
            x = read_x(k0)
            hp = jnp.dot(x, w_in, preferred_element_type=jnp.float32)
            hp = maybe_mask(hp, k0)
            h1 = prelu(hp, a1)
            s1 += jnp.sum(h1)
            s2 += jnp.sum(h1 * h1)
            h_buf[pl.ds(left + k0, tile), :] = hp.astype(cdtype)
        mean1 = s1 * inv_n
        rs1 = jax.lax.rsqrt(s2 * inv_n - mean1 * mean1 + EPS)
        s_vec = rs1 * g1
        b_vec = b1 - mean1 * s_vec
        dw = dw_ref[:].astype(jnp.float32)
        dw_eff = dw * s_vec
        bias = b_vec * jnp.sum(dw, axis=0, keepdims=True)

        def h1_read(k0, p):
            return prelu(
                h_buf[pl.ds(k0 + p * d, tile), :].astype(jnp.float32), a1)

        def edge_tile(k0):
            return (k0 - left < 0) or (k0 + tile - 1 + (P - 1) * d - left >= K)

        def conv_tile(k0):
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

        s3 = jnp.float32(0.0)
        s4 = jnp.float32(0.0)
        for t in range(n_tiles):
            k0 = t * tile
            c = maybe_mask(conv_tile(k0), k0)
            h2 = prelu(c, scal_ref[0, 1] if row0 == 0 else scal_ref[0, 3])
            s3 += jnp.sum(h2)
            s4 += jnp.sum(h2 * h2)
            c_buf[pl.ds(pad_l + k0, tile), :] = c.astype(cdtype)
        mean2 = s3 * inv_n
        rs2 = jax.lax.rsqrt(s4 * inv_n - mean2 * mean2 + EPS)
        return (s_vec, b_vec, mean1, rs1, mean2, rs2, dw,
                h1_read, edge_tile, left, pad_l)

    def backward_block(read_x, read_g, write_dx, h_buf, c_buf,
                       w_in_ref, w_out_ref, fold, row0: int, a1, a2,
                       d: int, dwin_ref, dwout_ref, daux_ref):
        """C1..C4 / D1..D4: one block's backward (= _bwd_kernel P3..P6,
        recompute-dhn2 strategy) reading the recompute-stage buffers."""
        (s_vec, b_vec, mean1, rs1, mean2, rs2, dw,
         h1_read, edge_tile, left, pad_l) = fold
        w_in = w_in_ref[:]
        w_out = w_out_ref[:]
        g1 = aff_ref[row0:row0 + 1, :]
        g2 = aff_ref[row0 + 2:row0 + 3, :]
        b2 = aff_ref[row0 + 3:row0 + 4, :]

        def dhn2_tile(k0):
            gt = read_g(k0)
            return jax.lax.dot_general(
                gt, w_out, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # ---- C1: dhn2 reductions + dW_out ----
        t1 = jnp.float32(0.0)
        t2 = jnp.float32(0.0)
        dg2 = jnp.zeros((1, H), jnp.float32)
        db2 = jnp.zeros((1, H), jnp.float32)
        dwout_acc = jnp.zeros(dwout_ref.shape, jnp.float32)
        for t in range(n_tiles):
            k0 = t * tile
            gt = read_g(k0)
            dhn2 = dhn2_tile(k0)
            c = c_buf[pl.ds(pad_l + k0, tile), :].astype(jnp.float32)
            hhat2 = (prelu(c, a2) - mean2) * rs2
            hn2 = g2 * hhat2 + b2
            dwout_acc += jax.lax.dot_general(
                hn2.astype(mdtype), gt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gdh = g2 * dhn2
            t1 += jnp.sum(gdh)
            t2 += jnp.sum(gdh * hhat2)
            dg2 += jnp.sum(dhn2 * hhat2, axis=0, keepdims=True)
            db2 += jnp.sum(dhn2, axis=0, keepdims=True)
        t1n = t1 * inv_n
        t2n = t2 * inv_n

        # ---- C2: dh2 -> dc (over c in place) ----
        da2 = jnp.zeros((1, H), jnp.float32)
        for t in range(n_tiles):
            k0 = t * tile
            dhn2 = dhn2_tile(k0)
            c = c_buf[pl.ds(pad_l + k0, tile), :].astype(jnp.float32)
            hhat2 = (prelu(c, a2) - mean2) * rs2
            dh2 = rs2 * (g2 * dhn2 - t1n - hhat2 * t2n)
            dh2 = maybe_mask(dh2, k0)
            da2 += jnp.sum(dh2 * jnp.minimum(c, 0.0), axis=0, keepdims=True)
            dc = dh2 * jnp.where(c >= 0, 1.0, a2)
            c_buf[pl.ds(pad_l + k0, tile), :] = dc.astype(cdtype)

        # ---- C3: conv transpose + dw grads + gLN1 backward reductions ----
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

        # ---- C4: dh1 -> dh_pre -> dx, dW_in ----
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
            x = read_x(k0)
            dx = jax.lax.dot_general(
                dhp, w_in, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            gt = read_g(k0)
            write_dx(k0, (gt.astype(jnp.float32) + dx))
            dwin_acc += jax.lax.dot_general(
                x, dhp, (((0,), (0,)), ((), ())),
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

    a1a = scal_ref[0, 0]
    a2a = scal_ref[0, 1]
    a1b = scal_ref[0, 2]
    a2b = scal_ref[0, 3]

    def read_x0(k0):
        return x_ref[0, pl.ds(k0, tile), :]

    def read_g(k0):
        return g_ref[0, pl.ds(k0, tile), :]

    def read_x1(k0):
        return x1_buf[pl.ds(k0, tile), :]

    def read_g1(k0):
        return g1_buf[pl.ds(k0, tile), :]

    # ---- stage A: recompute block 1, form x1 ----
    fold1 = recompute_block(read_x0, h1_buf, c1_buf, w_in1_ref, dw1_ref,
                            0, a1a, d1)
    (_, _, _, _, mean2a, rs2a, _, _, _, _, pad_l1) = fold1
    g2a = aff_ref[2:3, :]
    b2a = aff_ref[3:4, :]
    s2_vec = rs2a * g2a
    b2_vec = b2a - mean2a * s2_vec
    w_out1 = w_out1_ref[:]
    w_eff1 = (w_out1.astype(jnp.float32)
              * jnp.transpose(s2_vec)).astype(w_out1.dtype)
    const1 = jnp.dot(b2_vec.astype(w_out1.dtype), w_out1,
                     preferred_element_type=jnp.float32)
    for t in range(n_tiles):
        k0 = t * tile
        c = c1_buf[pl.ds(pad_l1 + k0, tile), :].astype(jnp.float32)
        y = maybe_mask(prelu(c, a2a), k0)
        out = jnp.dot(y.astype(mdtype), w_eff1,
                      preferred_element_type=jnp.float32) + const1
        out = maybe_mask(out, k0)
        xv = read_x0(k0)
        # same rounding as the pair forward kernel: cast the projection to
        # the residual dtype, then add — the recomputed x1 must match the
        # primal's x1 bit-for-bit at bf16
        x1_buf[pl.ds(k0, tile), :] = xv + out.astype(xv.dtype)

    # ---- stage B: recompute block 2 from x1 ----
    fold2 = recompute_block(read_x1, h2_buf, c2_buf, w_in2_ref, dw2_ref,
                            4, a1b, d2)

    def write_g1(k0, v):
        g1_buf[pl.ds(k0, tile), :] = v.astype(mdtype)

    def write_dx0(k0, v):
        dx_ref[0, pl.ds(k0, tile), :] = v.astype(dx_ref.dtype)

    # ---- stage C: block-2 backward, boundary cotangent dx1 -> g1_buf ----
    backward_block(read_x1, read_g, write_g1, h2_buf, c2_buf,
                   w_in2_ref, w_out2_ref, fold2, 4, a1b, a2b, d2,
                   dwin2_ref, dwout2_ref, daux2_ref)

    # ---- stage D: block-1 backward -> dx0 ----
    backward_block(read_x0, read_g1, write_dx0, h1_buf, c1_buf,
                   w_in1_ref, w_out1_ref, fold1, 0, a1a, a2a, d1,
                   dwin1_ref, dwout1_ref, daux1_ref)


def fused_tcn_block_pair_bwd(
    x: jax.Array,            # [M, K, B] pair input (the only residual)
    g: jax.Array,            # [M, K, B] cotangent of the pair output
    params_a: Tuple[jax.Array, ...],   # (w_in, dw, w_out, a1, a2, g1, b1,
    params_b: Tuple[jax.Array, ...],   #  g2, b2) per block
    *,
    d1: int,
    d2: int,
    causal: bool,
    norm_type: str = "gLN",
    tile: int = 1600,
    interpret: bool = False,
    s_dtype=None,
) -> Tuple[jax.Array, Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
    """Fused backward of two consecutive TCN blocks (gLN).

    Returns ``(dx, grads_a, grads_b)`` where each ``grads_*`` is the
    9-tuple ``(dW_in, d_dw, dW_out, da1, da2, dγ1, dβ1, dγ2, dβ2)`` with
    dtypes matching the primals. ``s_dtype``: dtype of the four [Kp+halo, H]
    activation scratches (default x.dtype; f32 under bf16 compute drops the
    converts on scratch traffic — the ``pair_f32`` probe variants).
    """
    if norm_type != "gLN":
        raise ValueError("fused pair backward supports gLN only")
    M, K, B = x.shape
    w_in1, dw1, w_out1, a1a, a2a, g1a, b1a, g2a, b2a = params_a
    w_in2, dw2, w_out2, a1b, a2b, g1b, b1b, g2b, b2b = params_b
    H = w_in1.shape[1]
    P = dw1.shape[0]
    assert P <= 8, "daux layout packs d_dw rows 0..7"
    Kp = _round_up(K, tile)
    if Kp != K:
        pad = ((0, 0), (0, Kp - K), (0, 0))
        x = jnp.pad(x, pad)
        g = jnp.pad(g, pad)
    cdtype = x.dtype
    sdtype = jnp.dtype(s_dtype) if s_dtype is not None else jnp.dtype(cdtype)

    aff = jnp.stack([s.astype(jnp.float32)
                     for s in (g1a, b1a, g2a, b2a, g1b, b1b, g2b, b2b)])
    scal = jnp.reshape(
        jnp.stack([a1a, a2a, a1b, a2b]).astype(jnp.float32), (1, 4))

    kernel = functools.partial(
        _pair_bwd_kernel, K=K, tile=tile, d1=d1, d2=d2, conv_kernel=P,
        causal=causal)
    halo1 = (P - 1) * d1
    halo2 = (P - 1) * d2
    # 13 tile-level matmuls (A1/A3/B1 + 5 per block backward) + VPU work
    flops = 13 * 2 * M * Kp * B * H + 2 * M * Kp * H * (4 * P + 40)
    wspec = pl.BlockSpec((B, H), lambda m: (0, 0), memory_space=pltpu.VMEM)
    dwspec = pl.BlockSpec((P, H), lambda m: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((H, B), lambda m: (0, 0), memory_space=pltpu.VMEM)
    gradspecs = (
        pl.BlockSpec((B, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, B), lambda m: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((16, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
    )
    gradshapes = (
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((H, B), jnp.float32),
        jax.ShapeDtypeStruct((16, H), jnp.float32),
    )
    dx, dwin1, dwout1, daux1, dwin2, dwout2, daux2 = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, dwspec, ospec, wspec, dwspec, ospec,
            pl.BlockSpec((8, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda m: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
        ) + gradspecs + gradspecs,
        out_shape=(
            jax.ShapeDtypeStruct((M, Kp, B), cdtype),
        ) + gradshapes + gradshapes,
        scratch_shapes=[
            pltpu.VMEM((halo1 + Kp, H), sdtype),
            pltpu.VMEM((halo1 + Kp, H), sdtype),
            pltpu.VMEM((halo2 + Kp, H), sdtype),
            pltpu.VMEM((halo2 + Kp, H), sdtype),
            pltpu.VMEM((Kp, B), cdtype),
            pltpu.VMEM((Kp, B), cdtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * M * Kp * B * jnp.dtype(cdtype).itemsize
            + 2 * (2 * B * H + 20 * H) * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x.astype(cdtype), g.astype(cdtype),
      w_in1.astype(cdtype), dw1.astype(cdtype), w_out1.astype(cdtype),
      w_in2.astype(cdtype), dw2.astype(cdtype), w_out2.astype(cdtype),
      aff, scal)
    if Kp != K:
        dx = dx[:, :K, :]

    def unpack(dwin, dwout, daux, pa):
        w_in, dw, w_out, a1, a2, g1, b1, g2, b2 = pa
        return (
            dwin.astype(w_in.dtype),
            daux[:P, :].astype(dw.dtype),
            dwout.astype(w_out.dtype),
            jnp.sum(daux[12, :]).astype(a1.dtype),
            jnp.sum(daux[13, :]).astype(a2.dtype),
            daux[8, :].astype(g1.dtype),
            daux[9, :].astype(b1.dtype),
            daux[10, :].astype(g2.dtype),
            daux[11, :].astype(b2.dtype),
        )

    return (dx, unpack(dwin1, dwout1, daux1, params_a),
            unpack(dwin2, dwout2, daux2, params_b))
