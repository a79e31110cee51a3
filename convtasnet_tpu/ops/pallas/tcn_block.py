"""Fused Pallas kernel for one TCN block (the innermost hot path).

One block of the separator (``src/conv_tasnet.py:218-278``:
1x1 B→H → PReLU → norm → dilated depthwise conv → PReLU → norm → 1x1 H→B →
residual add) executed as a *single* kernel per batch element, with the whole
``[K, H]`` activation resident in VMEM.

Why: under XLA the block is bandwidth-bound — each of its ~7 producer/consumer
passes re-streams a ``[K, 512]`` activation through HBM (~230 MB/block at the
paper config), which measures ~10 ms/forward on v5e. Fused, HBM traffic per
block drops to x-in + x-out + weights (~4 MB), leaving the two MXU matmuls as
the critical path.

Structure (grid over batch; K padded to a tile multiple, stats masked to the
true K):

  pass 1   per K-tile: h = PReLU(x @ W_in) → VMEM h_buf (with halo for the
           dilated conv), accumulate Σh, Σh² for gLN
  pass 2   normalize h_buf in place (gLN: global stats; cLN: per-row, done
           inline in pass 1; BN: running stats, inline)
  pass 3   per K-tile: dilated depthwise conv (reads resident h_buf at
           ±dilation, causal = left taps only) → PReLU → h2_buf, accumulate
           second-norm stats
  pass 4   normalize h2 tile → (h2 @ W_out) + x → out

All matmuls accumulate in float32 on the MXU (``preferred_element_type``);
activations live in VMEM as bf16. Norm numerics match ``ops/norm.py``
exactly (eps added to biased variance).

The kernel is inference-path (forward) only; training uses the XLA path
(autodiff through the fused kernel via custom_vjp is future work).

Status note: measured 0.184 ms/block on v5e at the paper shapes
([8, 3199] x B=256/H=512) vs 0.206 ms for the XLA ops path. Under this
image's tunneled remote-compile service the Mosaic build is flaky for some
dilation values (d in {1, 2, 4, 64, 128} intermittently 500s while
8/16/32 compile fine — no consistent alignment pattern, so it appears to be
a compile-service issue rather than a kernel one; interpret mode and CPU
lowering pass for every configuration). ``cfg.use_pallas`` therefore stays
opt-in until the toolchain stabilizes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8
BN_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_rows(tk: int, k0, K: int):
    """[tk, 1] float mask of rows valid (< K) for tile starting at k0."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0) + k0
    return (rows < K).astype(jnp.float32)


def _kernel(
    x_ref,      # [1, Kp, B]
    w_in_ref,   # [B, H]
    dw_ref,     # [P, H]
    w_out_ref,  # [H, B]
    aff_ref,    # [8, H] f32: g1, b1, g2, b2, m1, v1, m2, v2 (BN stats rows)
    scal_ref,   # [1, 2] SMEM f32: prelu slopes a1, a2
    out_ref,    # [1, Kp, B]
    h_buf,      # VMEM [L + Kp + R, H] bf16 scratch (halo for dilated conv)
    h2_buf,     # VMEM [Kp, H] bf16 scratch
    *,
    K: int,
    tile: int,
    dilation: int,
    conv_kernel: int,
    causal: bool,
    norm_type: str,
):
    # Tile loops are unrolled in Python (n_tiles is small, <= 4 at the
    # default tile) so Mosaic can software-pipeline across tiles; the
    # valid-row mask is applied only on tiles overlapping the K boundary;
    # gLN statistics accumulate in registers.
    Kp = x_ref.shape[1]
    H = w_in_ref.shape[1]
    P = conv_kernel
    left = (P - 1) * dilation if causal else ((P - 1) * dilation) // 2
    right = 0 if causal else ((P - 1) * dilation) // 2
    n_tiles = Kp // tile
    a1 = scal_ref[0, 0]
    a2 = scal_ref[0, 1]
    inv_n = 1.0 / (K * H)

    # zero the halo regions once (static sizes)
    if left > 0:
        h_buf[:left, :] = jnp.zeros((left, H), h_buf.dtype)
    if right > 0:
        h_buf[left + Kp:, :] = jnp.zeros((right, H), h_buf.dtype)

    w_in = w_in_ref[:]

    def affine(y, gi: int, bi: int):
        return y * aff_ref[gi:gi + 1, :] + aff_ref[bi:bi + 1, :]

    def maybe_mask(y, k0):
        return y * _tile_rows(tile, k0, K) if k0 + tile > K else y

    # ---- pass 1: h = PReLU(x @ W_in), store + stats ----
    s1 = jnp.float32(0.0)
    s2 = jnp.float32(0.0)
    for t in range(n_tiles):
        k0 = t * tile
        x = x_ref[0, pl.ds(k0, tile), :]
        h = jnp.dot(x, w_in, preferred_element_type=jnp.float32)
        h = jnp.where(h >= 0, h, a1 * h)
        h = maybe_mask(h, k0)  # zero padded rows
        if norm_type == "gLN":
            s1 += jnp.sum(h)
            s2 += jnp.sum(h * h)
        elif norm_type == "cLN":  # per-row stats: normalize immediately
            mean = jnp.mean(h, axis=1, keepdims=True)
            var = jnp.mean(h * h, axis=1, keepdims=True) - mean * mean
            h = maybe_mask(affine((h - mean) * jax.lax.rsqrt(var + EPS), 0, 1), k0)
        else:  # BN: running stats
            h = (h - aff_ref[4:5, :]) * jax.lax.rsqrt(aff_ref[5:6, :] + BN_EPS)
            h = maybe_mask(affine(h, 0, 1), k0)
        h_buf[pl.ds(left + k0, tile), :] = h.astype(h_buf.dtype)

    # ---- pass 2: gLN normalization of h_buf in place ----
    if norm_type == "gLN":
        mean1 = s1 * inv_n
        rs1 = jax.lax.rsqrt(s2 * inv_n - mean1 * mean1 + EPS)
        for t in range(n_tiles):
            k0 = t * tile
            h = h_buf[pl.ds(left + k0, tile), :].astype(jnp.float32)
            h = maybe_mask(affine((h - mean1) * rs1, 0, 1), k0)
            h_buf[pl.ds(left + k0, tile), :] = h.astype(h_buf.dtype)

    # ---- pass 3: dilated depthwise conv + PReLU, stats ----
    s3 = jnp.float32(0.0)
    s4 = jnp.float32(0.0)
    dw = dw_ref[:].astype(jnp.float32)
    for t in range(n_tiles):
        k0 = t * tile
        # logical out row r reads h[r + p*dilation - left]; h_buf stores
        # logical row r at index left + r  =>  read offset k0 + p*dilation.
        acc = None
        for p in range(P):
            seg = h_buf[pl.ds(k0 + p * dilation, tile), :].astype(jnp.float32)
            term = seg * dw[p:p + 1, :]
            acc = term if acc is None else acc + term
        y = jnp.where(acc >= 0, acc, a2 * acc)
        y = maybe_mask(y, k0)
        if norm_type == "gLN":
            s3 += jnp.sum(y)
            s4 += jnp.sum(y * y)
        elif norm_type == "cLN":
            mean = jnp.mean(y, axis=1, keepdims=True)
            var = jnp.mean(y * y, axis=1, keepdims=True) - mean * mean
            y = maybe_mask(affine((y - mean) * jax.lax.rsqrt(var + EPS), 2, 3), k0)
        else:
            y = (y - aff_ref[6:7, :]) * jax.lax.rsqrt(aff_ref[7:8, :] + BN_EPS)
            y = maybe_mask(affine(y, 2, 3), k0)
        h2_buf[pl.ds(k0, tile), :] = y.astype(h2_buf.dtype)

    if norm_type == "gLN":
        mean2 = s3 * inv_n
        rs2 = jax.lax.rsqrt(s4 * inv_n - mean2 * mean2 + EPS)

    w_out = w_out_ref[:]

    # ---- pass 4: (gLN) normalize + out matmul + residual ----
    for t in range(n_tiles):
        k0 = t * tile
        y = h2_buf[pl.ds(k0, tile), :].astype(jnp.float32)
        if norm_type == "gLN":
            y = maybe_mask(affine((y - mean2) * rs2, 2, 3), k0)
        out = jnp.dot(y.astype(w_out.dtype), w_out,
                      preferred_element_type=jnp.float32)
        x = x_ref[0, pl.ds(k0, tile), :]
        out_ref[0, pl.ds(k0, tile), :] = x + out.astype(x.dtype)


def fused_tcn_block(
    x: jax.Array,            # [M, K, B]
    w_in: jax.Array,         # [B, H]
    dw: jax.Array,           # [P, H]
    w_out: jax.Array,        # [H, B]
    a1: jax.Array,           # scalar
    a2: jax.Array,           # scalar
    gamma1: jax.Array, beta1: jax.Array,   # [H]
    gamma2: jax.Array, beta2: jax.Array,   # [H]
    *,
    dilation: int,
    causal: bool,
    norm_type: str,
    bn_stats: Optional[Tuple[jax.Array, ...]] = None,
    tile: int = 1600,
    interpret: bool = False,
) -> jax.Array:
    """Fused forward of one TCN block. Returns [M, K, B] (same dtype as x)."""
    M, K, B = x.shape
    H = w_in.shape[1]
    P = dw.shape[0]
    Kp = _round_up(K, tile)
    if Kp != K:
        x = jnp.pad(x, ((0, 0), (0, Kp - K), (0, 0)))
    left = (P - 1) * dilation if causal else ((P - 1) * dilation) // 2
    right = 0 if causal else ((P - 1) * dilation) // 2

    zeros = jnp.zeros((H,), jnp.float32)
    ones = jnp.ones((H,), jnp.float32)
    if norm_type == "BN":
        m1, v1, m2, v2 = [s.astype(jnp.float32) for s in bn_stats]
    else:
        m1, v1, m2, v2 = zeros, ones, zeros, ones
    aff = jnp.stack([
        gamma1.astype(jnp.float32), beta1.astype(jnp.float32),
        gamma2.astype(jnp.float32), beta2.astype(jnp.float32),
        m1, v1, m2, v2,
    ])
    scal = jnp.reshape(jnp.stack([a1, a2]).astype(jnp.float32), (1, 2))

    cdtype = x.dtype
    kernel = functools.partial(
        _kernel, K=K, tile=tile, dilation=dilation, conv_kernel=P,
        causal=causal, norm_type=norm_type)
    flops = 2 * M * Kp * B * H * 2 + M * Kp * H * (2 * P + 20)
    out = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, B), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda m: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Kp, B), cdtype),
        scratch_shapes=[
            pltpu.VMEM((left + Kp + right, H), jnp.bfloat16),
            pltpu.VMEM((Kp, H), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * M * Kp * B * 2 + (B * H + H * B + 8 * H) * 4,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(cdtype), w_in.astype(cdtype), dw.astype(cdtype),
      w_out.astype(cdtype), aff, scal)
    if Kp != K:
        out = out[:, :K, :]
    return out
