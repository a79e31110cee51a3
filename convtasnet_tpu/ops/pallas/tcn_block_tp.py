"""Fused TCN block under tensor (channel) parallelism.

The single-chip fused block (``tcn_block.py``) cannot run under a Megatron
hidden-dim split: gLN statistics reduce over the FULL hidden dimension
mid-block, and a ``pallas_call`` is a custom call GSPMD cannot partition.
This module is the explicit per-shard decomposition — the TCN analogue of
``parallel/dpt_tp.py``'s partial sublayer kernels. One block per shard
(shard width ``Hs = H / n_model``) splits at the two gLN stat boundaries:

  stage 1 (XLA)      h = PReLU(x @ W_in_s)  + partial (Σh, Σh²)
                     — a single matmul+elementwise+reduce: XLA already emits
                     this as one fusion with optimal HBM traffic, so there
                     is nothing for a kernel to win here.
  psum               global gLN-1 stats (2 scalars/sample over ``model``).
  stage 2 (Pallas)   the whole remaining block body in ONE kernel pass:
                     gLN-1 folds into the conv taps (``dw·s``, halo filled
                     with the value that normalizes to zero), dilated
                     depthwise conv + PReLU, partial (Σy, Σy²) for gLN-2,
                     and the γ2-scaled partial output projection
                     ``z = (y·γ2) @ W_out_s``. The gLN-2 affine is LINEAR
                     in the conv output given its stats, so the partial
                     matmul happens BEFORE the stats are known:
                       norm2(y) @ W_out = rs2·(y·γ2)@W − μ2·rs2·(γ2@W) + β2@W
                     and the scalar fold moves outside the kernel.
  psum               one combined all-reduce carries ``z`` (the Megatron
                     g-operator — required by ANY TP decomposition), the two
                     gLN-2 scalars, and the tiny ``γ2@W`` / ``β2@W`` row
                     vectors.
  epilogue (XLA)     out = x + rs2·z − μ2·rs2·w1 + w0   (per-sample scalars).

Per block per shard the fused stage 2 reads ``h`` once and writes ``z``
once; the XLA lowering of the same math round-trips the ``[K, Hs]``
activation through HBM several times (conv im2col/pad, PReLU, stat
reduces, scale, matmul). Collectives: 2 small + 1 large psum per block vs
7 for the naive per-norm psum path (``tensor_parallel._norm_tp``).

Probe discipline matches ``dpt_tp``: ``ensure_probed_tcn_tp`` AOT-compiles
each stage-2 candidate at the LOCAL width, numerics-gates it on-device
against the XLA stage 2, races on time, and persists winners under
``tcn:tp:*`` keys. An unprobed or losing dilation runs the XLA stage 2
inside the unchanged shard_map — the parallel decomposition never varies,
only the per-shard implementation.

Reference parity: the reference has no tensor parallelism
(``src/conv_tasnet.py`` — its 11M-param model does not need it); this is a
TPU-native scaling capability for wider TCN variants (SURVEY §2
parallelism rows).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convtasnet_tpu.ops.pallas.tcn_block import _round_up, _tile_rows

EPS = 1e-8


# --------------------------------------------------------------------------
# Canonical decomposition pieces (shared by the fused and XLA stage 2).
# --------------------------------------------------------------------------

def tp_stage1(x: jax.Array, w_in: jax.Array, a1: jax.Array
              ) -> Tuple[jax.Array, jax.Array]:
    """``h = PReLU(x @ W_in_s)`` plus per-sample partial gLN-1 sums.

    x: [M, K, B]; w_in: [B, Hs] (this shard's columns). Returns
    ``(h [M, K, Hs] in x.dtype, sums [M, 2] f32)``. One XLA fusion —
    matmul, PReLU and the stat reduce share a single pass over ``h``.
    """
    h = jnp.einsum("mkb,bh->mkh", x, w_in.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    h = jnp.where(h >= 0, h, a1.astype(jnp.float32) * h)
    sums = jnp.stack(
        [jnp.sum(h, axis=(1, 2)), jnp.sum(h * h, axis=(1, 2))], axis=-1)
    return h.astype(x.dtype), sums


def stats_from_sums(sums: jax.Array, n: int) -> jax.Array:
    """Globally-psummed ``[M, 2]`` (Σ, Σ²) -> ``[M, 2]`` (mean, rsqrt).

    ``n`` is the GLOBAL element count per sample (K · H); eps added to the
    biased variance exactly as ``ops/norm.py`` does.
    """
    mean = sums[:, 0] / n
    var = sums[:, 1] / n - mean * mean
    return jnp.stack([mean, jax.lax.rsqrt(var + EPS)], axis=-1)


def tp_epilogue(x: jax.Array, z: jax.Array, stats2: jax.Array,
                w1: jax.Array, w0: jax.Array) -> jax.Array:
    """Fold the globally-psummed pieces into the block output.

    ``out = x + rs2·z − μ2·rs2·w1 + w0`` with ``z = Σ_s (y·γ2) @ W_out_s``,
    ``w1 = γ2 @ W_out``, ``w0 = β2 @ W_out`` (both [B], already psummed).
    """
    mean2 = stats2[:, 0][:, None, None]
    rs2 = stats2[:, 1][:, None, None]
    out = (rs2 * z.astype(jnp.float32)
           - (mean2 * rs2) * w1[None, None, :] + w0[None, None, :])
    return x + out.astype(x.dtype)


def xla_tp_stage2(
    h: jax.Array,        # [M, K, Hs]
    stats1: jax.Array,   # [M, 2] f32: mean1, rs1 (global)
    dw: jax.Array,       # [P, Hs]
    w_out: jax.Array,    # [Hs, B]
    a2: jax.Array,
    gamma1: jax.Array, beta1: jax.Array, gamma2: jax.Array,  # [Hs]
    *,
    dilation: int,
    causal: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Stage 2 through plain XLA ops — the fallback implementation and the
    probe's numerics reference. Same math as the kernel: fold gLN-1's
    affine, dilated depthwise conv, PReLU, partial gLN-2 sums, γ2-scaled
    partial projection."""
    from convtasnet_tpu.ops.conv import depthwise_conv1d

    mean1 = stats1[:, 0][:, None, None]
    rs1 = stats1[:, 1][:, None, None]
    hf = h.astype(jnp.float32)
    n1 = ((hf - mean1) * rs1 * gamma1.astype(jnp.float32)
          + beta1.astype(jnp.float32)).astype(h.dtype)
    y = depthwise_conv1d(n1, dw.astype(h.dtype), dilation, causal)
    yf = y.astype(jnp.float32)
    a2f = a2.astype(jnp.float32)
    yf = jnp.where(yf >= 0, yf, a2f * yf)
    sums = jnp.stack(
        [jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))], axis=-1)
    yg = (yf * gamma2.astype(jnp.float32)).astype(h.dtype)
    z = jnp.einsum("mkh,hb->mkb", yg, w_out.astype(h.dtype),
                   preferred_element_type=jnp.float32).astype(h.dtype)
    return z, sums


# --------------------------------------------------------------------------
# The fused stage-2 kernel.
# --------------------------------------------------------------------------

def _tp2_kernel(
    h_ref,      # [1, Kp, Hs]
    dw_ref,     # [P, Hs]
    w_out_ref,  # [Hs, B]
    aff_ref,    # [3, Hs] f32: gamma1, beta1, gamma2
    stat_ref,   # [1, 1, 2] SMEM f32: mean1, rs1 (per sample; the unit
                #   middle dim keeps the block's last-two dims equal to
                #   the array's — Mosaic-legal for any M, jax 0.9.0 rule)
    scal_ref,   # [1, 1] SMEM f32: a2
    z_ref,      # [1, Kp, B]
    s_ref,      # [1, 2, 128] f32: rows broadcast sum y / sum y^2
    h_buf,      # VMEM [left + Kp + right, Hs]
    *,
    K: int,
    tile: int,
    dilation: int,
    conv_kernel: int,
    causal: bool,
):
    Kp = h_ref.shape[1]
    Hs = h_ref.shape[2]
    P = conv_kernel
    left = (P - 1) * dilation if causal else ((P - 1) * dilation) // 2
    right = 0 if causal else ((P - 1) * dilation) // 2
    n_tiles = Kp // tile
    a2 = scal_ref[0, 0]
    mean1 = stat_ref[0, 0, 0]
    rs1 = stat_ref[0, 0, 1]

    # gLN-1 fold (same algebra as the single-chip kernel, tcn_block.py
    # pass 2): conv(s·h + b) = Σ_p (w_p·s) h[k+pd] + b·Σ_p w_p, with the
    # halo and K..Kp tail filled with c = −b/s — the value that normalizes
    # to zero, so out-of-range taps contribute exactly what zero padding
    # contributes in the unfused math.
    s_vec = rs1 * aff_ref[0:1, :]                      # [1, Hs]
    b_vec = aff_ref[1:2, :] - mean1 * s_vec
    c_fill = jnp.where(s_vec != 0,
                       -b_vec / jnp.where(s_vec != 0, s_vec, 1.0), 0.0)
    dw = dw_ref[:].astype(jnp.float32)
    dw_eff = dw * s_vec
    bias = b_vec * jnp.sum(dw, axis=0, keepdims=True)  # [1, Hs]
    gamma2 = aff_ref[2:3, :]
    w_out = w_out_ref[:]

    if left > 0:
        h_buf[:left, :] = jnp.broadcast_to(
            c_fill, (left, Hs)).astype(h_buf.dtype)
    n_tail = right + (Kp - K)
    if n_tail > 0:
        h_buf[left + K:, :] = jnp.broadcast_to(
            c_fill, (n_tail, Hs)).astype(h_buf.dtype)
    for t in range(n_tiles):
        k0 = t * tile
        if k0 >= K:
            break  # fully-padded tile: already c_fill
        seg = h_ref[0, pl.ds(k0, tile), :]
        if k0 + tile > K:  # boundary tile: keep the c_fill rows
            keep = _tile_rows(tile, k0, K)
            seg = (seg.astype(jnp.float32) * keep
                   + (1.0 - keep) * c_fill).astype(h_buf.dtype)
        h_buf[pl.ds(left + k0, tile), :] = seg.astype(h_buf.dtype)

    s1 = jnp.float32(0.0)
    s2 = jnp.float32(0.0)
    for t in range(n_tiles):
        k0 = t * tile
        acc = bias
        for p in range(P):
            seg = h_buf[pl.ds(k0 + p * dilation, tile), :].astype(jnp.float32)
            acc = acc + seg * dw_eff[p:p + 1, :]
        y = jnp.where(acc >= 0, acc, a2 * acc)
        if k0 + tile > K:
            y = y * _tile_rows(tile, k0, K)
        s1 += jnp.sum(y)
        s2 += jnp.sum(y * y)
        yg = (y * gamma2).astype(w_out.dtype)
        z = jnp.dot(yg, w_out, preferred_element_type=jnp.float32)
        z_ref[0, pl.ds(k0, tile), :] = z.astype(z_ref.dtype)
    # scalar sums as broadcast [1, 128] rows (lane-friendly stores; the
    # wrapper reads lane 0) — same packing style as tcn_block_bwd.py
    s_ref[0, :, :] = jnp.concatenate(
        [jnp.full((1, 128), s1, jnp.float32),
         jnp.full((1, 128), s2, jnp.float32)], axis=0)


def fused_tp_stage2(
    h: jax.Array,        # [M, K, Hs]
    stats1: jax.Array,   # [M, 2] f32
    dw: jax.Array,       # [P, Hs]
    w_out: jax.Array,    # [Hs, B]
    a2: jax.Array,
    gamma1: jax.Array, beta1: jax.Array, gamma2: jax.Array,
    *,
    dilation: int,
    causal: bool,
    tile: int = 1600,
    h_dtype=None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused stage 2: one VMEM-resident pass per sample. Returns
    ``(z [M, K, B], sums [M, 2] f32)`` — bit-comparable to
    ``xla_tp_stage2`` up to dtype rounding (the probe's numerics gate
    enforces it on-device)."""
    M, K, Hs = h.shape
    B = w_out.shape[1]
    P = dw.shape[0]
    Kp = _round_up(K, tile)
    if Kp != K:
        h = jnp.pad(h, ((0, 0), (0, Kp - K), (0, 0)))
    left = (P - 1) * dilation if causal else ((P - 1) * dilation) // 2
    right = 0 if causal else ((P - 1) * dilation) // 2

    aff = jnp.stack([gamma1.astype(jnp.float32), beta1.astype(jnp.float32),
                     gamma2.astype(jnp.float32)])
    scal = jnp.reshape(a2.astype(jnp.float32), (1, 1))
    cdtype = h.dtype
    sdtype = jnp.dtype(h_dtype) if h_dtype is not None else jnp.dtype(cdtype)

    kernel = functools.partial(
        _tp2_kernel, K=K, tile=tile, dilation=dilation, conv_kernel=P,
        causal=causal)
    flops = 2 * M * Kp * Hs * B + M * Kp * Hs * (2 * P + 8)
    z, sums = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, Kp, Hs), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, Hs), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hs, B), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Hs), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda m: (m, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda m: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, Kp, B), cdtype),
            jax.ShapeDtypeStruct((M, 2, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((left + Kp + right, Hs), sdtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=M * Kp * (Hs + B) * 2 + (P + 3 + Hs) * Hs * 4,
            transcendentals=0),
        # same MSA note as the single-chip kernel (tcn_block.py): a large
        # declared budget keeps XLA from homing the [M, Kp, B] output in
        # VMEM next to the kernel's working set.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(h.astype(cdtype), dw.astype(cdtype), w_out.astype(cdtype), aff,
      stats1.astype(jnp.float32).reshape(M, 1, 2), scal)
    if Kp != K:
        z = z[:, :K, :]
    return z, sums[:, :, 0]


# --------------------------------------------------------------------------
# Custom-VJP pair: training through the fused stage 2.
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def tp_stage2_ad(static, h, stats1, dw, w_out, a2, gamma1, beta1, gamma2):
    """Stage 2 with a custom VJP for the TP TRAIN step.

    Forward runs the fused kernel when ``static = (dilation, causal,
    variant, interpret)`` carries a probed variant (else the XLA stage 2);
    backward rematerializes through XLA autodiff of the mathematically
    identical ``xla_tp_stage2`` at the saved inputs — the standard remat
    backward for a Pallas forward. ``ensure_probed_tcn_tp(...,
    train=True)`` verifies every cotangent against plain autodiff
    on-device and only records a win when fused-fwd + remat-bwd beats XLA
    autodiff end-to-end, so a variant that wins the forward race but loses
    after the recompute never engages in training.
    """
    dilation, causal, variant, interpret = static
    if variant is not None:
        tile, hdt = tp_variant_params(variant)
        kw = {"tile": tile} if tile is not None else {}
        return fused_tp_stage2(h, stats1, dw, w_out, a2, gamma1, beta1,
                               gamma2, dilation=dilation, causal=causal,
                               h_dtype=hdt, interpret=interpret, **kw)
    return xla_tp_stage2(h, stats1, dw, w_out, a2, gamma1, beta1, gamma2,
                         dilation=dilation, causal=causal)


def _tp_stage2_fwd(static, h, stats1, dw, w_out, a2, gamma1, beta1, gamma2):
    out = tp_stage2_ad(static, h, stats1, dw, w_out, a2, gamma1, beta1,
                       gamma2)
    return out, (h, stats1, dw, w_out, a2, gamma1, beta1, gamma2)


def _tp_stage2_bwd(static, res, ct):
    dilation, causal = static[0], static[1]
    _, vjp = jax.vjp(
        functools.partial(xla_tp_stage2, dilation=dilation, causal=causal),
        *res)
    return vjp(ct)


tp_stage2_ad.defvjp(_tp_stage2_fwd, _tp_stage2_bwd)


# --------------------------------------------------------------------------
# Probe / autotune registry (same discipline as dpt_tp / tcn_block).
# --------------------------------------------------------------------------

# (dilation, K, Hs, B, causal, dt) -> "t<tile>[_f32]" | None (XLA stage 2)
_TCN_TP_READY: dict = {}
# same key -> True | None: whether the fused custom-VJP pair beat XLA
# autodiff (and matched its cotangents) for the TRAIN step
_TCN_TP_TRAIN: dict = {}
_TCN_TP_PROBED: set = set()


def tcn_tp_ready(dilation: int, K: int, Hs: int, B: int, causal: bool,
                 dt: str, interpret: bool) -> Optional[str]:
    """Trace-time gate for the fused stage 2 at local TP widths. Interpret
    mode engages unconditionally (correctness testing); on a real backend
    the shape must have been probed by ``ensure_probed_tcn_tp``."""
    if interpret:
        return "auto"
    return _TCN_TP_READY.get((dilation, K, Hs, B, causal, dt))


def tcn_tp_train_ready(dilation: int, K: int, Hs: int, B: int, causal: bool,
                       dt: str) -> bool:
    """Whether the fused custom-VJP stage-2 pair won the TRAIN probe for
    this shape (``ensure_probed_tcn_tp(..., train=True)``). Never true in
    interpret mode — Pallas' HLO-interpreter internals can't trace under
    the vma-checked train shard_map."""
    return _TCN_TP_TRAIN.get(
        ("tcn-tp-train", dilation, K, Hs, B, causal, dt)) is not None


def tp_variant_params(variant) -> Tuple[Optional[int], Optional[object]]:
    """Decode a registry variant name to ``(tile, h_dtype)`` kwargs."""
    if variant in (None, "auto"):
        return None, None
    name = variant[1:]  # strip leading "t"
    t, _, suffix = name.partition("_")
    return int(t), (jnp.float32 if suffix == "f32" else None)


def _candidate_tiles(K: int) -> list:
    tiles = [1600, 800]
    return [t for t in tiles if _round_up(K, t) // t <= 8] or [1600]


def ensure_probed_tcn_tp(cfg, n_model: int, batch: int, T: int,
                         verbose: bool = True, train: bool = False) -> None:
    """Probe the fused stage-2 kernel at the local width an ``n_model``-way
    hidden split produces, for a per-device ``[batch, T]`` input
    (idempotent; no-op on CPU / non-gLN / unaligned widths). Winners
    persist in the shared autotune cache under ``tcn:tp:*`` keys.

    ``train=True`` additionally probes the custom-VJP pair
    (``tp_stage2_ad``: fused fwd + remat bwd) per dilation that has a
    forward winner — all 8 cotangents verified against XLA autodiff
    on-device, then raced end-to-end — recording go/no-go under
    ``tcn:tp:train:*`` keys for ``tcn_tp_train_ready``.

    Runs on a single device: a TP shard executes exactly this shape, so
    one chip's probe validates and times what every shard will run.
    """
    import numpy as np

    from convtasnet_tpu.ops.pallas import probe_budget
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
        _numerics_tol,
        _race,
        _rel_err_device,
    )

    if (not getattr(cfg, "use_pallas", False)
            or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "tcn"
            or cfg.norm_type != "gLN"):
        return
    H, B, P = cfg.hidden, cfg.bottleneck, cfg.conv_kernel
    if n_model <= 1 or H % n_model:
        return
    Hs = H // n_model
    if Hs % 128:
        return  # lane-unaligned shard width: XLA stage 2 throughout
    K = (T - cfg.kernel_size) // cfg.stride + 1
    dtype = jnp.dtype(cfg.compute_dtype)
    dt = str(dtype)
    shape_tag = f"{batch}:{K}:{Hs}:{B}:{int(cfg.causal)}:{dt}"
    if shape_tag in _TCN_TP_PROBED and (
            not train or shape_tag + ":train" in _TCN_TP_PROBED):
        return
    rng = np.random.default_rng(0)
    from convtasnet_tpu.ops.pallas.tcn_block import _probe_inputs

    # on-device probe arrays (host->device = one PRNG key; relay bandwidth)
    h, dw, w_out = _probe_inputs(
        [((batch, K, Hs), 1.0), ((P, Hs), 1.0 / np.sqrt(P)),
         ((Hs, B), 1.0 / np.sqrt(Hs))], dtype)
    stats1 = jnp.asarray(
        np.stack([np.full((batch,), 0.1), np.full((batch,), 1.3)], -1),
        jnp.float32)
    a2 = jnp.float32(0.25)
    g1 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1 + 1.0, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1, jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1 + 1.0, jnp.float32)
    # shape-preserving wrapper for the timing race (time_chained feeds the
    # output back as the input): project z back to [M, K, Hs] and fold the
    # sums in so neither output is dead code. The extra matmul is common to
    # every candidate AND the XLA baseline, so the ordering is preserved.
    (w_back,) = _probe_inputs([((B, Hs), 1.0 / np.sqrt(B))], dtype, seed=1)

    def chainable(fn):
        def g(hh):
            z, s = fn(hh)
            zb = jnp.einsum("mkb,bh->mkh", z, w_back,
                            preferred_element_type=jnp.float32)
            lift = (s[:, 0] + s[:, 1])[:, None, None] / (K * Hs)
            return (zb + lift).astype(hh.dtype)

        return g

    dilations = sorted({2 ** x for x in range(cfg.num_blocks)})
    # the forward phase may already be done (probed set) when a train=True
    # call follows a forward-only one in the same process
    budget_cut = False
    for d in ([] if shape_tag in _TCN_TP_PROBED else dilations):
        if probe_budget.exhausted():
            # budget exhausted: remaining dilations stay on XLA this run,
            # unrecorded — a fresh budget finishes (and persists) the rest
            budget_cut = True
            if verbose:
                import sys as _sys

                print(f"tcn tp probe d={d}: probe budget exhausted -> "
                      f"xla this run (unrecorded)", file=_sys.stderr)
            continue
        key = (d, K, Hs, B, cfg.causal, dt)
        disk_key = f"tcn:tp:d{d}:" + shape_tag
        cached = _autotune_cache_load().get(disk_key)  # {} falsy: re-probe

        def xla_fn(hh, _d=d):
            return xla_tp_stage2(hh, stats1, dw, w_out, a2, g1, b1, g2,
                                 dilation=_d, causal=cfg.causal)

        if cached:
            win = cached.get("variant")
            _TCN_TP_READY[key] = win
            if verbose:
                import sys as _sys

                print(f"tcn tp probe: autotune winner loaded from disk "
                      f"({disk_key} -> {win})", file=_sys.stderr)
            if win is None:
                continue
            names = [win]
        else:
            win = None
            names = [f"t{t}" for t in _candidate_tiles(K)]
            names += [n + "_f32" for n in names] if dtype == jnp.bfloat16 \
                else []

        cands = {}
        for name in names:
            tile, hdt = tp_variant_params(name)
            cands[name] = functools.partial(
                fused_tp_stage2, stats1=stats1, dw=dw, w_out=w_out, a2=a2,
                gamma1=g1, beta1=b1, gamma2=g2, dilation=d,
                causal=cfg.causal, tile=tile, h_dtype=hdt)

        compiled, aot = {}, {}
        for name, fn in cands.items():
            err = None
            for _ in range(3):
                try:
                    aot[name] = jax.jit(fn).lower(h).compile()
                    compiled[name] = fn
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 — any compile failure
                    err = e
            if err is not None and verbose:
                import sys as _sys

                print(f"tcn tp probe d={d}: {name} compile failed "
                      f"({type(err).__name__})", file=_sys.stderr)
        if compiled:
            # numerics gate: z AND the stat sums vs the XLA stage 2
            # on-device (tuple output: compare piecewise, take the max)
            tol = _numerics_tol(dtype)
            try:
                ref = jax.jit(xla_fn)(h)  # stays on device
            except Exception:  # noqa: BLE001 — no reference: keep compiled
                ref = None
            if ref is not None:
                ok, errs = set(), {}
                for nm in compiled:
                    try:
                        e = float(jax.device_get(
                            _rel_err_device(aot[nm](h), ref)))
                    except Exception:  # noqa: BLE001
                        e = float("inf")
                    errs[nm] = e
                    if e <= tol:
                        ok.add(nm)
                if verbose:
                    import sys as _sys

                    detail = " ".join(f"{k_}={errs[k_]:.2e}"
                                      for k_ in sorted(errs))
                    print(f"tcn tp probe d={d} ({shape_tag}): numerics vs "
                          f"xla (tol {tol:g}): {detail}", file=_sys.stderr)
                    for nm in sorted(set(compiled) - ok):
                        print(f"tcn tp probe d={d} {nm}: REJECTED on "
                              f"numerics (rel err {errs[nm]:.2e})",
                              file=_sys.stderr)
                compiled = {nm: f for nm, f in compiled.items() if nm in ok}
        timed = {}
        if not compiled:
            best = None
        elif cached:
            best = win  # disk winner: compile+numerics re-verified only
        else:
            best, timed = _race(
                {nm: chainable(f) for nm, f in compiled.items()},
                chainable(xla_fn), h, inner=50)
            if verbose:
                import sys as _sys

                detail = " ".join(f"{k_}={v * 1e3:.3f}ms"
                                  for k_, v in sorted(timed.items()))
                print(f"tcn tp probe d={d}: best={best or 'xla'} "
                      f"({detail})", file=_sys.stderr)
        if (best is None and not cached and probe_budget.exhausted()
                and not any(k_ != "xla" for k_ in timed)):
            budget_cut = True  # race never ran: not evidence, unrecorded
            continue
        _TCN_TP_READY[key] = best
        if not cached:
            _autotune_cache_store(disk_key, {"variant": best})
    if not budget_cut:
        _TCN_TP_PROBED.add(shape_tag)

    if not train:
        return
    from convtasnet_tpu.parallel.dpt_tp import _probe_tp_train_sub

    def make_grad(stage2):
        def f(hh, full=False):
            def loss(*a):
                z, s = stage2(*a)
                return jnp.sum(z.astype(jnp.float32)) + jnp.sum(s)

            args = (hh, stats1, dw, w_out, a2, g1, b1, g2)
            if full:
                return jax.grad(loss, argnums=tuple(range(8)))(*args)
            return jax.grad(loss)(*args)

        return f

    for d in dilations:
        key = (d, K, Hs, B, cfg.causal, dt)
        rkey = ("tcn-tp-train",) + key
        if rkey in _TCN_TP_TRAIN:
            continue
        if probe_budget.exhausted():
            budget_cut = True
            if verbose:
                import sys as _sys

                print(f"tcn tp train probe d={d}: probe budget exhausted "
                      f"-> autodiff this run (unrecorded)", file=_sys.stderr)
            continue
        win = _TCN_TP_READY.get(key)
        if win is None:  # no fused forward: nothing to pair
            _TCN_TP_TRAIN[rkey] = None
            continue
        disk_key = f"tcn:tp:train:d{d}:" + shape_tag
        cached = _autotune_cache_load().get(disk_key)
        if cached and not cached.get("win"):
            _TCN_TP_TRAIN[rkey] = None
            if verbose:
                import sys as _sys

                print(f"tcn tp train probe d={d}: cached no-go "
                      f"({disk_key})", file=_sys.stderr)
            continue
        static = (d, cfg.causal, win, False)
        fused_g = make_grad(lambda *a, _s=static: tp_stage2_ad(_s, *a))
        xla_g = make_grad(
            lambda *a, _d=d: xla_tp_stage2(*a, dilation=_d,
                                           causal=cfg.causal))
        res = _probe_tp_train_sub(
            "tcn-tp", key, fused_g, xla_g, h, dtype, verbose,
            race=not cached, registry=_TCN_TP_TRAIN, tag="tcn tp")
        if not cached:
            _autotune_cache_store(disk_key, {"win": bool(res)})
    if not budget_cut:
        _TCN_TP_PROBED.add(shape_tag + ":train")
