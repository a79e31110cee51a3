"""Two-block fused Pallas kernel: a PAIR of consecutive TCN blocks per call.

The single-block kernel (``tcn_block.py``) already keeps one block's whole
[K, H] activation VMEM-resident, but every block boundary still writes its
[K, B] residual output to HBM and the next block reads it straight back —
at the paper config that is 2 x 1.6 MB of pure round-trip per boundary,
plus one kernel-launch/pipeline drain each. Fusing two consecutive blocks
(reference structure: ``src/conv_tasnet.py:149-215`` stacks X blocks with
dilations 2**x per repeat) keeps the intermediate residual in a [Kp, B]
VMEM scratch and internalizes 16 of the model's 31 block boundaries.

Same per-block math as ``tcn_block._kernel`` (gLN folded into the conv taps
and the output matmul; cLN normalized inline), restricted to the
``recompute`` scratch strategy: the pair's working set (x in/out blocks,
the inter-block residual, one [Kp+halo, H] activation scratch, two weight
sets) already fills most of v5e's VMEM, so parking the conv output in a
second [Kp, H] scratch (the single-block ``store`` variant) does not fit
at the paper shapes. BN is not supported (running-stats blocks stay on
the single-block / XLA paths).

Probe discipline matches the single-block kernel: ``probe_fused_block_pairs``
AOT-compiles each variant, numerics-gates it against the chained XLA blocks
on-device, then races it against the CURRENT best two-block path (the
chained single-block registry winners) — the pair only engages where it
beats what the model would otherwise do. Winners persist to the shared
autotune disk cache under ``pair:`` keys and are re-validated per shape.
``CONVTASNET_PAIR_FUSION=0`` disables the path entirely.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convtasnet_tpu.ops.pallas import probe_budget
from convtasnet_tpu.ops.pallas.tcn_block import (
    EPS,
    _autotune_cache_load,
    _autotune_cache_store,
    _FUSED_READY,
    _numerics_tol,
    _probe_inputs,
    _race,
    _round_up,
    _tile_rows,
    _verify_numerics,
    _xla_block,
    fused_tcn_block,
    variant_params,
)


def _pair_enabled() -> bool:
    return os.environ.get("CONVTASNET_PAIR_FUSION", "1") != "0"


def _kernel_pair(
    x_ref,       # [1, Kp, B]
    w_in1_ref,   # [B, H]
    dw1_ref,     # [P, H]
    w_out1_ref,  # [H, B]
    w_in2_ref,
    dw2_ref,
    w_out2_ref,
    aff_ref,     # [8, H] f32: g1a, b1a, g2a, b2a, g1b, b1b, g2b, b2b
    scal_ref,    # [1, 4] SMEM f32: a1a, a2a, a1b, a2b
    out_ref,     # [1, Kp, B]
    h_buf,       # VMEM [leftm + Kp + rightm, H] activation scratch (shared)
    x2_buf,      # VMEM [Kp, B] inter-block residual (the fused boundary)
    *,
    K: int,
    tile: int,
    d1: int,
    d2: int,
    conv_kernel: int,
    causal: bool,
    norm_type: str,
):
    # One grid step = one batch element through BOTH blocks. h_buf is sized
    # for the larger dilation's halo and reused by both blocks (logical row
    # r always lives at index leftm + r; each block's taps read at
    # leftm - left_d + k0 + p*d). The per-block math mirrors
    # tcn_block._kernel's recompute strategy exactly.
    Kp = x_ref.shape[1]
    H = w_in1_ref.shape[1]
    P = conv_kernel
    dmax = max(d1, d2)
    leftm = (P - 1) * dmax if causal else ((P - 1) * dmax) // 2
    rightm = 0 if causal else ((P - 1) * dmax) // 2
    n_tiles = Kp // tile
    inv_n = 1.0 / (K * H)

    if norm_type == "cLN":
        # zero halos once: pass 1 overwrites [leftm, leftm+Kp) per block and
        # masks the tail rows to zero, so the zeros stay valid for block 2.
        if leftm > 0:
            h_buf[:leftm, :] = jnp.zeros((leftm, H), h_buf.dtype)
        if rightm > 0:
            h_buf[leftm + Kp:, :] = jnp.zeros((rightm, H), h_buf.dtype)

    def maybe_mask(y, k0):
        return y * _tile_rows(tile, k0, K) if k0 + tile > K else y

    def affine(y, gi: int, bi: int):
        return y * aff_ref[gi:gi + 1, :] + aff_ref[bi:bi + 1, :]

    def run_block(read_x, write_out, w_in_ref, dw_ref, w_out_ref,
                  row0: int, a1, a2, d: int):
        left = (P - 1) * d if causal else ((P - 1) * d) // 2
        w_in = w_in_ref[:]

        # ---- pass 1: h = PReLU(x @ W_in), store + stats ----
        s1 = jnp.float32(0.0)
        s2 = jnp.float32(0.0)
        for t in range(n_tiles):
            k0 = t * tile
            x = read_x(k0)
            h = jnp.dot(x, w_in, preferred_element_type=jnp.float32)
            h = jnp.where(h >= 0, h, a1 * h)
            h = maybe_mask(h, k0)
            if norm_type == "gLN":
                s1 += jnp.sum(h)
                s2 += jnp.sum(h * h)
            else:  # cLN: per-row stats, normalize immediately
                mean = jnp.mean(h, axis=1, keepdims=True)
                var = jnp.mean(h * h, axis=1, keepdims=True) - mean * mean
                h = maybe_mask(
                    affine((h - mean) * jax.lax.rsqrt(var + EPS),
                           row0, row0 + 1), k0)
            h_buf[pl.ds(leftm + k0, tile), :] = h.astype(h_buf.dtype)

        dw = dw_ref[:].astype(jnp.float32)
        w_out = w_out_ref[:]
        if norm_type == "gLN":
            # gLN-1 folds into the conv taps; halo/tail rows filled with the
            # value that normalizes to zero (see tcn_block._kernel pass 2).
            mean1 = s1 * inv_n
            rs1 = jax.lax.rsqrt(s2 * inv_n - mean1 * mean1 + EPS)
            s_vec = rs1 * aff_ref[row0:row0 + 1, :]
            b_vec = aff_ref[row0 + 1:row0 + 2, :] - mean1 * s_vec
            c_fill = jnp.where(
                s_vec != 0, -b_vec / jnp.where(s_vec != 0, s_vec, 1.0), 0.0)
            dw_eff = dw * s_vec
            bias = b_vec * jnp.sum(dw, axis=0, keepdims=True)
            if leftm > 0:
                h_buf[:leftm, :] = jnp.broadcast_to(
                    c_fill, (leftm, H)).astype(h_buf.dtype)
            n_pad = rightm + (Kp - K)
            if n_pad > 0:
                h_buf[leftm + K:, :] = jnp.broadcast_to(
                    c_fill, (n_pad, H)).astype(h_buf.dtype)
        else:
            dw_eff = dw
            bias = None

        def dwconv_prelu_tile(k0):
            acc = bias
            for p in range(P):
                seg = h_buf[pl.ds(leftm - left + k0 + p * d, tile),
                            :].astype(jnp.float32)
                term = seg * dw_eff[p:p + 1, :]
                acc = term if acc is None else acc + term
            return jnp.where(acc >= 0, acc, a2 * acc)

        if norm_type == "gLN":
            # stats pass over the (not stored) conv output, then recompute
            # it into the folded output matmul (gLN-2 folds into W_out).
            s3 = jnp.float32(0.0)
            s4 = jnp.float32(0.0)
            for t in range(n_tiles):
                k0 = t * tile
                y = maybe_mask(dwconv_prelu_tile(k0), k0)
                s3 += jnp.sum(y)
                s4 += jnp.sum(y * y)
            mean2 = s3 * inv_n
            rs2 = jax.lax.rsqrt(s4 * inv_n - mean2 * mean2 + EPS)
            s2_vec = rs2 * aff_ref[row0 + 2:row0 + 3, :]
            b2_vec = aff_ref[row0 + 3:row0 + 4, :] - mean2 * s2_vec
            w_eff = (w_out.astype(jnp.float32)
                     * jnp.transpose(s2_vec)).astype(w_out.dtype)
            const = jnp.dot(b2_vec.astype(w_out.dtype), w_out,
                            preferred_element_type=jnp.float32)
            for t in range(n_tiles):
                k0 = t * tile
                y = maybe_mask(dwconv_prelu_tile(k0), k0)
                out = jnp.dot(y.astype(w_out.dtype), w_eff,
                              preferred_element_type=jnp.float32) + const
                xv = read_x(k0)
                write_out(k0, xv + out.astype(xv.dtype))
        else:
            for t in range(n_tiles):
                k0 = t * tile
                y = maybe_mask(dwconv_prelu_tile(k0), k0)
                mean = jnp.mean(y, axis=1, keepdims=True)
                var = jnp.mean(y * y, axis=1, keepdims=True) - mean * mean
                y = maybe_mask(
                    affine((y - mean) * jax.lax.rsqrt(var + EPS),
                           row0 + 2, row0 + 3), k0)
                out = jnp.dot(y.astype(w_out.dtype), w_out,
                              preferred_element_type=jnp.float32)
                xv = read_x(k0)
                write_out(k0, xv + out.astype(xv.dtype))

    def read_x1(k0):
        return x_ref[0, pl.ds(k0, tile), :]

    def write_x2(k0, v):
        x2_buf[pl.ds(k0, tile), :] = v

    def read_x2(k0):
        return x2_buf[pl.ds(k0, tile), :]

    def write_out(k0, v):
        out_ref[0, pl.ds(k0, tile), :] = v

    run_block(read_x1, write_x2, w_in1_ref, dw1_ref, w_out1_ref,
              0, scal_ref[0, 0], scal_ref[0, 1], d1)
    run_block(read_x2, write_out, w_in2_ref, dw2_ref, w_out2_ref,
              4, scal_ref[0, 2], scal_ref[0, 3], d2)


def fused_tcn_block_pair(
    x: jax.Array,        # [M, K, B]
    params_a,            # (w_in, dw, w_out, a1, a2, g1, b1, g2, b2)
    params_b,
    *,
    d1: int,
    d2: int,
    causal: bool,
    norm_type: str,
    tile: int = 1600,
    interpret: bool = False,
    h_dtype=None,
) -> jax.Array:
    """Fused forward of TWO consecutive TCN blocks. Returns [M, K, B].

    The inter-block residual never touches HBM. gLN/cLN only; inference
    path only (the training path keeps the single-block custom-VJP pairs —
    their backward already recomputes in VMEM, so the pair's win is the
    boundary I/O, which grad would re-expose as a residual anyway).
    """
    if norm_type not in ("gLN", "cLN"):
        raise ValueError("fused block pair supports gLN/cLN only")
    M, K, B = x.shape
    w_in1, dw1, w_out1, a1a, a2a, g1a, b1a, g2a, b2a = params_a
    w_in2, dw2, w_out2, a1b, a2b, g1b, b1b, g2b, b2b = params_b
    H = w_in1.shape[1]
    P = dw1.shape[0]
    Kp = _round_up(K, tile)
    if Kp != K:
        x = jnp.pad(x, ((0, 0), (0, Kp - K), (0, 0)))
    dmax = max(d1, d2)
    leftm = (P - 1) * dmax if causal else ((P - 1) * dmax) // 2
    rightm = 0 if causal else ((P - 1) * dmax) // 2

    aff = jnp.stack([s.astype(jnp.float32)
                     for s in (g1a, b1a, g2a, b2a, g1b, b1b, g2b, b2b)])
    scal = jnp.reshape(
        jnp.stack([a1a, a2a, a1b, a2b]).astype(jnp.float32), (1, 4))

    cdtype = x.dtype
    sdtype = jnp.dtype(h_dtype) if h_dtype is not None else jnp.dtype(cdtype)
    kernel = functools.partial(
        _kernel_pair, K=K, tile=tile, d1=d1, d2=d2, conv_kernel=P,
        causal=causal, norm_type=norm_type)
    flops = 2 * (2 * M * Kp * B * H * 2 + M * Kp * H * (2 * P + 20))
    wspec = pl.BlockSpec((B, H), lambda m: (0, 0), memory_space=pltpu.VMEM)
    dwspec = pl.BlockSpec((P, H), lambda m: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((H, B), lambda m: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, dwspec, ospec, wspec, dwspec, ospec,
            pl.BlockSpec((8, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda m: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Kp, B), cdtype),
        scratch_shapes=[
            pltpu.VMEM((leftm + Kp + rightm, H), sdtype),
            pltpu.VMEM((Kp, B), cdtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * M * Kp * B * 2
            + 2 * (B * H + H * B + 8 * H) * 4,
            transcendentals=0),
        # see tcn_block.fused_tcn_block: keep XLA's memory-space assignment
        # from homing the [M, Kp, B] output in VMEM next to the working set
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x.astype(cdtype),
      w_in1.astype(cdtype), dw1.astype(cdtype), w_out1.astype(cdtype),
      w_in2.astype(cdtype), dw2.astype(cdtype), w_out2.astype(cdtype),
      aff, scal)
    if Kp != K:
        out = out[:, :K, :]
    return out


# --------------------------------------------------------------------------
# Per-pair autotuning registry (mirrors tcn_block._FUSED_READY).
# --------------------------------------------------------------------------

# (d1, d2, norm_type, causal) -> "pair" | "pair_f32" | None (=unfused path).
_FUSED_PAIR_READY: dict = {}

# fastest pair variant that passed the numerics gate, per pair key — kept
# even when the unfused chain won the isolated race, as the in-model
# promotion candidate (tcn_inmodel_fwd). Only populated by a genuine race
# in this process.
_PAIR_BEST_FUSED: dict = {}


def pair_variant_kwargs(variant) -> dict:
    """Decode a pair-registry variant name to ``fused_tcn_block_pair``
    kwargs. Names are ``pair[_f32][@<tile>]`` (f32 VMEM activation scratch;
    explicit K-tile — the probe races 800 against the 1600 default, same
    discipline as the single-block ``variant_params``)."""
    if variant is None:
        return {}
    name, _, t = variant.partition("@")
    kw: dict = {"tile": int(t)} if t else {}
    if name == "pair_f32":
        kw["h_dtype"] = jnp.float32
    elif name != "pair":
        raise ValueError(f"unknown pair variant: {variant}")
    return kw


def _pair_numerics_tol(dtype) -> float:
    """Acceptance tolerance for the two-block chain. 1.5x the single-block
    tolerance: bf16 VMEM-scratch rounding compounds across the fused
    boundary (measured chain error ~1.5-2e-2 vs ~1e-2 per block), while a
    miscompile still produces O(1) error — the gate keeps >10x separation
    either way."""
    return 1.5 * _numerics_tol(dtype)


def fused_block_pair_ready(d1: int, d2: int, norm_type: str, causal: bool,
                           interpret: bool):
    """Trace-time gate: may blocks (d1, d2) run as one fused pair?

    Interpret mode (CPU) returns "pair" so the path is exercised in tests;
    on a real backend a pair engages only after ``probe_fused_block_pairs``
    compiled it, numerics-verified it against the chained XLA blocks, and
    it beat the chained single-block winners on-device.
    ``CONVTASNET_PAIR_FUSION=0`` disables the path everywhere."""
    if not _pair_enabled() or norm_type not in ("gLN", "cLN"):
        return None
    if interpret:
        return "pair"
    return _FUSED_PAIR_READY.get((d1, d2, norm_type, causal))


def probe_fused_block_pairs(
    dilation_pairs,
    *,
    K: int,
    batch: int,
    bottleneck: int,
    hidden: int,
    conv_kernel: int = 3,
    norm_type: str = "gLN",
    causal: bool = False,
    dtype=jnp.bfloat16,
    tile: int = 1600,
    retries: int = 2,
    verbose: bool = False,
    interpret: bool = False,
    autotune: bool = True,
    verify_only: bool = False,
    check_numerics: Optional[bool] = None,
) -> dict:
    """AOT-compile, numerics-gate, and race the pair kernel per dilation
    pair. Returns {(d1, d2): "pair" | "pair_f32" | None}.

    The race baseline is the CURRENT best two-block path: the chained
    single-block registry winners (fused where ``_FUSED_READY`` says so,
    XLA otherwise) — so a recorded pair winner is a real end-to-end
    improvement over what the model would otherwise execute, not just a
    win over the slowest path. Numerics are gated against the chained XLA
    blocks before any timing. ``verify_only`` compile-checks + re-gates
    the recorded winner at a new shape without racing (mirrors
    ``probe_fused_block``)."""
    import numpy as _np

    if check_numerics is None:
        check_numerics = not interpret

    results = {}
    # on-device probe arrays: see tcn_block._probe_inputs (relay bandwidth)
    gb = jnp.zeros((hidden,), jnp.float32)
    g1 = gb + 1
    a = jnp.asarray(0.25, jnp.float32)
    wspec = [((bottleneck, hidden), 1.0 / _np.sqrt(bottleneck)),
             ((conv_kernel, hidden), 0.1),
             ((hidden, bottleneck), 1.0 / _np.sqrt(hidden))]
    x, wa1, wa2, wa3, wb1, wb2, wb3 = _probe_inputs(
        [((batch, K, bottleneck), 1.0)] + wspec + wspec, dtype)
    wa = (wa1, wa2, wa3, a, a, g1, gb, g1, gb)
    wb = (wb1, wb2, wb3, a, a, g1, gb, g1, gb)

    def single_block(d, w9):
        """One block through the model's current best path for dilation d."""
        variant = _FUSED_READY.get((d, norm_type, causal))
        if variant is None:
            static = (d, causal, norm_type, tile, interpret)
            return lambda xx: _xla_block(static, xx, *w9, gb, g1, gb, g1)
        store, h_dt, tl = variant_params(variant)
        return lambda xx: fused_tcn_block(
            xx, *w9, dilation=d, causal=causal, norm_type=norm_type,
            tile=tl or tile, interpret=interpret, store_h2=store,
            h_dtype=h_dt)

    def xla_chain(d1, d2):
        sa = (d1, causal, norm_type, tile, interpret)
        sb = (d2, causal, norm_type, tile, interpret)
        return lambda xx: _xla_block(
            sb, _xla_block(sa, xx, *wa, gb, g1, gb, g1), *wb, gb, g1, gb, g1)

    base_variants = [("pair", None)]
    if jnp.dtype(dtype) == jnp.bfloat16:
        base_variants.append(("pair_f32", jnp.float32))
    # K-tile twins (same rationale as the single-block probe): 800 halves
    # the pad waste at K=3199 (Kp 3200 vs 4800) and shifts the VPU/MXU
    # interleave; the race decides per shape.
    tile_cands = [tile]
    if not interpret and tile != 800 and K >= 800:
        tile_cands.append(800)
    variants = [(n + (f"@{t}" if t != tile else ""), h, t)
                for (n, h) in base_variants for t in tile_cands]

    for d1, d2 in dilation_pairs:
        d1, d2 = int(d1), int(d2)
        if not interpret and probe_budget.exhausted():
            # probe budget exhausted: this pair stays on the chained
            # single-block path FOR THIS RUN — unrecorded in race mode (a
            # fresh budget re-races), demoted in verify mode (an unproven
            # compile can't be trusted inside the model's jit)
            if verbose:
                import sys as _sys

                print(f"pallas pair probe d=({d1},{d2}): probe budget "
                      f"exhausted -> unfused this run"
                      + (" (winner demoted)" if verify_only
                         else " (unrecorded)"), file=_sys.stderr)
            if verify_only:
                _FUSED_PAIR_READY[(d1, d2, norm_type, causal)] = None
                results[(d1, d2)] = None
            continue
        to_try = variants
        if verify_only:
            winner = _FUSED_PAIR_READY.get((d1, d2, norm_type, causal))
            if winner is None:
                results[(d1, d2)] = None
                continue
            to_try = [(n, h, t) for n, h, t in variants if n == winner]
            if not to_try:
                # Recorded winner is not among the current candidates (e.g.
                # a pair_f32 recorded under bf16 re-verified at another
                # compute dtype, or an older tile set). Re-verify it exactly
                # as recorded instead of silently demoting to unfused.
                kw = pair_variant_kwargs(winner)
                if verbose:
                    import sys as _sys

                    print(f"pallas pair probe d=({d1},{d2}): recorded "
                          f"winner {winner} not a candidate at dtype="
                          f"{jnp.dtype(dtype).name}; re-verifying as "
                          f"recorded", file=_sys.stderr)
                to_try = [(winner, kw.get("h_dtype"),
                           kw.get("tile", tile))]
        compiled = {}
        aot = {}
        for name, h_dt, tl in to_try:
            if not interpret and not verify_only and probe_budget.exhausted():
                break  # budget died mid-pair: stop compiling variants
            fn = functools.partial(
                fused_tcn_block_pair, d1=d1, d2=d2, causal=causal,
                norm_type=norm_type, tile=tl, interpret=interpret,
                h_dtype=h_dt)
            err = None
            for _ in range(retries + 1):
                try:
                    aot[name] = jax.jit(fn).lower(x, wa, wb).compile()
                    compiled[name] = (
                        lambda xx, _fn=fn: _fn(xx, wa, wb))
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 — any compile failure
                    err = e
            if err is not None and verbose:
                import sys as _sys

                print(f"pallas pair probe d=({d1},{d2}) {name}: compile "
                      f"failed ({type(err).__name__})", file=_sys.stderr)
        if not interpret and not verify_only and probe_budget.exhausted():
            if verbose:
                import sys as _sys

                print(f"pallas pair probe d=({d1},{d2}): probe budget "
                      f"exhausted mid-pair -> unfused this run "
                      f"(unrecorded)", file=_sys.stderr)
            continue
        if compiled and check_numerics:
            tol = _pair_numerics_tol(dtype)
            ok, errs, verified = _verify_numerics(
                {n: (lambda _e=aot[n]: _e(x, wa, wb)) for n in compiled},
                lambda: jax.jit(xla_chain(d1, d2))(x), tol)
            if verbose:
                import sys as _sys

                if verified:
                    detail = " ".join(
                        f"{k}={errs[k]:.2e}" for k in sorted(errs))
                    print(f"pallas pair probe d=({d1},{d2}): numerics vs "
                          f"xla chain (tol {tol:g}): {detail}",
                          file=_sys.stderr)
                else:
                    print(f"pallas pair probe d=({d1},{d2}): numerics "
                          f"UNVERIFIED (xla reference failed)",
                          file=_sys.stderr)
                for n in sorted(set(compiled) - ok):
                    print(f"pallas pair probe d=({d1},{d2}) {n}: REJECTED "
                          f"on numerics (rel err {errs[n]:.2e})",
                          file=_sys.stderr)
            compiled = {n: f for n, f in compiled.items() if n in ok}
        if not compiled:
            best = None
            if verify_only and verbose:
                import sys as _sys

                print(f"pallas pair probe d=({d1},{d2}): winner failed at "
                      f"[{batch}, K={K}] -> unfused", file=_sys.stderr)
        elif verify_only:
            best = next(iter(compiled))
        elif autotune and not interpret:
            base = single_block(d1, wa)
            base2 = single_block(d2, wb)
            best, timed = _race(
                compiled, lambda xx: base2(base(xx)), x, inner=100)
            if (best is None and probe_budget.exhausted()
                    and not any(k != "xla" for k in timed)):
                continue  # budget cut the race before any candidate ran
            if verbose:
                import sys as _sys

                detail = " ".join(
                    f"{k}={v * 1e3:.3f}ms" for k, v in sorted(timed.items()))
                print(f"pallas pair probe d=({d1},{d2}): best="
                      f"{best or 'unfused'} ({detail})", file=_sys.stderr)
            # record the fastest numerics-verified pair variant even when
            # the unfused chain won — the isolated race mispredicts
            # full-model cost in both directions, so the in-model validator
            # (tcn_inmodel_fwd) may promote it
            fused_timed = {k: v for k, v in timed.items() if k in compiled}
            if fused_timed:
                _PAIR_BEST_FUSED[(d1, d2, norm_type, causal)] = min(
                    fused_timed, key=fused_timed.get)
        else:
            best = next(iter(compiled))
        _FUSED_PAIR_READY[(d1, d2, norm_type, causal)] = best
        results[(d1, d2)] = best
    return results


# --------------------------------------------------------------------------
# Training path: pair custom-VJP (pair forward kernel + fused pair backward,
# ops/pallas/tcn_block_pair_bwd.py). gLN only — the flagship train config.
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_pair_ad(static, x, *p18):
    d1, d2, causal, norm_type, tile, h_dt, _bwd, interpret = static
    return fused_tcn_block_pair(
        x, p18[:9], p18[9:], d1=d1, d2=d2, causal=causal,
        norm_type=norm_type, tile=tile, interpret=interpret, h_dtype=h_dt)


def _fused_pair_fwd(static, x, *p18):
    # Residuals are just the pair inputs — the backward kernel recomputes
    # both blocks' intermediates (and the inter-block residual x1) in VMEM.
    return _fused_pair_ad(static, x, *p18), (x,) + p18


def _fused_pair_bwd(static, residuals, g):
    d1, d2, causal, norm_type, tile, _h_dt, bwd, interpret = static
    from convtasnet_tpu.ops.pallas.tcn_block_pair_bwd import (
        fused_tcn_block_pair_bwd,
    )

    x = residuals[0]
    pa = residuals[1:10]
    pb = residuals[10:19]
    kw = pair_variant_kwargs(bwd)
    dx, ga, gb = fused_tcn_block_pair_bwd(
        x, g, pa, pb, d1=d1, d2=d2, causal=causal, norm_type=norm_type,
        tile=kw.get("tile", tile), interpret=interpret,
        s_dtype=kw.get("h_dtype"))
    return (dx,) + tuple(ga) + tuple(gb)


_fused_pair_ad.defvjp(_fused_pair_fwd, _fused_pair_bwd)


def fused_tcn_block_pair_ad(
    x: jax.Array,
    params_a,
    params_b,
    *,
    d1: int,
    d2: int,
    causal: bool,
    norm_type: str,
    tile: int = 1600,
    interpret: bool = False,
    h_dtype=None,
    bwd: str = "pair",
):
    """Differentiable fused pair: pair-kernel forward + fused single-kernel
    pair backward. ``bwd`` is a pair-variant name (``pair[_f32][@tile]``)
    selecting the backward's scratch dtype / K-tile; use
    ``fused_block_pair_train_ready`` to pick this safely on a real
    backend."""
    if norm_type != "gLN":
        raise ValueError("pair train path supports gLN only")
    static = (d1, d2, causal, norm_type, tile, h_dtype, bwd, interpret)
    return _fused_pair_ad(static, x, *params_a, *params_b)


# (d1, d2, norm_type, causal) -> pair variant name | None (=two single-block
# custom-VJP pairs / autodiff). Populated by probe_fused_pair_train.
_PAIR_TRAIN_READY: dict = {}
# fastest grads-verified pair-train variant, kept even when the chained
# singles won the isolated race — the in-model train validator may promote
# it (isolated races mispredict full-model cost in both directions).
_PAIR_TRAIN_BEST_FUSED: dict = {}


def fused_block_pair_train_ready(d1: int, d2: int, norm_type: str,
                                 causal: bool, interpret: bool):
    """Trace-time gate: may blocks (d1, d2) train as one fused pair
    custom-VJP? Interpret mode returns "pair" so tests exercise the path;
    on a real backend only after ``probe_fused_pair_train`` compiled,
    grads-numerics-gated, and raced it against the chained single-block
    train path."""
    if not _pair_enabled() or norm_type != "gLN":
        return None
    if interpret:
        return "pair"
    return _PAIR_TRAIN_READY.get((d1, d2, norm_type, causal))


def probe_fused_pair_train(
    dilation_pairs,
    *,
    K: int,
    batch: int,
    bottleneck: int,
    hidden: int,
    conv_kernel: int = 3,
    norm_type: str = "gLN",
    causal: bool = False,
    dtype=jnp.bfloat16,
    tile: int = 1600,
    retries: int = 2,
    verbose: bool = False,
    interpret: bool = False,
    autotune: bool = True,
    verify_only: bool = False,
    check_numerics: Optional[bool] = None,
) -> dict:
    """AOT-compile, grads-numerics-gate, and race the pair TRAIN path per
    dilation pair: full forward+backward through (a) the chained
    single-block train path exactly as the model would run it
    (``fused_tcn_block_ad`` with the per-dilation ``_FUSED_BWD_READY``
    winners, plain autodiff where those are None) vs (b) the pair
    custom-VJP. All 19 cotangents (dx + both blocks' weight grads) are
    verified against XLA autodiff of the chained block math before any
    timing. gLN only."""
    import numpy as _np

    from convtasnet_tpu.ops.pallas.tcn_block import (
        _FUSED_BWD_READY,
        _race,
        _time_or_none,  # noqa: F401 — via _race
        fused_tcn_block_ad,
    )

    if check_numerics is None:
        check_numerics = not interpret
    if norm_type != "gLN":
        return {tuple(p): None for p in dilation_pairs}

    results = {}
    # on-device probe arrays: see tcn_block._probe_inputs (relay bandwidth)
    gb = jnp.zeros((hidden,), jnp.float32)
    g1 = gb + 1
    a = jnp.asarray(0.25, jnp.float32)
    wspec = [((bottleneck, hidden), 1.0 / _np.sqrt(bottleneck)),
             ((conv_kernel, hidden), 0.1),
             ((hidden, bottleneck), 1.0 / _np.sqrt(hidden))]
    x, wa1, wa2, wa3, wb1, wb2, wb3 = _probe_inputs(
        [((batch, K, bottleneck), 1.0)] + wspec + wspec, dtype)
    wa = (wa1, wa2, wa3, a, a, g1, gb, g1, gb)
    wb = (wb1, wb2, wb3, a, a, g1, gb, g1, gb)
    wargs = wa + wb

    def grad_fn(chain19):
        """x -> dx with ALL 19 cotangents computed (as training does)."""

        def f(xx):
            def loss(*args):
                return jnp.sum(chain19(*args))

            grads = jax.grad(loss, argnums=tuple(range(19)))(xx, *wargs)
            return grads[0].astype(xx.dtype)

        return f

    def single_train_chain(d1, d2):
        """Two blocks through the model's current TRAIN path for these
        dilations (fused single-block custom-VJP pairs where their probes
        won, autodiff otherwise)."""
        from convtasnet_tpu.ops.pallas.tcn_block import variant_params

        def one(d, off):
            bwd_v = _FUSED_BWD_READY.get((d, norm_type, causal))
            fwd_v = _FUSED_READY.get((d, norm_type, causal))

            def blk(xx, *args):
                w9 = args[off:off + 9]
                if bwd_v is None:
                    static = (d, causal, norm_type, tile, interpret)
                    return _xla_block(static, xx, *w9, gb, g1, gb, g1)
                store_h2, h_dt, _ = variant_params(fwd_v)
                return fused_tcn_block_ad(
                    xx, *w9, dilation=d, causal=causal,
                    norm_type=norm_type, tile=tile, store_h2=store_h2,
                    h_dtype=h_dt, interpret=interpret, bwd=bwd_v)

            return blk

        blk1 = one(d1, 0)
        blk2 = one(d2, 9)
        return lambda xx, *args: blk2(blk1(xx, *args), *args)

    def xla_chain19(d1, d2):
        sa = (d1, causal, norm_type, tile, interpret)
        sb = (d2, causal, norm_type, tile, interpret)
        return lambda xx, *args: _xla_block(
            sb, _xla_block(sa, xx, *args[:9], gb, g1, gb, g1),
            *args[9:], gb, g1, gb, g1)

    def pair_chain(d1, d2, variant):
        kw = pair_variant_kwargs(variant)
        return lambda xx, *args: fused_tcn_block_pair_ad(
            xx, args[:9], args[9:], d1=d1, d2=d2, causal=causal,
            norm_type=norm_type, tile=kw.get("tile", tile),
            h_dtype=kw.get("h_dtype"), bwd=variant, interpret=interpret)

    base_variants = ["pair"]
    if jnp.dtype(dtype) == jnp.bfloat16:
        base_variants.append("pair_f32")
    tile_cands = [tile]
    if not interpret and tile != 800 and K >= 800:
        tile_cands.append(800)
    variants = [n + (f"@{t}" if t != tile else "")
                for n in base_variants for t in tile_cands]

    def grads_numerics(chain19_fused, chain19_ref, tol):
        def full_grads(chain19):
            def f(xx):
                def loss(*args):
                    return jnp.sum(chain19(*args))

                return jax.grad(loss, argnums=tuple(range(19)))(xx, *wargs)

            return f

        from convtasnet_tpu.ops.pallas.tcn_block import _rel_err_device

        try:
            ref = jax.jit(full_grads(chain19_ref))(x)  # stays on device
        except Exception:  # noqa: BLE001
            return True, float("nan")
        try:
            got = jax.jit(full_grads(chain19_fused))(x)
            m = float(jax.device_get(_rel_err_device(got, ref)))
        except Exception:  # noqa: BLE001
            return False, float("inf")
        return m <= tol, m

    # one chained-blocks grad tolerance: cotangents compound across both
    # the fused boundary and the recompute, 2x the single-block train gate
    # (which is itself 2x the forward gate); miscompiles are O(1) off.
    tol = 2 * _pair_numerics_tol(dtype)

    for d1, d2 in dilation_pairs:
        d1, d2 = int(d1), int(d2)
        pkey = (d1, d2, norm_type, causal)
        if not interpret and probe_budget.exhausted():
            # budget exhausted: train on the chained single-block path FOR
            # THIS RUN — unrecorded in race mode, demoted in verify mode
            if verbose:
                import sys as _sys

                print(f"pallas pair-train probe d=({d1},{d2}): probe "
                      f"budget exhausted -> singles this run"
                      + (" (winner demoted)" if verify_only
                         else " (unrecorded)"), file=_sys.stderr)
            if verify_only:
                _PAIR_TRAIN_READY[pkey] = None
                results[(d1, d2)] = None
            continue
        to_try = variants
        if verify_only:
            winner = _PAIR_TRAIN_READY.get(pkey)
            if winner is None:
                results[(d1, d2)] = None
                continue
            to_try = [winner]
        candidates = {}
        for name in to_try:
            if not interpret and not verify_only and probe_budget.exhausted():
                break  # budget died mid-pair: stop compiling variants
            fn = grad_fn(pair_chain(d1, d2, name))
            err = None
            for _ in range(retries + 1):
                try:
                    jax.jit(fn).lower(x).compile()
                    candidates[name] = fn
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 — any compile failure
                    err = e
            if err is not None and verbose:
                import sys as _sys

                print(f"pallas pair-train probe d=({d1},{d2}) {name}: "
                      f"compile failed ({type(err).__name__})",
                      file=_sys.stderr)
        timed = {}
        if not candidates:
            best = None
        elif verify_only:
            best = next(iter(candidates))
        elif autotune:
            best, timed = _race(
                candidates, grad_fn(single_train_chain(d1, d2)), x, inner=40)
            if verbose:
                import sys as _sys

                detail = " ".join(
                    f"{k}={v * 1e3:.3f}ms" for k, v in sorted(timed.items()))
                print(f"pallas pair-train probe d=({d1},{d2}): best="
                      f"{best or 'singles'} ({detail})", file=_sys.stderr)
        else:
            best = next(iter(candidates))

        if (not interpret and not verify_only and probe_budget.exhausted()
                and (best is not None
                     or not any(k != "xla" for k in timed))):
            # budget died mid-pair: the raced winner can no longer be
            # cotangent-verified in time (or nothing was timed at all) —
            # leave unrecorded; singles this run, re-raced on a fresh budget
            if verbose:
                import sys as _sys

                print(f"pallas pair-train probe d=({d1},{d2}): probe "
                      f"budget exhausted mid-pair -> singles this run "
                      f"(unrecorded)", file=_sys.stderr)
            continue

        def grads_ok(name: str) -> bool:
            ok, merr = grads_numerics(
                pair_chain(d1, d2, name), xla_chain19(d1, d2), tol)
            if verbose:
                import sys as _sys

                state = "ok" if ok else "REJECTED"
                print(f"pallas pair-train probe d=({d1},{d2}) {name}: grads "
                      f"numerics vs autodiff chain (tol {tol:g}): max rel "
                      f"err {merr:.2e} [{state}]", file=_sys.stderr)
            return ok

        numerics_failed = None
        if best is not None and check_numerics and not grads_ok(best):
            numerics_failed, best = best, None
        if best is not None:
            _PAIR_TRAIN_BEST_FUSED[pkey] = best
        elif timed and check_numerics:
            for bf in sorted((k for k in timed if k != "xla"),
                             key=timed.get):
                if not interpret and probe_budget.exhausted():
                    break  # promotion candidate is optional: skip its gate
                if bf == numerics_failed:
                    continue
                if grads_ok(bf):
                    _PAIR_TRAIN_BEST_FUSED[pkey] = bf
                    break
        _PAIR_TRAIN_READY[pkey] = best
        results[(d1, d2)] = best
    return results


_PAIR_TRAIN_PROBED_SHAPES: set = set()
_PAIR_TRAIN_PROBED_CONFIGS: set = set()


def ensure_probed_pair_train(cfg, batch: int, K: int,
                             verbose: bool = True) -> None:
    """Probe the pair TRAIN custom-VJP for every even-x (2**x, 2**(x+1))
    pair (idempotent per shape; winners persist under ``pairtrain:`` disk
    keys). Called from ``tcn_block.ensure_probed_train`` AFTER the
    single-block train registries are settled — the race baseline chains
    those winners."""
    if not _pair_enabled() or cfg.norm_type != "gLN":
        return
    pairs = [(2 ** i, 2 ** (i + 1))
             for i in range(0, cfg.num_blocks - 1, 2)]
    if not pairs:
        return
    cfg_key = (cfg.bottleneck, cfg.hidden, cfg.conv_kernel, cfg.num_blocks,
               cfg.norm_type, cfg.causal, cfg.compute_dtype)
    key = (batch, K) + cfg_key
    if key in _PAIR_TRAIN_PROBED_SHAPES:
        return
    disk_key = "pairtrain:" + ":".join(str(v) for v in key)

    def probe(ps, vo: bool):
        return probe_fused_pair_train(
            ps, K=K, batch=batch, bottleneck=cfg.bottleneck,
            hidden=cfg.hidden, conv_kernel=cfg.conv_kernel,
            norm_type=cfg.norm_type, causal=cfg.causal,
            dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose,
            verify_only=vo)

    if cfg_key in _PAIR_TRAIN_PROBED_CONFIGS:
        probe(pairs, True)
    else:
        # truthy, possibly PARTIAL (budget-cut runs store what they raced)
        cached = _autotune_cache_load().get(disk_key) or {}
        if cached:
            for k, w in cached.items():
                a, b = k.split("-")
                _PAIR_TRAIN_READY[
                    (int(a), int(b), cfg.norm_type, cfg.causal)] = w
            if verbose:
                import sys as _sys

                print(f"pallas pair-train probe: autotune winners loaded "
                      f"from disk ({disk_key}, {len(cached)}/{len(pairs)} "
                      f"pairs)", file=_sys.stderr)
        have_keys = {tuple(int(v) for v in k.split("-")) for k in cached}
        have = [p for p in pairs if p in have_keys]
        missing = [p for p in pairs if p not in have_keys]
        if have:
            probe(have, True)
        if missing:
            raced = probe(missing, False)
            if raced:
                _autotune_cache_store(
                    disk_key,
                    {f"{a}-{b}": w for (a, b), w in raced.items()})
    if not probe_budget.exhausted():
        # budget-cut probes leave pairs undecided for this run; a later
        # call with a fresh budget finishes (and persists) the rest
        _PAIR_TRAIN_PROBED_SHAPES.add(key)
        _PAIR_TRAIN_PROBED_CONFIGS.add(cfg_key)


_PAIR_PROBED_SHAPES: set = set()
_PAIR_PROBED_CONFIGS: set = set()


def ensure_probed_pairs(cfg, batch: int, K: int, verbose: bool = True) -> None:
    """Probe the pair kernel for every even-x (2**x, 2**(x+1)) dilation pair
    a config's TCN will fuse (idempotent per shape; winners persist to the
    shared autotune disk cache under ``pair:`` keys). Called from
    ``tcn_block.ensure_probed`` AFTER the single-block registries are
    settled — the race baseline chains those winners."""
    if not _pair_enabled() or cfg.norm_type not in ("gLN", "cLN"):
        return
    pairs = [(2 ** i, 2 ** (i + 1))
             for i in range(0, cfg.num_blocks - 1, 2)]
    if not pairs:
        return
    cfg_key = (cfg.bottleneck, cfg.hidden, cfg.conv_kernel, cfg.num_blocks,
               cfg.norm_type, cfg.causal, cfg.compute_dtype)
    key = (batch, K) + cfg_key
    if key in _PAIR_PROBED_SHAPES:
        return
    disk_key = "pair:" + ":".join(str(v) for v in key)

    def probe(ps, vo: bool):
        return probe_fused_block_pairs(
            ps, K=K, batch=batch, bottleneck=cfg.bottleneck,
            hidden=cfg.hidden, conv_kernel=cfg.conv_kernel,
            norm_type=cfg.norm_type, causal=cfg.causal,
            dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose,
            verify_only=vo)

    if cfg_key in _PAIR_PROBED_CONFIGS:
        probe(pairs, True)
    else:
        # truthy, possibly PARTIAL (budget-cut runs store what they raced)
        cached = _autotune_cache_load().get(disk_key) or {}
        if cached:
            for k, w in cached.items():
                a, b = k.split("-")
                _FUSED_PAIR_READY[
                    (int(a), int(b), cfg.norm_type, cfg.causal)] = w
            if verbose:
                import sys as _sys

                print(f"pallas pair probe: autotune winners loaded from "
                      f"disk ({disk_key}, {len(cached)}/{len(pairs)} "
                      f"pairs)", file=_sys.stderr)
        have_keys = {tuple(int(v) for v in k.split("-")) for k in cached}
        have = [p for p in pairs if p in have_keys]
        missing = [p for p in pairs if p not in have_keys]
        if have:
            probe(have, True)
        if missing:
            raced = probe(missing, False)
            if raced:
                _autotune_cache_store(
                    disk_key,
                    {f"{a}-{b}": w for (a, b), w in raced.items()})
    if not probe_budget.exhausted():
        # budget-cut probes leave pairs undecided for this run; a later
        # call with a fresh budget finishes (and persists) the rest
        _PAIR_PROBED_SHAPES.add(key)
        _PAIR_PROBED_CONFIGS.add(cfg_key)
