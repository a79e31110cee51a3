"""Batch-scaling decomposition: WHICH part of the block kernel slows down
as the grid (batch) grows?

bench_scaling.py established: pure XLA matmuls scale flat (~90% MFU at any
M), but per-grid-step time of the block kernels grows ~30% from M=8 -> 32
on both the Pallas and XLA paths. This script runs three minimal Pallas
kernels with the block's exact grid/block structure (grid=(M,), blocks
[1, Kp, B]) and times them at M in {8, 16, 32}:

  mm    : MXU only  — h = x@W1 (VMEM scratch), out = h@W2 + x
  vpu   : VPU only  — 3-tap dilated combine + PReLU over the input
  mixed : both      — h = prelu(x@W1); y = prelu(dwconv3(h)); out = y@W2 + x
          (the real block minus norms)

If `mm` is flat but `mixed` degrades, the cliff is the VPU/MXU interleave
at scale; if all three degrade, it's the grid pipeline itself (per-step
in/out DMA of [1, Kp, B] blocks).

Usage: python scripts/bench_scaling2.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convtasnet_tpu.utils.timing import time_chained

K, Kp, B, H = 3199, 3200, 256, 512
D = 16
PEAK_BF16 = 197e12


def _mm_kernel(x_ref, w1_ref, w2_ref, o_ref, h_buf, *, tile):
    n = Kp // tile
    w1 = w1_ref[:]
    for t in range(n):
        k0 = t * tile
        h = jnp.dot(x_ref[0, pl.ds(k0, tile), :], w1,
                    preferred_element_type=jnp.float32)
        h_buf[pl.ds(k0, tile), :] = h.astype(h_buf.dtype)
    w2 = w2_ref[:]
    for t in range(n):
        k0 = t * tile
        o = jnp.dot(h_buf[pl.ds(k0, tile), :], w2,
                    preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(k0, tile), :] = (
            x_ref[0, pl.ds(k0, tile), :] + o.astype(x_ref.dtype))


def _vpu_kernel(x_ref, w1_ref, w2_ref, o_ref, h_buf, *, tile):
    # 3-tap dilated combine + prelu over the input channels (no matmul)
    n = Kp // tile
    for t in range(n):
        k0 = t * tile
        h = x_ref[0, pl.ds(k0, tile), :].astype(jnp.float32)
        h = jnp.where(h >= 0, h, 0.25 * h)
        h_buf[pl.ds(k0, tile), :B] = h.astype(h_buf.dtype)
    for t in range(n):
        k0 = t * tile
        acc = None
        for p in range(3):
            idx = jnp.clip(k0 + p * D, 0, Kp - tile)
            seg = h_buf[pl.ds(idx, tile), :B].astype(jnp.float32)
            acc = seg * (0.3 + p) if acc is None else acc + seg * (0.3 + p)
        acc = jnp.where(acc >= 0, acc, 0.3 * acc)
        o_ref[0, pl.ds(k0, tile), :] = (
            x_ref[0, pl.ds(k0, tile), :] + acc.astype(x_ref.dtype))


def _mixed_kernel(x_ref, w1_ref, w2_ref, o_ref, h_buf, *, tile):
    n = Kp // tile
    w1 = w1_ref[:]
    for t in range(n):
        k0 = t * tile
        h = jnp.dot(x_ref[0, pl.ds(k0, tile), :], w1,
                    preferred_element_type=jnp.float32)
        h = jnp.where(h >= 0, h, 0.25 * h)
        h_buf[pl.ds(k0, tile), :] = h.astype(h_buf.dtype)
    w2 = w2_ref[:]
    for t in range(n):
        k0 = t * tile
        acc = None
        for p in range(3):
            idx = jnp.clip(k0 + p * D, 0, Kp - tile)
            seg = h_buf[pl.ds(idx, tile), :].astype(jnp.float32)
            acc = seg * (0.3 + p) if acc is None else acc + seg * (0.3 + p)
        acc = jnp.where(acc >= 0, acc, 0.3 * acc)
        o = jnp.dot(acc.astype(w2.dtype), w2,
                    preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(k0, tile), :] = (
            x_ref[0, pl.ds(k0, tile), :] + o.astype(x_ref.dtype))


def run(kernel, name, M, x, w1, w2, tile=1600, h_cols=H):
    fn = pl.pallas_call(
        functools.partial(kernel, tile=tile),
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, B), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Kp, B), lambda m: (m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Kp, B), x.dtype),
        scratch_shapes=[pltpu.VMEM((Kp, h_cols), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    t = time_chained(lambda xx: fn(xx, w1, w2), x, inner=60)
    mm_fl = 2 * M * Kp * B * H * 2
    print(f"{name:<8} M={M:<3} {t * 1e3:8.3f} ms  "
          f"{t / M * 1e6:7.2f} us/step"
          + (f"  (MFU {mm_fl / t / PEAK_BF16 * 100:5.1f}%)"
             if "vpu" not in name else ""), flush=True)


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.standard_normal((B, H)) / 16, dt)
    w2 = jnp.asarray(rng.standard_normal((H, B)) / 23, dt)
    print(f"# backend={jax.default_backend()}")
    for name, kern in (("mm", _mm_kernel), ("vpu", _vpu_kernel),
                       ("mixed", _mixed_kernel)):
        for M in (8, 16, 32):
            x = jnp.asarray(rng.standard_normal((M, Kp, B)), dt)
            try:
                run(kern, name, M, x, w1, w2)
            except Exception as e:  # noqa: BLE001
                print(f"{name} M={M}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
