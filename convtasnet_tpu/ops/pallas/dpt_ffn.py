"""Fused dual-path FFN sublayer (Pallas/Mosaic).

The dual-path layer runs TWO pre-LN GELU MLP sublayers per layer (after
the intra and inter attention passes), and in XLA each one is
HBM-bound, not MXU-bound: the LN pass, the GELU between the matmuls,
and the residual add each round-trip the full [M, K, B] activation (plus
the 4x-wider [M, K, ff] hidden) through HBM — ~7 full-tensor passes for
~136 us of MXU work at the paper shape. This kernel runs the whole
sublayer — pre-LN, up-projection + bias, GELU, down-projection + bias,
residual — in one VMEM-resident pass per (batch row, position tile):
HBM traffic drops to the unavoidable read-x + write-out.

Same probe discipline as the other fused kernels (``tcn_block.py``,
``dpt_attention.py``): candidates AOT-compile, are numerics-gated
against the XLA sublayer on-device, then race it on time; winners
persist in the shared autotune cache under ``dpt:ffn:`` keys. An
unprobed / losing / non-compiling shape keeps the XLA path.

Reference parity: computes exactly ``models/dual_path._FFNSublayer``
(itself a TPU-native capability extension; the reference ships only the
TCN separator, ``src/conv_tasnet.py:149-215``).
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

_EPS = 1e-6


def _ffn_kernel(x_ref, wup_ref, wdn_ref, bias_ref, aff_ref, o_ref, *,
                partial: bool = False):
    """One (batch row, position tile): fused pre-LN + GELU MLP + residual.

    x_ref:    [1, kt, B]   input block (residual source)
    wup_ref:  [B, F]       up projection (F is the LOCAL hidden width
                           under a tensor-parallel column shard)
    wdn_ref:  [F, B]       down projection
    bias_ref: [2, max(F, B)] f32 — row 0 = up bias in [:F]; row 1 = down
              bias in [:B]
    aff_ref:  [2, B] f32   LN gamma / beta
    o_ref:    [1, kt, B]   output block

    ``partial=True`` emits the down projection ONLY (no down bias, no
    residual): the tensor-parallel caller psums partials over the model
    axis and adds the residual + down bias once (``parallel/dpt_tp.py``).
    """
    _, kt, B = x_ref.shape
    F = wup_ref.shape[1]
    cdtype = x_ref.dtype

    # pre-LN over channels (f32 statistics, same as models/dual_path)
    xf = x_ref[0].astype(jnp.float32)                       # [kt, B]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    g = aff_ref[0:1, :]
    b = aff_ref[1:2, :]
    y = ((xf - mean) * jax.lax.rsqrt(var + _EPS) * g + b).astype(cdtype)

    # up proj + bias + GELU (f32 accumulate, round once — Dense semantics)
    h = jnp.dot(y, wup_ref[:],
                preferred_element_type=jnp.float32).astype(cdtype)
    h = h + bias_ref[0:1, 0:F].astype(cdtype)
    h = jax.nn.gelu(h)
    # down proj + bias + residual
    out = jnp.dot(h, wdn_ref[:],
                  preferred_element_type=jnp.float32).astype(cdtype)
    if partial:
        o_ref[0] = out
    else:
        o_ref[0] = x_ref[0] + out + bias_ref[1:2, 0:B].astype(cdtype)


def _pick_k_tile(Kp: int, B: int, F: int, itemsize: int = 2) -> int:
    """Largest position tile keeping the in-flight working set (x, LN
    output, f32 up accumulator, hidden, output) under ~10 MB of VMEM.
    Stays a multiple of 16 sublanes when possible (bf16 tiling)."""
    kt = Kp
    while kt % 2 == 0 and kt // 2 >= 256 and (
            kt * (3 * B * itemsize + F * (4 + itemsize))) > 10 * 2 ** 20:
        kt //= 2
    return kt


def fused_ffn(
    x: jax.Array,                    # [M, K, B] (positions flattened)
    gamma: jax.Array,                # [B] f32
    beta: jax.Array,                 # [B] f32
    w_up: jax.Array,                 # [B, F]
    b_up: jax.Array,                 # [F]
    w_down: jax.Array,               # [F, B]
    b_down: jax.Array,               # [B]
    *,
    k_tile: Optional[int] = None,
    interpret: bool = False,
    partial: bool = False,
) -> jax.Array:
    """Fused pre-LN GELU MLP sublayer. Returns [M, K, B].

    ``k_tile``: positions per grid step (None = auto; raced by the probe
    as ``kt<val>`` variants — smaller tiles shrink the hidden-activation
    footprint at the cost of thinner matmuls).

    ``partial=True``: the weights are a tensor-parallel column shard of
    the hidden dim (``w_up [B, F_local]`` / ``w_down [F_local, B]``); the
    kernel returns the down projection only — no down bias, no residual —
    for the caller to ``psum`` over the model axis and add to ``x`` (plus
    ``b_down``) once (``parallel/dpt_tp.py``).
    """
    M, Kp, B = x.shape
    F = w_up.shape[1]
    kt = int(k_tile) if k_tile else _pick_k_tile(Kp, B, F)
    if Kp % kt:
        raise ValueError(f"k_tile {kt} must divide positions {Kp}")
    cdtype = x.dtype
    aff = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)])
    W = max(F, B)
    bias = jnp.zeros((2, W), jnp.float32)
    bias = bias.at[0, :F].set(b_up.astype(jnp.float32))
    bias = bias.at[1, :B].set(b_down.astype(jnp.float32))
    flops = 2 * M * Kp * B * F * 2
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, partial=partial),
        grid=(M, Kp // kt),
        in_specs=[
            pl.BlockSpec((1, kt, B), lambda m, s: (m, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, F), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, W), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kt, B), lambda m, s: (m, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (M, Kp, B), cdtype, vma=_out_vma(x, w_up, w_down)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * M * Kp * B * jnp.dtype(cdtype).itemsize
                            + 2 * B * F * jnp.dtype(cdtype).itemsize),
            transcendentals=M * Kp * F),
        # keep XLA's memory-space assignment from homing the [M, K, B]
        # output in VMEM next to the kernel's working set (same rationale
        # as fused_tcn_block / fused_inter_attention)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w_up.astype(cdtype), w_down.astype(cdtype), bias, aff)
    return out


# --------------------------------------------------------------------------
# Fused backward (training path): recompute-in-VMEM, single kernel.
# --------------------------------------------------------------------------

_GELU_C = float(np.sqrt(2.0 / np.pi))
_GELU_A = 0.044715


def _gelu_and_grad(x):
    """tanh-approximation GELU and its derivative (f32) — matches
    ``jax.nn.gelu(approximate=True)``, the model's activation."""
    x3 = x * x * x
    inner = _GELU_C * (x + _GELU_A * x3)
    t = jnp.tanh(inner)
    y = 0.5 * x * (1.0 + t)
    dy = (0.5 * (1.0 + t)
          + 0.5 * x * (1.0 - t * t) * _GELU_C * (1.0 + 3 * _GELU_A * x * x))
    return y, dy


def _ffn_bwd_kernel(x_ref, g_ref, wup_ref, wdn_ref, bias_ref, aff_ref,
                    dx_ref, dwup_ref, dwdn_ref, dbias_ref, dgb_ref, *,
                    partial: bool = False):
    """Backward of ``_ffn_kernel`` for one (batch row, position tile).

    ``x`` is the only residual: LN, the up projection, and the GELU are
    recomputed in VMEM, then every cotangent — dx and the weight/bias/
    affine grads — is emitted in the same pass. Weight grads accumulate
    across the sequential grid into constant-index f32 output blocks
    (initialized at the first step), same discipline as the attention
    backward.

    dx_ref: [1, kt, B]; dwup_ref: [B, F] f32; dwdn_ref: [F, B] f32;
    dbias_ref: [2, max(F, B)] f32 (dbup / dbdn); dgb_ref: [2, B] f32.

    ``partial=True`` is the backward of the ``partial`` forward (down
    projection only): ``dx`` omits the residual passthrough term and the
    down-bias grad is zero (the caller added residual and bias outside).
    """
    _, kt, B = x_ref.shape
    F = wup_ref.shape[1]
    cdtype = x_ref.dtype

    # ---- recompute the forward intermediates ----
    xf = x_ref[0].astype(jnp.float32)                       # [kt, B]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mean) * r
    gam = aff_ref[0:1, :]
    y = (xhat * gam + aff_ref[1:2, :]).astype(cdtype)
    pre = jnp.dot(y, wup_ref[:],
                  preferred_element_type=jnp.float32).astype(cdtype)
    pre = pre + bias_ref[0:1, 0:F].astype(cdtype)
    h_f32, dgelu = _gelu_and_grad(pre.astype(jnp.float32))
    h = h_f32.astype(cdtype)

    # ---- grads ----
    g = g_ref[0]                                            # [kt, B] cd
    dwdn_acc = jax.lax.dot_general(
        h, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [F, B]
    if partial:  # forward added no down bias: its grad is zero
        dbdn = jnp.zeros((1, B), jnp.float32)
    else:
        dbdn = jnp.sum(g.astype(jnp.float32), axis=0,
                       keepdims=True)                       # [1, B]
    dh = jax.lax.dot_general(
        g, wdn_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [kt, F] f32
    dpre = (dh * dgelu).astype(cdtype)
    dbup = jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True)
    dwup_acc = jax.lax.dot_general(
        y, dpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [B, F]
    dy = jax.lax.dot_general(
        dpre, wup_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [kt, B] f32
    # LN backward (f32 statistics)
    dgamma = jnp.sum(dy * xhat, axis=0, keepdims=True)      # [1, B]
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * gam
    mean_d = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_xd = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = r * (dxhat - mean_d - xhat * mean_xd)
    if partial:  # no residual passthrough in the partial forward
        dx_ref[0] = dx_ln.astype(cdtype)
    else:
        dx_ref[0] = (g.astype(jnp.float32) + dx_ln).astype(cdtype)

    W = dbias_ref.shape[1]

    def _pad_row(row):  # [1, w] -> [1, W] (static-shape concat; Mosaic
        w = row.shape[1]  # has no dynamic_update_slice lowering)
        if w == W:
            return row
        return jnp.concatenate(
            [row, jnp.zeros((1, W - w), jnp.float32)], axis=1)

    dbias = jnp.concatenate([_pad_row(dbup), _pad_row(dbdn)], axis=0)
    dgb = jnp.concatenate([dgamma, dbeta], axis=0)          # [2, B]
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dwup_ref[:] = dwup_acc
        dwdn_ref[:] = dwdn_acc
        dbias_ref[:] = dbias
        dgb_ref[:] = dgb

    @pl.when(jnp.logical_not(first))
    def _():
        dwup_ref[:] = dwup_ref[:] + dwup_acc
        dwdn_ref[:] = dwdn_ref[:] + dwdn_acc
        dbias_ref[:] = dbias_ref[:] + dbias
        dgb_ref[:] = dgb_ref[:] + dgb


def fused_ffn_bwd(
    x: jax.Array,                    # [M, K, B]
    g: jax.Array,                    # [M, K, B] cotangent of the output
    gamma: jax.Array, beta: jax.Array,
    w_up: jax.Array, b_up: jax.Array,
    w_down: jax.Array, b_down: jax.Array,
    *,
    k_tile: Optional[int] = None,
    interpret: bool = False,
    partial: bool = False,
):
    """Single-kernel backward of the fused FFN sublayer. Returns
    ``(dx, dgamma, dbeta, dw_up, db_up, dw_down, db_down)`` in the
    primals' dtypes. ``partial``: backward of the partial forward (see
    ``fused_ffn``; ``db_down`` comes back zero)."""
    M, Kp, B = x.shape
    F = w_up.shape[1]
    kt = int(k_tile) if k_tile else _pick_k_tile(Kp, B, F)
    cdtype = x.dtype
    aff = jnp.stack([gamma.astype(jnp.float32), beta.astype(jnp.float32)])
    W = max(F, B)
    bias = jnp.zeros((2, W), jnp.float32)
    bias = bias.at[0, :F].set(b_up.astype(jnp.float32))
    bias = bias.at[1, :B].set(b_down.astype(jnp.float32))
    flops = 2 * M * Kp * B * F * 2 * 3   # fwd recompute + dW + dactivation
    dx, dwup, dwdn, dbias, dgb = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, partial=partial),
        grid=(M, Kp // kt),
        in_specs=[
            pl.BlockSpec((1, kt, B), lambda m, s: (m, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, B), lambda m, s: (m, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, F), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, W), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, kt, B), lambda m, s: (m, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, F), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, W), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda m, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(sh, dt_, vma=_out_vma(x, g, w_up,
                                                       w_down))
            for sh, dt_ in (((M, Kp, B), cdtype),
                            ((B, F), jnp.float32),
                            ((F, B), jnp.float32),
                            ((2, W), jnp.float32),
                            ((2, B), jnp.float32))),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * M * Kp * B * jnp.dtype(cdtype).itemsize,
            transcendentals=2 * M * Kp * F),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, g, w_up.astype(cdtype), w_down.astype(cdtype), bias, aff)
    return (dx,
            dgb[0].astype(gamma.dtype), dgb[1].astype(beta.dtype),
            dwup.astype(w_up.dtype), dbias[0, :F].astype(b_up.dtype),
            dwdn.astype(w_down.dtype), dbias[1, :B].astype(b_down.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_ffn_ad(static, x, gamma, beta, w_up, b_up, w_down, b_down):
    k_tile, _, interpret, partial = static
    return fused_ffn(x, gamma, beta, w_up, b_up, w_down, b_down,
                     k_tile=k_tile, interpret=interpret, partial=partial)


def _fused_ffn_fwd(static, *args):
    # Residuals are just the primals: the backward rematerializes the
    # intermediates in VMEM (jax.checkpoint semantics).
    return _fused_ffn_ad(static, *args), args


def _fused_ffn_bwd_rule(static, residuals, g):
    k_tile, bwd, interpret, partial = static
    if bwd:
        x, gamma, beta, w_up, b_up, w_down, b_down = residuals
        return fused_ffn_bwd(x, g, gamma, beta, w_up, b_up, w_down, b_down,
                             k_tile=k_tile, interpret=interpret,
                             partial=partial)
    _, vjp = jax.vjp(
        lambda *a: xla_ffn(*a, partial=partial), *residuals)
    return vjp(g)


_fused_ffn_ad.defvjp(_fused_ffn_fwd, _fused_ffn_bwd_rule)


def fused_ffn_ad(
    x, gamma, beta, w_up, b_up, w_down, b_down, *,
    k_tile: Optional[int] = None,
    bwd: bool = True,
    interpret: bool = False,
    partial: bool = False,
):
    """Differentiable fused FFN sublayer: Pallas forward + selectable
    backward — the single-kernel fused backward (``bwd=True``) or XLA
    rematerialize-and-autodiff (``bwd=False``). Safe under ``jax.grad``;
    use ``fused_ffn_train_ready`` to pick it safely on a real backend.
    ``partial``: tensor-parallel hidden-dim shard (see ``fused_ffn``)."""
    static = (k_tile, bool(bwd), interpret, bool(partial))
    return _fused_ffn_ad(static, x, gamma, beta, w_up, b_up, w_down, b_down)


def xla_ffn(x, gamma, beta, w_up, b_up, w_down, b_down,
            partial: bool = False) -> jax.Array:
    """The same sublayer through plain XLA ops — mirrors
    ``models/dual_path._FFNSublayer`` (kept in sync by
    ``tests/test_dpt_pallas.py``); the probe's numerics reference and
    timing baseline. ``partial``: hidden-dim column shard, down
    projection only (same contract as ``fused_ffn``; ``b_down`` unused)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + _EPS)
         * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    y = y.astype(x.dtype)
    y = y @ w_up.astype(x.dtype) + b_up.astype(x.dtype)
    y = jax.nn.gelu(y)
    if partial:
        return y @ w_down.astype(x.dtype)
    y = y @ w_down.astype(x.dtype) + b_down.astype(x.dtype)
    return x + y


# --------------------------------------------------------------------------
# Probe / autotune registry (same discipline as dpt_attention's).
# --------------------------------------------------------------------------

# (M, Kp, B, F, dtype-str) -> k_tile int (use fused) | None (XLA wins).
# M (batch) is part of the key: the custom call is a fusion barrier whose
# in-model cost is batch-dependent, so winners raced at one batch must not
# be trusted at another.
_FFN_READY: dict = {}
_FFN_PROBED: set = set()
# (M, B, F, dtype-str) -> first raced winner; later shapes of the same config
# only compile+numerics-verify it instead of re-racing
_FFN_CONFIG_WINNERS: dict = {}
# same key as _FFN_READY -> fastest numerics-passing fused k_tile even when
# XLA won the isolated race — the in-model validator's promotion candidate
_FFN_BEST_FUSED: dict = {}


def fused_ffn_ready(M: int, Kp: int, B: int, F: int, dtype, interpret: bool):
    """Trace-time gate. Returns a ``k_tile`` (or "auto" in interpret mode)
    when the fused kernel may engage for this shape, else None. On a real
    backend a shape is only enabled after ``probe_fused_ffn`` compiled,
    numerics-checked AND raced it at this batch."""
    if interpret:
        return "auto"
    return _FFN_READY.get((M, Kp, B, F, str(jnp.dtype(dtype))))


def probe_fused_ffn(
    *,
    M: int,
    Kp: int,
    B: int,
    F: int,
    dtype=jnp.bfloat16,
    retries: int = 2,
    verbose: bool = False,
    interpret: bool = False,
    autotune: bool = True,
    check_numerics: Optional[bool] = None,
    only_tile: Optional[int] = None,
):
    """AOT-compile, numerics-gate, and race the fused FFN kernel against
    the XLA sublayer at one concrete shape. Records the winning ``k_tile``
    (or None = XLA) in the registry and returns it."""
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _numerics_tol,
        _race,
        _verify_numerics,
    )

    if check_numerics is None:
        check_numerics = not interpret

    key = (M, Kp, B, F, str(jnp.dtype(dtype)))
    # on-device probe arrays (host->device = one PRNG key; relay bandwidth)
    from convtasnet_tpu.ops.pallas.tcn_block import _probe_inputs

    rng = np.random.default_rng(0)
    x, w_up, w_down = _probe_inputs(
        [((M, Kp, B), 1.0), ((B, F), 1.0 / np.sqrt(B)),
         ((F, B), 1.0 / np.sqrt(F))], dtype)
    gamma = jnp.ones((B,), jnp.float32)
    beta = jnp.zeros((B,), jnp.float32)
    b_up = jnp.asarray(rng.standard_normal((F,)) * 0.02, jnp.float32)
    b_down = jnp.asarray(rng.standard_normal((B,)) * 0.02, jnp.float32)
    wargs = (gamma, beta, w_up, b_up, w_down, b_down)

    def xla_fn(xx):
        return xla_ffn(xx, *wargs)

    if only_tile is not None:
        tiles = [int(only_tile)]
    else:
        auto = _pick_k_tile(Kp, B, F)
        tiles = [auto]
        if auto % 2 == 0 and auto // 2 >= 256:
            tiles.append(auto // 2)
    compiled, aot = {}, {}
    for kt in tiles:
        name = f"kt{kt}"
        fn = functools.partial(fused_ffn, k_tile=kt, interpret=interpret)
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

            print(f"dpt ffn probe {key}: kt{kt} compile failed "
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
                print(f"dpt ffn probe {key}: numerics vs xla (tol {tol:g})"
                      f": {detail}", file=_sys.stderr)
            else:
                print(f"dpt ffn probe {key}: numerics UNVERIFIED "
                      f"(xla reference failed)", file=_sys.stderr)
            for nm in sorted(set(compiled) - ok):
                print(f"dpt ffn probe {key} {nm}: REJECTED on numerics "
                      f"(rel err {errs[nm]:.2e})", file=_sys.stderr)
        compiled = {nm: f for nm, f in compiled.items() if nm in ok}
    if not compiled:
        best = None
    elif autotune and not interpret:
        best, timed = _race(compiled, xla_fn, x, inner=100)
        fused_times = {nm: t for nm, t in timed.items() if nm != "xla"}
        if fused_times:
            _FFN_BEST_FUSED[key] = int(
                min(fused_times, key=fused_times.get)[2:])
        if verbose:
            import sys as _sys

            detail = " ".join(f"{k_}={v * 1e3:.3f}ms"
                              for k_, v in sorted(timed.items()))
            print(f"dpt ffn probe {key}: best={best or 'xla'} ({detail})",
                  file=_sys.stderr)
    else:
        best = next(iter(compiled))
    win = int(best[2:]) if best else None
    _FFN_READY[key] = win
    return win


# (Kp, B, F, dtype-str) -> True (fused pair) | None (autodiff)
_FFN_BWD_READY: dict = {}
_FFN_BWD_CONFIG: dict = {}


def fused_ffn_train_ready(M: int, Kp: int, B: int, F: int, dtype,
                          interpret: bool):
    """Trace-time gate for the fused FFN train pair (Pallas forward +
    fused single-kernel backward). True when this shape's pair compiled,
    won the on-device race against XLA autodiff AND reproduced all seven
    autodiff cotangents; None keeps plain autodiff. Interpret mode returns
    True (correctness testing)."""
    if interpret:
        return True
    return _FFN_BWD_READY.get((M, Kp, B, F, str(jnp.dtype(dtype))))


def probe_fused_ffn_train(
    *,
    M: int,
    Kp: int,
    B: int,
    F: int,
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
    must also reproduce ALL seven autodiff cotangents on-device before it
    is recorded."""
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _numerics_tol,
        _race,
    )

    if check_numerics is None:
        check_numerics = not interpret

    key = (M, Kp, B, F, str(jnp.dtype(dtype)))
    if verify_only and _FFN_BWD_READY.get(key) is None:
        return None
    from convtasnet_tpu.ops.pallas.tcn_block import _probe_inputs

    rng = np.random.default_rng(0)
    x, w_up, w_down = _probe_inputs(
        [((M, Kp, B), 1.0), ((B, F), 1.0 / np.sqrt(B)),
         ((F, B), 1.0 / np.sqrt(F))], dtype)
    gamma = jnp.ones((B,), jnp.float32)
    beta = jnp.zeros((B,), jnp.float32)
    b_up = jnp.asarray(rng.standard_normal((F,)) * 0.02, jnp.float32)
    b_down = jnp.asarray(rng.standard_normal((B,)) * 0.02, jnp.float32)
    wargs = (gamma, beta, w_up, b_up, w_down, b_down)
    kt = _FFN_READY.get(key) or _pick_k_tile(Kp, B, F)

    def grad_fn(sublayer, argnums):
        """x -> dx with the requested input cotangents computed."""

        def f(xx):
            def loss(*a):
                return jnp.sum(sublayer(*a).astype(jnp.float32))

            grads = jax.grad(loss, argnums=argnums)(xx, *wargs)
            return grads[0].astype(xx.dtype)

        return f

    def fused(xx, *a):
        return fused_ffn_ad(xx, *a, k_tile=kt, bwd=True,
                            interpret=interpret)

    all_args = tuple(range(7))
    fn = grad_fn(fused, all_args)
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

            print(f"dpt ffn train probe {key}: compile failed "
                  f"({type(err).__name__})", file=_sys.stderr)
        _FFN_BWD_READY[key] = None
        return None
    if verify_only:
        best = True
    elif autotune and not interpret:
        best_name, timed = _race(
            {"fused": fn}, grad_fn(xla_ffn, all_args), x, inner=30)
        best = best_name is not None
        if verbose:
            import sys as _sys

            detail = " ".join(f"{k_}={v * 1e3:.3f}ms"
                              for k_, v in sorted(timed.items()))
            print(f"dpt ffn train probe {key}: best="
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

                return jax.grad(loss, argnums=all_args)(xx, *wargs)

            return f

        from convtasnet_tpu.ops.pallas.tcn_block import _rel_err_device

        try:
            ref = jax.jit(full_grads(xla_ffn))(x)  # stays on device
            got = jax.jit(full_grads(fused))(x)
            merr = float(jax.device_get(_rel_err_device(got, ref)))
            ok = merr <= tol
        except Exception:  # noqa: BLE001 — reference failed: cannot verify
            ok, merr = True, float("nan")
        if verbose:
            import sys as _sys

            state = "ok" if ok else "REJECTED"
            print(f"dpt ffn train probe {key}: grads numerics vs autodiff "
                  f"(tol {tol:g}): max rel err {merr:.2e} [{state}]",
                  file=_sys.stderr)
        if not ok:
            best = False
    win = True if best else None
    _FFN_BWD_READY[key] = win
    return win


def ensure_probed_dpt_ffn_train(cfg, batch: int, T: int,
                                verbose: bool = True) -> None:
    """Probe the fused FFN train pair for a concrete [batch, T] shape
    (idempotent per shape; no-op on CPU). Probes the inference forward
    first (the train pair reuses its k_tile winner); winners persist in
    the shared autotune cache under ``dpt:ffn-train:`` keys."""
    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "dpt"):
        return
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
    )

    K = (T - cfg.kernel_size) // cfg.stride + 1
    S = cfg.dpt_chunk
    Kp = -(-K // S) * S
    B = cfg.bottleneck
    F = cfg.dpt_ff
    dt = str(jnp.dtype(cfg.compute_dtype))
    key = (batch, Kp, B, F, dt)
    shape_key = ("dpt-ffn-train",) + key
    if shape_key in _FFN_PROBED:
        return
    if probe_budget.exhausted():
        if verbose:
            import sys as _sys

            print("dpt ffn train probe: probe budget exhausted -> xla this run "
                  "(undecided at this shape)", file=_sys.stderr)
        return
    ensure_probed_dpt_ffn(cfg, batch, T, verbose=verbose)
    disk_key = "dpt:ffn-train:" + ":".join(str(v) for v in shape_key[1:])
    cached = _autotune_cache_load().get(disk_key)  # truthy: {} re-probes
    kw = dict(M=batch, Kp=Kp, B=B, F=F,
              dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose)
    if cached:
        win = cached.get("train")
        _FFN_BWD_READY[key] = True if win else None
        _FFN_PROBED.add(shape_key)
        if verbose:
            import sys as _sys

            print(f"dpt ffn train probe: autotune winner loaded from disk "
                  f"({disk_key} -> {win})", file=_sys.stderr)
        if win:
            probe_fused_ffn_train(verify_only=True, autotune=False,
                                  check_numerics=False, **kw)
        return
    cfg_key = (batch, B, F, dt)
    if cfg_key in _FFN_BWD_CONFIG:
        # config already raced at another shape: skip the timing race but
        # keep the compile + cotangent-numerics gate at THIS shape
        if _FFN_BWD_CONFIG[cfg_key] is None:
            _FFN_BWD_READY[key] = None
            win = None
        else:
            win = probe_fused_ffn_train(autotune=False, **kw)
    else:
        win = probe_fused_ffn_train(**kw)
        if win is not None or not probe_budget.exhausted():
            _FFN_BWD_CONFIG[cfg_key] = win
    if win is None and probe_budget.exhausted():
        return  # budget-cut race is not evidence: don't persist/memoize
    _autotune_cache_store(disk_key, {"train": bool(win) if win else None})
    _FFN_PROBED.add(shape_key)


def ensure_probed_dpt_ffn(cfg, batch: int, T: int,
                          verbose: bool = True) -> None:
    """Probe the fused FFN kernel for a concrete [batch, T] input to a
    dual-path config (idempotent per shape; no-op on CPU). Winners persist
    in the shared autotune cache under ``dpt:ffn:`` keys. Called from
    ``dpt_attention.ensure_probed_dpt`` so every DPT entry point probes
    both fused sublayers."""
    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "dpt"):
        return
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
    )

    K = (T - cfg.kernel_size) // cfg.stride + 1
    S = cfg.dpt_chunk
    Kp = -(-K // S) * S
    B = cfg.bottleneck
    F = cfg.dpt_ff
    dt = str(jnp.dtype(cfg.compute_dtype))
    key = (batch, Kp, B, F, dt)
    cfg_key = (batch, B, F, dt)
    shape_key = ("dpt-ffn",) + key
    if shape_key in _FFN_PROBED:
        return
    if probe_budget.exhausted():
        if verbose:
            import sys as _sys

            print("dpt ffn probe: probe budget exhausted -> xla this run "
                  "(undecided at this shape)", file=_sys.stderr)
        return
    disk_key = "dpt:ffn:" + ":".join(str(v) for v in shape_key[1:])
    cached = _autotune_cache_load().get(disk_key)  # truthy: {} re-probes
    kw = dict(M=batch, Kp=Kp, B=B, F=F,
              dtype=jnp.dtype(cfg.compute_dtype), verbose=verbose)
    if cached:
        win = cached.get("ffn")
        _FFN_READY[key] = int(win) if win is not None else None
        bf = cached.get("best_fused")
        if bf is not None:  # rehydrate the in-model promotion candidate
            _FFN_BEST_FUSED[key] = int(bf)
        _FFN_CONFIG_WINNERS.setdefault(cfg_key, _FFN_READY[key])
        _FFN_PROBED.add(shape_key)
        if verbose:
            import sys as _sys

            print(f"dpt ffn probe: autotune winner loaded from disk "
                  f"({disk_key} -> {win})", file=_sys.stderr)
        if win is not None:
            probe_fused_ffn(autotune=False, check_numerics=False,
                            only_tile=int(win), **kw)
        return
    if cfg_key in _FFN_CONFIG_WINNERS:
        prev = _FFN_CONFIG_WINNERS[cfg_key]
        if prev is None:
            _FFN_READY[key] = None
            win = None
        else:
            win = probe_fused_ffn(autotune=False, only_tile=int(prev), **kw)
    else:
        win = probe_fused_ffn(**kw)
        if win is not None or not probe_budget.exhausted():
            _FFN_CONFIG_WINNERS[cfg_key] = win
    if win is None and probe_budget.exhausted():
        return  # budget-cut race is not evidence: don't persist/memoize
    _autotune_cache_store(disk_key, {"ffn": win,
                                     "best_fused": _FFN_BEST_FUSED.get(key)})
    _FFN_PROBED.add(shape_key)
