"""Tensor-parallel dual-path inference with per-shard fused kernels.

The GSPMD tensor-parallel path (``tensor_parallel.make_gspmd_forward``)
must demote the fused Pallas sublayer kernels under a real model split:
a ``pallas_call`` is a custom call XLA cannot auto-partition, so GSPMD
would de-shard its operands (``demote_pallas_for_model_parallel``). This
module is the explicit alternative for serving: a hand-written
``shard_map`` over the (data, model) mesh in which every device runs the
fused sublayer kernels on its own HEAD GROUP and one ``psum`` per
sublayer combines the partial output projections — the Megatron
g-operator, with the kernels intact.

Sharding (Megatron attention split, head-aligned):

- activations [M, n, S, B] are replicated over ``model`` (batch-sharded
  over ``data``); every LN runs shard-locally on the full channel dim;
- ``W_qkv [B, 3B]`` column-shards BY HEAD GROUP: shard ``i`` holds
  ``[B, 3*B/m]`` = the q|k|v columns of heads ``i*h/m .. (i+1)*h/m``
  (note: this is NOT a contiguous column split of the concatenated
  [B, 3B] matrix — q, k and v each split separately);
- attention is per-head, hence fully shard-local;
- ``W_out [B, B]`` row-shards to ``[B/m, B]``; partial projections
  ``psum`` over ``model`` and the residual is added once;
- the FFN splits its hidden dim: ``W_up [B, F/m]``, ``W_down [F/m, B]``,
  GELU shard-local, partial down-projections ``psum`` (down bias added
  once after the psum);
- encoder / decoder / bottleneck / mask head are replicated over
  ``model`` (B-wide work, a few % of the FLOPs).

The fused kernels run in their ``partial=True`` mode (projection-only
output; see ``ops/pallas/dpt_{attention,intra,ffn}.py``) and keep the
usual probe discipline: ``ensure_probed_dpt_tp`` AOT-compiles each
partial kernel at the LOCAL widths, numerics-gates it on-device against
the partial XLA sublayer, races it, and persists winners under
``dpt:tp:*`` keys. An unprobed / losing shape falls back to the partial
XLA math inside the same shard_map — the parallel decomposition never
changes, only the per-shard implementation.

Reference parity: the reference has no tensor parallelism (its model
does not need it, ``src/conv_tasnet.py``); this is a TPU-native scaling
capability for wider dual-path variants (SURVEY §2 parallelism rows).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.functional import (
    decode_frames,
    encode_frames,
    mask_from_scores,
)
from convtasnet_tpu.ops.frames import frame_signal, overlap_and_add

NEG_INF = -1e9


# --------------------------------------------------------------------------
# Weight resharding: full variables -> head-aligned stacked TP shards.
# --------------------------------------------------------------------------

def _stack_cols(w: jax.Array, m: int) -> jax.Array:
    """[A, F] -> [m, A, F/m] (column shards stacked on a leading axis)."""
    return jnp.stack(jnp.split(w, m, axis=1))


def _stack_rows(w: jax.Array, m: int) -> jax.Array:
    """[F, A] -> [m, F/m, A] (row shards stacked on a leading axis)."""
    return jnp.stack(jnp.split(w, m, axis=0))


def _stack_qkv(w_qkv: jax.Array, m: int) -> jax.Array:
    """[B, 3B] -> [m, B, 3*B/m], splitting q, k, v EACH by head group.

    Shard ``i``'s local matrix is ``concat(q[:, i], k[:, i], v[:, i])``
    so the kernels' ``jnp.split(qkv, 3)`` convention holds per shard.
    """
    q, k, v = jnp.split(w_qkv, 3, axis=1)
    return jnp.concatenate(
        [_stack_cols(q, m), _stack_cols(k, m), _stack_cols(v, m)], axis=2)


def dpt_tp_variables(
    cfg: ConvTasNetConfig, variables: Dict[str, Any], n_model: int,
) -> Dict[str, Any]:
    """Reshard a trained variable pytree for the TP shard_map forward.

    Per-layer attention/FFN weights are replaced by per-shard slices
    stacked on a new leading ``model`` axis (see module docstring);
    everything else passes through unchanged (replicated). ``n_model``
    must divide ``cfg.dpt_num_heads`` and ``cfg.dpt_ff``.
    """
    h = cfg.dpt_num_heads
    if h % n_model:
        raise ValueError(
            f"model axis {n_model} must divide n_heads {h} (head-aligned "
            f"Megatron split)")
    if cfg.dpt_ff % n_model:
        raise ValueError(
            f"model axis {n_model} must divide dpt_ff {cfg.dpt_ff}")

    def att(p):
        return {
            "norm": dict(p["norm"]),
            "qkv": {"kernel": _stack_qkv(p["qkv"]["kernel"], n_model)},
            "out": {"kernel": _stack_rows(p["out"]["kernel"], n_model)},
        }

    def ffn(p):
        return {
            "norm": dict(p["norm"]),
            "up": {"kernel": _stack_cols(p["up"]["kernel"], n_model),
                   "bias": jnp.stack(
                       jnp.split(p["up"]["bias"], n_model))},
            "down": {"kernel": _stack_rows(p["down"]["kernel"], n_model),
                     "bias": p["down"]["bias"]},
        }

    params = variables["params"]
    sep_in = params["separator"]
    sep = {k: v for k, v in sep_in.items()
           if not k.startswith("layer_")}
    for i in range(cfg.dpt_layers):
        lp = sep_in[f"layer_{i}"]
        sep[f"layer_{i}"] = {
            "intra_att": att(lp["intra_att"]),
            "intra_ffn": ffn(lp["intra_ffn"]),
            "inter_att": att(lp["inter_att"]),
            "inter_ffn": ffn(lp["inter_ffn"]),
        }
    out = dict(variables)
    out["params"] = dict(params)
    out["params"]["separator"] = sep
    return out


def _tp_var_specs(cfg: ConvTasNetConfig, tpvars: Dict[str, Any],
                  model_axis: str):
    """PartitionSpec pytree for ``dpt_tp_variables`` output: the stacked
    leading axis shards over ``model``; everything else replicates."""
    def att():
        return {"norm": {"gamma": P(), "beta": P()},
                "qkv": {"kernel": P(model_axis)},
                "out": {"kernel": P(model_axis)}}

    def ffn():
        return {"norm": {"gamma": P(), "beta": P()},
                "up": {"kernel": P(model_axis), "bias": P(model_axis)},
                "down": {"kernel": P(model_axis), "bias": P()}}

    sep: Dict[str, Any] = {
        "input_norm": {"gamma": P(), "beta": P()},
        "bottleneck": {"kernel": P()},
        "output_norm": {"gamma": P(), "beta": P()},
        "mask_conv": P(),
    }
    for i in range(cfg.dpt_layers):
        sep[f"layer_{i}"] = {
            "intra_att": att(), "intra_ffn": ffn(),
            "inter_att": att(), "inter_ffn": ffn(),
        }
    specs: Dict[str, Any] = {
        "params": {
            "encoder": {"w": P()},
            "decoder": {"w": P()},
            "separator": sep,
        }
    }
    for k in tpvars:
        if k != "params":
            specs[k] = jax.tree_util.tree_map(lambda _: P(), tpvars[k])
    return specs


# --------------------------------------------------------------------------
# Probe / autotune registry for the PARTIAL kernels (local TP widths).
# --------------------------------------------------------------------------

# ("intra"/"inter", n, S, B, h_local, Bq, dt) -> tile | None (XLA)
# ("ffn", Kp, B, F_local, dt)                -> tile | None (XLA)
_TP_READY: dict = {}
_TP_PROBED: set = set()


def _tp_ready(sub: str, key: tuple, interpret: bool):
    """Trace-time gate for a partial fused kernel at local TP widths.
    Interpret mode engages unconditionally (correctness testing); on a
    real backend the shape must have been probed by
    ``ensure_probed_dpt_tp``."""
    if interpret:
        return "auto"
    return _TP_READY.get((sub,) + key)


def _probe_tp_sub(sub: str, key: tuple, candidates: dict, xla_fn, x,
                  dtype, verbose: bool, only_tile=None):
    """Shared probe body: AOT-compile each partial-kernel candidate,
    numerics-gate against the partial XLA sublayer on-device, race on
    time. Records tile | None in ``_TP_READY`` and returns it."""
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _numerics_tol,
        _race,
        _verify_numerics,
    )

    compiled, aot = {}, {}
    for name, fn in candidates.items():
        if only_tile is not None and name != f"t{only_tile}":
            continue
        err = None
        for _ in range(3):
            try:
                aot[name] = jax.jit(fn).lower(x).compile()
                compiled[name] = fn
                err = None
                break
            except Exception as e:  # noqa: BLE001 — any compile failure
                err = e
        if err is not None and verbose:
            import sys as _sys

            print(f"dpt tp probe {sub} {key}: {name} compile failed "
                  f"({type(err).__name__})", file=_sys.stderr)
    if compiled:
        tol = _numerics_tol(dtype)
        ok, errs, verified = _verify_numerics(
            {nm: (lambda _e=aot[nm]: _e(x)) for nm in compiled},
            lambda: jax.jit(xla_fn)(x), tol)
        if verbose:
            import sys as _sys

            if verified:
                detail = " ".join(f"{k_}={errs[k_]:.2e}"
                                  for k_ in sorted(errs))
                print(f"dpt tp probe {sub} {key}: numerics vs xla "
                      f"(tol {tol:g}): {detail}", file=_sys.stderr)
            for nm in sorted(set(compiled) - ok):
                print(f"dpt tp probe {sub} {key} {nm}: REJECTED on "
                      f"numerics (rel err {errs[nm]:.2e})",
                      file=_sys.stderr)
        compiled = {nm: f for nm, f in compiled.items() if nm in ok}
    if not compiled:
        best = None
    elif only_tile is not None:
        best = next(iter(compiled))
    else:
        best, timed = _race(compiled, xla_fn, x, inner=100)
        if verbose:
            import sys as _sys

            detail = " ".join(f"{k_}={v * 1e3:.3f}ms"
                              for k_, v in sorted(timed.items()))
            print(f"dpt tp probe {sub} {key}: best={best or 'xla'} "
                  f"({detail})", file=_sys.stderr)
    win = int(best[1:]) if best else None
    _TP_READY[(sub,) + key] = win
    return win


def _probe_tp_train_sub(sub: str, key: tuple, fused_grad, xla_grad, x,
                        dtype, verbose: bool, race: bool = True,
                        registry: dict = None, tag: str = "dpt tp"):
    """Probe one partial TRAIN pair: compile the fused custom-VJP x->dx,
    verify ALL cotangents against partial-XLA autodiff on-device, race on
    time (``race=False`` skips the timing race — used to re-verify a
    disk-cached winner in a fresh process, same discipline as the
    forward's cached path). Records True | None in ``registry`` (default
    ``_TP_READY``) under ``<sub>-train``. Also the train-probe body for
    the TCN TP stage-2 pair (``ops/pallas/tcn_block_tp``), which passes
    its own registry."""
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _numerics_tol,
        _race,
        _rel_err_device,
    )

    if registry is None:
        registry = _TP_READY
    err = None
    for _ in range(3):
        try:
            jax.jit(fused_grad).lower(x).compile()
            err = None
            break
        except Exception as e:  # noqa: BLE001 — any compile failure
            err = e
    if err is not None:
        if verbose:
            import sys as _sys

            print(f"{tag} train probe {sub} {key}: compile failed "
                  f"({type(err).__name__})", file=_sys.stderr)
        registry[(sub + "-train",) + key] = None
        return None
    if race:
        best_name, timed = _race({"fused": fused_grad}, xla_grad, x,
                                 inner=30)
        best = best_name is not None
        if verbose:
            import sys as _sys

            detail = " ".join(f"{k_}={v * 1e3:.3f}ms"
                              for k_, v in sorted(timed.items()))
            print(f"{tag} train probe {sub} {key}: best="
                  f"{'fused' if best else 'xla'} ({detail})",
                  file=_sys.stderr)
    else:
        best = True
    if best:
        tol = 2 * _numerics_tol(dtype)
        try:
            # compared ON DEVICE: only the scalar crosses the relay
            ref = jax.jit(xla_grad, static_argnums=(1,))(x, True)
            got = jax.jit(fused_grad, static_argnums=(1,))(x, True)
            merr = float(jax.device_get(_rel_err_device(got, ref)))
            ok = merr <= tol
        except Exception:  # noqa: BLE001 — reference failed
            ok, merr = True, float("nan")
        if verbose:
            import sys as _sys

            state = "ok" if ok else "REJECTED"
            print(f"{tag} train probe {sub} {key}: grads vs autodiff "
                  f"(tol {tol:g}): max rel err {merr:.2e} [{state}]",
                  file=_sys.stderr)
        if not ok:
            best = False
    win = True if best else None
    registry[(sub + "-train",) + key] = win
    return win


def ensure_probed_dpt_tp(cfg: ConvTasNetConfig, n_model: int, batch: int,
                         T: int, verbose: bool = True,
                         train: bool = False) -> None:
    """Probe the three PARTIAL fused sublayer kernels at the local widths
    a ``n_model``-way head split produces, for a concrete per-device
    ``[batch, T]`` input (idempotent; no-op on CPU). Winners persist in
    the shared autotune cache under ``dpt:tp:*`` keys.

    ``train=True`` additionally probes the partial custom-VJP TRAIN
    pairs (fused single-kernel backwards): each must compile, win the
    race against partial-XLA autodiff AND reproduce all cotangents
    on-device before the TP train step engages it (``dpt:tp:*-train``
    keys).

    Runs on a single device: a TP shard executes exactly this shape, so
    one chip's probe validates and times what every shard will run.
    """
    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "dpt"):
        return
    from convtasnet_tpu.ops.pallas.dpt_attention import (
        _pick_s_tile,
        fused_inter_attention,
        xla_inter_attention,
    )
    from convtasnet_tpu.ops.pallas.dpt_ffn import (
        _pick_k_tile,
        fused_ffn,
        xla_ffn,
    )
    from convtasnet_tpu.ops.pallas.dpt_intra import (
        _chunk_tiles,
        fused_intra_attention,
        xla_intra_attention,
    )
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
    )

    h = cfg.dpt_num_heads
    if n_model <= 1 or h % n_model or cfg.dpt_ff % n_model:
        return
    K = (T - cfg.kernel_size) // cfg.stride + 1
    S = cfg.dpt_chunk
    n = -(-K // S)
    Kp = n * S
    B = cfg.bottleneck
    h_l = h // n_model
    Bl = B // n_model
    Fl = cfg.dpt_ff // n_model
    dtype = jnp.dtype(cfg.compute_dtype)
    dt = str(dtype)
    rng = np.random.default_rng(0)
    gamma = jnp.ones((B,), jnp.float32)
    beta = jnp.zeros((B,), jnp.float32)
    valid = np.ones((n, S), bool)
    valid[-1, S // 2:] = False
    bias = jnp.asarray(np.where(valid, 0.0, NEG_INF), jnp.float32)

    shape_tag = f"{batch}:{n}:{S}:{B}:{h_l}:{Bl}:{Fl}:{dt}"
    fwd_done = shape_tag in _TP_PROBED
    train_done = (shape_tag + ":train") in _TP_PROBED
    if fwd_done and (not train or train_done):
        return

    # --- attention partials (shared random operands) ---
    x4 = jnp.asarray(rng.standard_normal((batch, n, S, B)), dtype)
    w_qkv = jnp.asarray(
        rng.standard_normal((B, 3 * Bl)) / np.sqrt(B), dtype)
    w_out = jnp.asarray(
        rng.standard_normal((Bl, B)) / np.sqrt(Bl), dtype)

    att_key = (n, S, B, h_l, Bl, dt)
    if fwd_done:
        return _probe_tp_train_all(cfg, shape_tag, att_key, x4, gamma,
                                   beta, w_qkv, w_out, bias, batch, Kp, B,
                                   Fl, dtype, verbose)
    for sub, fused_fn, xla_ref, tiles, tile_kw in (
        ("intra", fused_intra_attention, xla_intra_attention,
         _chunk_tiles(n), "c_tile"),
        ("inter", fused_inter_attention, xla_inter_attention,
         sorted({_pick_s_tile(n, S, h_l)}
                | ({S // 2} if S % 2 == 0 and S // 2 >= 128 else set()),
                reverse=True), "s_tile"),
    ):
        disk_key = f"dpt:tp:{sub}:" + shape_tag
        cached = _autotune_cache_load().get(disk_key)  # {} falsy: re-probe
        if cached:
            win = cached.get("tile")
            _TP_READY[(sub,) + att_key] = (
                int(win) if win is not None else None)
            if verbose:
                import sys as _sys

                print(f"dpt tp probe: autotune winner loaded from disk "
                      f"({disk_key} -> {win})", file=_sys.stderr)
            if win is not None:
                cands = {f"t{int(win)}": functools.partial(
                    fused_fn, gamma=gamma, beta=beta, w_qkv=w_qkv,
                    w_out=w_out, key_bias=bias, n_heads=h_l,
                    partial=True, **{tile_kw: int(win)})}
                _probe_tp_sub(sub, att_key, cands,
                              lambda xx, _f=xla_ref: _f(
                                  xx, gamma, beta, w_qkv, w_out, bias,
                                  n_heads=h_l, partial=True),
                              x4, dtype, verbose, only_tile=int(win))
            continue
        cands = {
            f"t{t}": functools.partial(
                fused_fn, gamma=gamma, beta=beta, w_qkv=w_qkv,
                w_out=w_out, key_bias=bias, n_heads=h_l, partial=True,
                **{tile_kw: t})
            for t in tiles
        }
        win = _probe_tp_sub(
            sub, att_key, cands,
            lambda xx, _f=xla_ref: _f(xx, gamma, beta, w_qkv, w_out,
                                      bias, n_heads=h_l, partial=True),
            x4, dtype, verbose)
        _autotune_cache_store(disk_key, {"tile": win})

    # --- FFN partial ---
    x3 = x4.reshape(batch, Kp, B)
    w_up = jnp.asarray(rng.standard_normal((B, Fl)) / np.sqrt(B), dtype)
    b_up = jnp.asarray(rng.standard_normal((Fl,)) * 0.02, jnp.float32)
    w_dn = jnp.asarray(rng.standard_normal((Fl, B)) / np.sqrt(Fl), dtype)
    b_dn = jnp.zeros((B,), jnp.float32)
    ffn_key = (Kp, B, Fl, dt)
    disk_key = "dpt:tp:ffn:" + shape_tag
    cached = _autotune_cache_load().get(disk_key)
    auto_kt = _pick_k_tile(Kp, B, Fl)
    kts = [auto_kt] + ([auto_kt // 2]
                       if auto_kt % 2 == 0 and auto_kt // 2 >= 256 else [])
    if cached:
        win = cached.get("tile")
        _TP_READY[("ffn",) + ffn_key] = (
            int(win) if win is not None else None)
        if verbose:
            import sys as _sys

            print(f"dpt tp probe: autotune winner loaded from disk "
                  f"({disk_key} -> {win})", file=_sys.stderr)
        if win is not None:
            cands = {f"t{int(win)}": functools.partial(
                fused_ffn, gamma=gamma, beta=beta, w_up=w_up, b_up=b_up,
                w_down=w_dn, b_down=b_dn, partial=True,
                k_tile=int(win))}
            _probe_tp_sub("ffn", ffn_key, cands,
                          lambda xx: xla_ffn(xx, gamma, beta, w_up, b_up,
                                             w_dn, b_dn, partial=True),
                          x3, dtype, verbose, only_tile=int(win))
    else:
        cands = {
            f"t{t}": functools.partial(
                fused_ffn, gamma=gamma, beta=beta, w_up=w_up, b_up=b_up,
                w_down=w_dn, b_down=b_dn, partial=True, k_tile=t)
            for t in kts
        }
        win = _probe_tp_sub(
            "ffn", ffn_key, cands,
            lambda xx: xla_ffn(xx, gamma, beta, w_up, b_up, w_dn, b_dn,
                               partial=True),
            x3, dtype, verbose)
        _autotune_cache_store(disk_key, {"tile": win})
    _TP_PROBED.add(shape_tag)
    if train:
        _probe_tp_train_all(cfg, shape_tag, att_key, x4, gamma, beta,
                            w_qkv, w_out, bias, batch, Kp, B, Fl, dtype,
                            verbose)


def _probe_tp_train_all(cfg, shape_tag, att_key, x4, gamma, beta, w_qkv,
                        w_out, bias, batch, Kp, B, Fl, dtype, verbose):
    """Probe the three partial TRAIN pairs at the local TP widths (only
    where the forward already has a fused winner). Winners persist under
    ``dpt:tp:*-train`` keys."""
    from convtasnet_tpu.ops.pallas.dpt_attention import (
        fused_inter_attention_ad,
        xla_inter_attention,
    )
    from convtasnet_tpu.ops.pallas.dpt_ffn import fused_ffn_ad, xla_ffn
    from convtasnet_tpu.ops.pallas.dpt_intra import (
        fused_intra_attention_ad,
        xla_intra_attention,
    )
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
    )

    if (shape_tag + ":train") in _TP_PROBED:
        return
    h_l = att_key[3]
    dt = att_key[-1]
    n = att_key[0]

    def grad_fn(sublayer, wargs):
        def f(xx, full=False):
            def loss(*a):
                return jnp.sum(sublayer(*a).astype(jnp.float32))

            grads = jax.grad(
                loss, argnums=tuple(range(1 + len(wargs))))(xx, *wargs)
            if full:
                return grads
            return grads[0].astype(xx.dtype)

        return f

    for sub, fused_ad, xla_ref, tile_kw, key, x in (
        ("intra", fused_intra_attention_ad, xla_intra_attention,
         "c_tile", att_key, x4),
        ("inter", fused_inter_attention_ad, xla_inter_attention,
         "s_tile", att_key, x4),
    ):
        fwd_win = _TP_READY.get((sub,) + key)
        if fwd_win is None:
            _TP_READY[(sub + "-train",) + key] = None
            continue
        disk_key = f"dpt:tp:{sub}-train:" + shape_tag
        cached = _autotune_cache_load().get(disk_key)
        wargs = (gamma, beta, w_qkv, w_out)
        fused_g = grad_fn(
            lambda *a, _f=fused_ad, _kw={tile_kw: int(fwd_win)}:
            _f(*a, bias, n_heads=h_l, bwd=True, partial=True, **_kw),
            wargs)
        xla_g = grad_fn(
            lambda *a, _f=xla_ref: _f(*a, bias, n_heads=h_l,
                                      partial=True),
            wargs)
        if cached:
            win = cached.get("train")
            if verbose:
                import sys as _sys

                print(f"dpt tp train probe: winner loaded from disk "
                      f"({disk_key} -> {win})", file=_sys.stderr)
            if win:
                # compile AND cotangent-verify the cached pair in this
                # process (cheap via the XLA disk cache); a mismatch
                # degrades to autodiff
                _probe_tp_train_sub(sub, key, fused_g, xla_g, x, dtype,
                                    verbose, race=False)
            else:
                _TP_READY[(sub + "-train",) + key] = None
            continue
        win = _probe_tp_train_sub(sub, key, fused_g, xla_g, x, dtype,
                                  verbose)
        _autotune_cache_store(disk_key, {"train": bool(win) if win
                                         else None})

    # FFN train pair
    ffn_key = (Kp, B, Fl, dt)
    fwd_win = _TP_READY.get(("ffn",) + ffn_key)
    if fwd_win is None:
        _TP_READY[("ffn-train",) + ffn_key] = None
    else:
        rng = np.random.default_rng(0)
        x3 = x4.reshape(batch, Kp, B)
        w_up = jnp.asarray(rng.standard_normal((B, Fl)) / np.sqrt(B),
                           dtype)
        b_up = jnp.asarray(rng.standard_normal((Fl,)) * 0.02, jnp.float32)
        w_dn = jnp.asarray(rng.standard_normal((Fl, B)) / np.sqrt(Fl),
                           dtype)
        b_dn = jnp.zeros((B,), jnp.float32)
        wargs = (gamma, beta, w_up, b_up, w_dn, b_dn)
        disk_key = "dpt:tp:ffn-train:" + shape_tag
        cached = _autotune_cache_load().get(disk_key)
        fused_g = grad_fn(
            lambda *a: fused_ffn_ad(*a, k_tile=int(fwd_win), bwd=True,
                                    partial=True), wargs)
        xla_g = grad_fn(lambda *a: xla_ffn(*a, partial=True), wargs)
        if cached:
            win = cached.get("train")
            if verbose:
                import sys as _sys

                print(f"dpt tp train probe: winner loaded from disk "
                      f"({disk_key} -> {win})", file=_sys.stderr)
            if win:
                _probe_tp_train_sub("ffn", ffn_key, fused_g, xla_g, x3,
                                    dtype, verbose, race=False)
            else:
                _TP_READY[("ffn-train",) + ffn_key] = None
        else:
            win = _probe_tp_train_sub("ffn", ffn_key, fused_g, xla_g, x3,
                                      dtype, verbose)
            _autotune_cache_store(disk_key, {"train": bool(win) if win
                                             else None})
    _TP_PROBED.add(shape_tag + ":train")


# --------------------------------------------------------------------------
# shard_map body.
# --------------------------------------------------------------------------

def _ln(prm, x):
    """LayerNorm over the last axis, f32 stats (``dual_path._LayerNorm``,
    eps 1e-6)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * prm["gamma"] + prm["beta"]).astype(x.dtype)


def _pvary_all(args, axes):
    """Promote every array to varying over ``axes`` (vma) where it isn't
    already. The fused partial custom-VJP pairs return cotangents that
    vary over BOTH mesh axes (each (data, model) shard computes its own
    piece), so their primals must too — and the pvary transposes insert
    exactly the Megatron backward collectives: psum of dx over ``model``,
    psum of weight grads over ``data``, psum of the LN affine grads over
    both. No-op outside vma-checked tracing."""
    pcast = getattr(jax.lax, "pcast", None)

    def one(v):
        try:
            have = jax.typeof(v).vma
        except Exception:  # noqa: BLE001 — no vma tracking here
            return v
        need = tuple(a for a in axes if a not in have)
        if not need:
            return v
        if pcast is not None:
            return pcast(v, need, to="varying")
        return jax.lax.pvary(v, need)

    return tuple(one(v) for v in args)


def _tp_att(lp, x, bias, h_l, attend_axis, use_pallas, interpret,
            model_axis, train=False, data_axis="data"):
    """One attention sublayer on this shard's head group + psum combine.

    x: [Ml, n, S, B] (replicated over model); lp holds the LOCAL weight
    shards ([1, B, 3*Bl] / [1, Bl, B] — leading axis is the shard's slice
    of the stacked weights). Returns x + psum(partial proj).

    ``train=True`` routes through the partial custom-VJP pair (fused
    single-kernel backward) when the ``*-train`` registry has this
    shape, else plain autodiff of the partial XLA math.
    """
    from convtasnet_tpu.ops.pallas.dpt_attention import (
        fused_inter_attention,
        fused_inter_attention_ad,
        xla_inter_attention,
    )
    from convtasnet_tpu.ops.pallas.dpt_intra import (
        fused_intra_attention,
        fused_intra_attention_ad,
        xla_intra_attention,
    )

    M, n, S, B = x.shape
    gamma, beta = lp["norm"]["gamma"], lp["norm"]["beta"]
    w_qkv = lp["qkv"]["kernel"][0]
    w_out = lp["out"]["kernel"][0]
    Bl = w_out.shape[0]
    sub = "intra" if attend_axis == 2 else "inter"
    fused = fused_intra_attention if sub == "intra" else \
        fused_inter_attention
    fused_ad = fused_intra_attention_ad if sub == "intra" else \
        fused_inter_attention_ad
    xla = xla_intra_attention if sub == "intra" else xla_inter_attention
    key = (n, S, B, h_l, Bl, str(x.dtype))
    tile = _tp_ready(sub, key, interpret) if use_pallas else None
    # fused train pairs never engage in interpret mode: Pallas'
    # HLO-interpreter internals can't trace under vma checking (the
    # train shard_map uses check_vma=True); on hardware the probed
    # registry decides
    trn = train and use_pallas and not interpret and \
        _tp_ready(sub + "-train", key, False) is not None
    if tile is not None and (not train or trn):
        kw = {"c_tile" if sub == "intra" else "s_tile":
              None if tile == "auto" else tile}
        if train:
            xv, gv, bv, wqv, wov, biv = _pvary_all(
                (x, gamma, beta, w_qkv, w_out, bias),
                (data_axis, model_axis))
            part = fused_ad(xv, gv, bv, wqv, wov, biv,
                            n_heads=h_l, bwd=True, interpret=interpret,
                            partial=True, **kw)
        else:
            part = fused(x, gamma, beta, w_qkv, w_out, bias, n_heads=h_l,
                         interpret=interpret, partial=True, **kw)
    else:
        part = xla(x, gamma, beta, w_qkv, w_out, bias, n_heads=h_l,
                   partial=True)
    return x + jax.lax.psum(part, model_axis)


def _tp_ffn(lp, x, use_pallas, interpret, model_axis, train=False,
            data_axis="data"):
    """One FFN sublayer on this shard's hidden slice + psum combine.

    x: [Ml, Kp, B]; lp holds [1, B, Fl] / [1, Fl] / [1, Fl, B] local
    shards (down bias replicated, added once after the psum).
    """
    from convtasnet_tpu.ops.pallas.dpt_ffn import (
        fused_ffn,
        fused_ffn_ad,
        xla_ffn,
    )

    M, Kp, B = x.shape
    gamma, beta = lp["norm"]["gamma"], lp["norm"]["beta"]
    w_up = lp["up"]["kernel"][0]
    b_up = lp["up"]["bias"][0]
    w_dn = lp["down"]["kernel"][0]
    b_dn = lp["down"]["bias"]
    Fl = w_up.shape[1]
    key = (Kp, B, Fl, str(x.dtype))
    tile = _tp_ready("ffn", key, interpret) if use_pallas else None
    trn = train and use_pallas and not interpret and \
        _tp_ready("ffn-train", key, False) is not None
    if tile is not None and (not train or trn):
        kt = None if tile == "auto" else tile
        if train:
            xv, gv, bv, wuv, buv, wdv, bdv = _pvary_all(
                (x, gamma, beta, w_up, b_up, w_dn, b_dn),
                (data_axis, model_axis))
            part = fused_ffn_ad(xv, gv, bv, wuv, buv, wdv, bdv,
                                k_tile=kt, bwd=True, interpret=interpret,
                                partial=True)
        else:
            part = fused_ffn(x, gamma, beta, w_up, b_up, w_dn, b_dn,
                             k_tile=kt, interpret=interpret, partial=True)
    else:
        part = xla_ffn(x, gamma, beta, w_up, b_up, w_dn, b_dn,
                       partial=True)
    return x + jax.lax.psum(part, model_axis) + b_dn.astype(x.dtype)


def _dpt_tp_shard_forward(cfg: ConvTasNetConfig, tpvars, mixture,
                          model_axis: str, n_model: int,
                          train: bool = False,
                          data_axis: str = "data"):
    """Local forward: mixture [M_local, T]; separator layer weights are
    this shard's head-group/hidden slices. Mirrors
    ``models/dual_path.DualPathSeparator`` + encoder/decoder exactly
    (positional encodings, pad masking, mask head)."""
    from convtasnet_tpu.models.dual_path import sinusoid_encoding

    params = tpvars["params"]
    x_in = mixture.astype(jnp.dtype(cfg.compute_dtype))
    frames = frame_signal(x_in, cfg.kernel_size, cfg.stride)
    w = encode_frames(params["encoder"], frames)        # [Ml, K, N]
    sep = params["separator"]
    S, B, h = cfg.dpt_chunk, cfg.bottleneck, cfg.dpt_num_heads
    h_l = h // n_model  # static local head count

    y = _ln(sep["input_norm"], w)
    y = y @ sep["bottleneck"]["kernel"].astype(y.dtype)
    M, K, _ = y.shape
    n = -(-K // S)
    Kp = n * S
    if Kp != K:
        y = jnp.pad(y, ((0, 0), (0, Kp - K), (0, 0)))
    x = y.reshape(M, n, S, B)
    frame_valid = (jnp.arange(Kp).reshape(n, S) < K)
    bias = jnp.where(frame_valid, 0.0, NEG_INF).astype(jnp.float32)

    intra_pos = jnp.asarray(sinusoid_encoding(S, B))
    inter_pos = jnp.asarray(sinusoid_encoding(n, B))
    x = x + intra_pos[None, None].astype(x.dtype) \
        + inter_pos[None, :, None].astype(x.dtype)

    use_pallas = bool(cfg.use_pallas)
    interpret = jax.default_backend() == "cpu"
    for i in range(cfg.dpt_layers):
        lp = sep[f"layer_{i}"]
        x = _tp_att(lp["intra_att"], x, bias, h_l, 2, use_pallas,
                    interpret, model_axis, train=train,
                    data_axis=data_axis)
        x = _tp_ffn(lp["intra_ffn"], x.reshape(M, Kp, B), use_pallas,
                    interpret, model_axis, train=train,
                    data_axis=data_axis).reshape(M, n, S, B)
        x = _tp_att(lp["inter_att"], x, bias, h_l, 1, use_pallas,
                    interpret, model_axis, train=train,
                    data_axis=data_axis)
        x = _tp_ffn(lp["inter_ffn"], x.reshape(M, Kp, B), use_pallas,
                    interpret, model_axis, train=train,
                    data_axis=data_axis).reshape(M, n, S, B)

    x = _ln(sep["output_norm"], x).reshape(M, Kp, B)[:, :K]
    score = jax.nn.relu(x) @ sep["mask_conv"].astype(x.dtype)
    mask = mask_from_scores(cfg, score)                 # [Ml, K, C, N]
    est = decode_frames(params["decoder"], w, mask)     # [Ml, C, K, L]
    out = overlap_and_add(est, cfg.stride)
    T = mixture.shape[-1]
    if out.shape[-1] < T:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, T - out.shape[-1])))
    return out.astype(jnp.float32)


def dpt_tp_forward(
    cfg: ConvTasNetConfig,
    variables: Dict[str, Any],
    mixture: jax.Array,
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
) -> jax.Array:
    """Dual-path forward over the full 2-D (data, model) mesh with the
    fused sublayer kernels running PER SHARD (head-group split).

    ``mixture [M, T]`` shards over ``data`` on the batch; each layer's
    attention heads and FFN hidden dim shard over ``model``; one psum
    per sublayer (4 per layer) combines partial projections. Numerically
    equivalent to the unsharded ``ConvTasNet(cfg).apply`` (tested on a
    virtual mesh, ``tests/test_dpt_tp.py``). Batch must divide the data
    axis; ``cfg.dpt_num_heads`` and ``cfg.dpt_ff`` must divide the model
    axis size. Returns [M, C, T].
    """
    if cfg.separator != "dpt":
        raise ValueError("dpt_tp_forward is the dual-path TP shard_map; "
                         "for the TCN use tensor_parallel.tp_forward")
    n_model = int(dict(mesh.shape).get(model_axis, 1))
    n_data = int(dict(mesh.shape).get(data_axis, 1))
    if n_model > 1:
        # populate the partial-kernel registries for the per-shard shape
        # (idempotent; no-op on CPU / with use_pallas off)
        ensure_probed_dpt_tp(cfg, n_model,
                             max(1, mixture.shape[0] // n_data),
                             mixture.shape[-1])
    tpv = dpt_tp_variables(cfg, variables, max(n_model, 1))
    specs = _tp_var_specs(cfg, tpv, model_axis)
    fn = jax.shard_map(
        functools.partial(_dpt_tp_shard_forward, cfg,
                          model_axis=model_axis, n_model=n_model),
        mesh=mesh,
        in_specs=(specs, P(data_axis, None)),
        out_specs=P(data_axis, None, None),
        check_vma=False,
    )
    return fn(tpv, mixture)


def make_dpt_tp_train_step(
    cfg: ConvTasNetConfig,
    tx,
    mesh: Mesh,
    donate: bool = True,
    model_axis: str = "model",
    data_axis: str = "data",
):
    """Dual-path TP train step with the fused kernels running PER SHARD.

    The GSPMD train step (``train/train_step.make_sharded_train_step``)
    demotes the fused kernels under a real model split; this explicit
    alternative keeps them: the loss shard_maps the forward over the
    (data, model) mesh with head-group weight shards and differentiates
    THROUGH the shard_map (``check_vma=True`` so the psum transposes are
    exact), routing each sublayer through its partial custom-VJP pair
    where the ``*-train`` registry is populated
    (``ensure_probed_dpt_tp(..., train=True)``), else partial-XLA
    autodiff.

    ``state.params`` stay in the CANONICAL layout — the head-aligned
    stacking (``dpt_tp_variables``) happens inside the jitted step and is
    differentiated through, so gradients, optimizer state, solver and
    checkpoints are all layout-unchanged. Returns a jitted
    ``step(state, batch) -> (state, metrics)`` with the
    ``make_train_step`` contract (batch = (mixture, lengths, sources,
    weights), weighted PIT SI-SNR loss).
    """
    import optax

    from convtasnet_tpu.losses.pit import pit_si_snr

    n_model = int(dict(mesh.shape).get(model_axis, 1))
    n_data = int(dict(mesh.shape).get(data_axis, 1))

    def body(tpv, mixture, lengths, sources, weights):
        est = _dpt_tp_shard_forward(cfg, tpv, mixture, model_axis,
                                    n_model, train=True,
                                    data_axis=data_axis)
        max_snr, _ = pit_si_snr(sources, est, lengths)
        lsum = -jnp.sum(max_snr * weights.astype(jnp.float32))
        return lsum[None]                   # [1] per data shard

    def loss_fn(params, batch):
        mixture, lengths, sources, weights = batch
        tpv = dpt_tp_variables(cfg, {"params": params}, n_model)
        specs = _tp_var_specs(cfg, tpv, model_axis)
        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, P(data_axis), P(data_axis), P(data_axis),
                      P(data_axis)),
            out_specs=P(data_axis),
        )
        lsums = sm(tpv, mixture, lengths, sources, weights)  # [n_data]
        wsum = jnp.maximum(jnp.sum(weights.astype(jnp.float32)), 1.0)
        return jnp.sum(lsums) / wsum

    def step_fn(st, batch):
        loss, grads = jax.value_and_grad(loss_fn)(st.params, batch)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        st = st.replace(step=st.step + 1, params=new_params,
                        opt_state=new_opt)
        return st, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    kwargs = {"donate_argnums": (0,)} if donate else {}
    jitted = jax.jit(step_fn, **kwargs)

    def multi_fn(st, batches):
        def body(s_, batch):
            return step_fn(s_, batch)

        return jax.lax.scan(body, st, batches)

    jitted_multi = jax.jit(multi_fn, **({"donate_argnums": (0,)}
                                        if donate else {}))

    degraded = []

    def _call_with_degrade(jfn, rebuild, st, arg, batch0):
        """Run the jitted step; if it fails to TRACE/LOWER with the fused
        train pairs engaged (the probes validate each pair OUTSIDE the
        shard_map; composing them INSIDE it is backend-dependent), clear
        the train registries and retrace with partial-XLA autodiff —
        training must not be blocked by a kernel-composition edge.

        Only a before-first-execution failure is retried: ``jax.jit``
        caches nothing on a trace error, and no buffer has been donated
        yet, so the retry (a FRESH jit, no stale cache) sees intact
        inputs. A failure on a later call (compiled executable exists)
        re-raises — that is a runtime error degradation cannot fix.
        """
        if n_model > 1 and not degraded:
            ensure_probed_dpt_tp(
                cfg, n_model, max(1, batch0.shape[0] // n_data),
                batch0.shape[-1], train=True)
        first = key_first(jfn)
        try:
            return jfn(st, arg)
        except Exception:  # noqa: BLE001 — vma/lowering failures
            if degraded or not first:
                raise
            degraded.append(True)
            for k in [k for k in _TP_READY if k[0].endswith("-train")]:
                _TP_READY[k] = None
            return rebuild()(st, arg)

    _called: set = set()

    def key_first(jfn):
        k = id(jfn)
        first = k not in _called
        _called.add(k)
        return first

    def multi_with_probe(st, batches):
        """``(state, batches[n_steps, ...]) -> (state, metrics[n_steps])``
        — the ``make_multi_train_step`` contract, scanning the TP step so
        several optimizer steps run per device dispatch."""
        return _call_with_degrade(
            jitted_multi,
            lambda: jax.jit(multi_fn, **({"donate_argnums": (0,)}
                                         if donate else {})),
            st, batches, batches[0][0])

    def step_with_probe(st, batch):
        return _call_with_degrade(
            jitted,
            lambda: jax.jit(step_fn, **kwargs),
            st, batch, batch[0])

    step_with_probe.multi = multi_with_probe
    return step_with_probe
