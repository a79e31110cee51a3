"""Tensor (channel) parallelism: shard the TCN's hidden dimension over the
``model`` mesh axis.

The reference has no tensor parallelism (SURVEY §2 parallelism table — the
11M-param model doesn't *need* it, but the capability gives headroom for
wider variants and demonstrates the full 2-D ``(data, model)`` mesh). The
sharding is the Megatron pattern adapted to the TCN block:

- ``W_in  [B, H]``  column-sharded ``P(None, 'model')`` — each shard computes
  its own ``H/m`` hidden channels;
- PReLU + depthwise conv are per-channel → fully local;
- gLN/cLN statistics are channel reductions → one tiny ``psum`` pair per
  norm over the ``model`` axis (two scalars for gLN, one ``[K]`` row-sum for
  cLN);
- ``W_out [H, B]``  row-sharded ``P('model', None)`` — partial products are
  combined with one ``psum`` per block (the Megatron g-operator);
- everything on the ``B``-wide bottleneck path (residual stream, bottleneck,
  mask head, encoder/decoder) is replicated across ``model`` and sharded on
  ``data`` over the batch.

``tp_forward`` is jit/shard_map-compiled over both axes at once and is
numerically identical to the unsharded model (tested on a 2x4 virtual mesh).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.functional import (
    decode_frames,
    encode_frames,
    separator_forward,
)
from convtasnet_tpu.ops.conv import depthwise_conv1d
from convtasnet_tpu.ops.frames import frame_signal, overlap_and_add

EPS = 1e-8


def demote_pallas_for_model_parallel(
    cfg: ConvTasNetConfig, mesh: Mesh, axis: str = "model",
) -> ConvTasNetConfig:
    """Return ``cfg`` with ``use_pallas`` cleared when ``mesh`` actually
    splits the model over ``axis``.

    The fused Pallas kernels assume full-width weights (all heads / the
    whole hidden dim in one VMEM-resident operand) and, being custom
    calls, cannot be auto-partitioned by GSPMD — under a Megatron split
    they would either de-shard the operands or compute on partial weights.
    Batch-only ("data") sharding is fine: the grids are batch-leading and
    partition over the data axis (tested in tests/test_parallel.py). A
    model axis of size 1 (the common 2-D mesh degenerate case) keeps the
    fused path.

    This demotion applies to the GSPMD (jit + NamedSharding) entries
    only; the explicit shard_map dual-path TP forward keeps the fused
    kernels by running their partial variants per shard
    (``parallel/dpt_tp.py``).
    """
    import dataclasses

    try:
        model_size = int(dict(mesh.shape).get(axis, 1))
    except Exception:
        model_size = 1
    if model_size > 1 and getattr(cfg, "use_pallas", False):
        return dataclasses.replace(cfg, use_pallas=False)
    return cfg


def param_partition_specs(cfg: ConvTasNetConfig, variables: Dict[str, Any]):
    """PartitionSpec pytree for the model variables under channel sharding.

    TCN: Megatron column/row split of the block matmuls on the hidden dim H.
    DPT: the attention QKV / FFN-up matmuls column-split and the output /
    FFN-down matmuls row-split over ``model`` (Megatron pattern on the
    attention block); GSPMD inserts the per-sublayer partial-sum reduce.
    Used by ``make_sharded_train_step`` for both families; the hand-written
    ``shard_map`` inference path (``tp_forward``) is TCN-only.
    """
    if cfg.separator == "dpt":
        return _dpt_partition_specs(cfg, variables)

    def block_spec():
        norm = {"gamma": P("model"), "beta": P("model")}
        return {
            "conv1x1": P(None, "model"),
            "prelu1": P(),
            "dwconv": P(None, "model"),
            "prelu2": P(),
            "pwconv": P("model", None),
            "norm1": dict(norm),
            "norm2": dict(norm),
        }

    sep = {
        "input_norm": {"gamma": P(), "beta": P()},
        "bottleneck": P(),
        "mask_conv": P(),
    }
    for r in range(cfg.num_repeats):
        for x in range(cfg.num_blocks):
            sep[f"block_r{r}_x{x}"] = block_spec()
    specs: Dict[str, Any] = {
        "params": {
            "encoder": {"w": P()},
            "decoder": {"w": P()},
            "separator": sep,
        }
    }
    if "batch_stats" in variables:
        stats = {}
        for r in range(cfg.num_repeats):
            for x in range(cfg.num_blocks):
                stats[f"block_r{r}_x{x}"] = {
                    "norm1": {"mean": P("model"), "var": P("model")},
                    "norm2": {"mean": P("model"), "var": P("model")},
                }
        specs["batch_stats"] = {"separator": stats}
    return specs


def _dpt_partition_specs(cfg: ConvTasNetConfig, variables: Dict[str, Any]):
    def norm():
        return {"gamma": P(), "beta": P()}

    def att():
        return {"norm": norm(),
                "qkv": {"kernel": P(None, "model")},
                "out": {"kernel": P("model", None)}}

    def ffn():
        return {"norm": norm(),
                "up": {"kernel": P(None, "model"), "bias": P("model")},
                "down": {"kernel": P("model", None), "bias": P()}}

    sep: Dict[str, Any] = {
        "input_norm": norm(),
        "bottleneck": {"kernel": P()},
        "output_norm": norm(),
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
    if "batch_stats" in variables and variables["batch_stats"]:
        specs["batch_stats"] = jax.tree_util.tree_map(
            lambda _: P(), variables["batch_stats"])
    return specs


def _norm_tp(y, prm, stats, cfg, axis):
    """Norm over the channel-sharded hidden dim. y: [M, K, H_local]."""
    yf = y.astype(jnp.float32)
    # element counts are static (local size x axis size) — a psum of a
    # constant would be rejected by vma-checked tracing (training
    # differentiates through this body) and is dead weight anyway
    n_shards = jax.lax.axis_size(axis)
    if cfg.norm_type == "gLN":
        # per-sample stats over (K, H): psum two scalars per sample
        s1 = jax.lax.psum(jnp.sum(yf, axis=(1, 2)), axis)     # [M]
        s2 = jax.lax.psum(jnp.sum(yf * yf, axis=(1, 2)), axis)
        n = jnp.float32(yf.shape[1] * yf.shape[2] * n_shards)
        mean = (s1 / n)[:, None, None]
        var = (s2 / n)[:, None, None] - mean * mean
    elif cfg.norm_type == "cLN":
        # per-(sample, frame) stats over H: psum [M, K] row sums
        s1 = jax.lax.psum(jnp.sum(yf, axis=-1), axis)         # [M, K]
        s2 = jax.lax.psum(jnp.sum(yf * yf, axis=-1), axis)
        n = jnp.float32(yf.shape[-1] * n_shards)
        mean = (s1 / n)[..., None]
        var = (s2 / n)[..., None] - mean * mean
    else:  # BN eval: stats are sharded per-channel, local affine
        mean, var = stats["mean"], stats["var"]
        out = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
        return (out * prm["gamma"] + prm["beta"]).astype(y.dtype)
    out = (yf - mean) * jax.lax.rsqrt(var + EPS)
    return (out * prm["gamma"] + prm["beta"]).astype(y.dtype)


def _cln_full(y, gamma, beta):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    return ((yf - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta).astype(y.dtype)


def _tp_shard_forward_gln(cfg: ConvTasNetConfig, variables, mixture,
                          axis: str, interpret: bool, train: bool = False,
                          data_axis: str = "data"):
    """Local forward for gLN models: the two-psum-per-block decomposition
    from ``ops/pallas/tcn_block_tp`` (stage 1 → stats psum → stage 2 →
    combined psum → epilogue). Stage 2 runs the fused Pallas kernel on the
    dilations ``ensure_probed_tcn_tp`` approved for this shard shape and
    the XLA stage 2 elsewhere — the decomposition (and its collectives)
    never varies, only the per-shard implementation. 3 psums per block vs
    7 for the generic ``_norm_tp`` path.

    ``train=True`` (the TP train step differentiates through this body
    under a vma-checked shard_map) routes stage 2 through the custom-VJP
    pair ``tp_stage2_ad`` on dilations where the train probe recorded a
    win, else plain autodiff of the XLA stage 2. Fused train never engages
    in interpret mode (Pallas' HLO interpreter can't trace under vma
    checking).
    """
    from convtasnet_tpu.models.functional import block_names
    from convtasnet_tpu.ops.pallas.tcn_block_tp import (
        fused_tp_stage2,
        stats_from_sums,
        tcn_tp_ready,
        tcn_tp_train_ready,
        tp_epilogue,
        tp_stage1,
        tp_stage2_ad,
        tp_variant_params,
        xla_tp_stage2,
    )
    from convtasnet_tpu.parallel.dpt_tp import _pvary_all

    params = variables["params"]
    x_in = mixture.astype(jnp.dtype(cfg.compute_dtype))
    frames = frame_signal(x_in, cfg.kernel_size, cfg.stride)
    w = encode_frames(params["encoder"], frames)
    sep = params["separator"]

    from convtasnet_tpu.ops.conv import pointwise_conv

    y = _cln_full(w, sep["input_norm"]["gamma"], sep["input_norm"]["beta"])
    y = pointwise_conv(y, sep["bottleneck"].astype(y.dtype))
    K = y.shape[1]
    H = cfg.hidden
    n = K * H
    dt = str(jnp.dtype(cfg.compute_dtype))
    for name, dilation in block_names(cfg):
        blk = sep[name]
        w_out = blk["pwconv"]
        g1, b1 = blk["norm1"]["gamma"], blk["norm1"]["beta"]
        g2, b2 = blk["norm2"]["gamma"], blk["norm2"]["beta"]
        h, sums1 = tp_stage1(y, blk["conv1x1"], blk["prelu1"])
        stats1 = stats_from_sums(jax.lax.psum(sums1, axis), n)
        Hs = h.shape[-1]
        variant = tcn_tp_ready(dilation, K, Hs, w_out.shape[1], cfg.causal,
                               dt, interpret) if cfg.use_pallas else None
        if train:
            trn = (variant is not None and not interpret
                   and tcn_tp_train_ready(dilation, K, Hs, w_out.shape[1],
                                          cfg.causal, dt))
            args = (h, stats1, blk["dwconv"], w_out, blk["prelu2"], g1, b1,
                    g2)
            if trn:
                # cotangents of the pair vary over both mesh axes; pvary
                # the primals so the transposes insert the Megatron
                # backward collectives (see dpt_tp._pvary_all)
                args = _pvary_all(args, (data_axis, axis))
            z, sums2 = tp_stage2_ad(
                (dilation, cfg.causal, variant if trn else None, interpret),
                *args) if trn else xla_tp_stage2(
                *args, dilation=dilation, causal=cfg.causal)
        elif variant is not None:
            tile, hdt = tp_variant_params(variant)
            kw = {"tile": tile} if tile else {}
            z, sums2 = fused_tp_stage2(
                h, stats1, blk["dwconv"], w_out, blk["prelu2"], g1, b1, g2,
                dilation=dilation, causal=cfg.causal, h_dtype=hdt,
                interpret=interpret, **kw)
        else:
            z, sums2 = xla_tp_stage2(
                h, stats1, blk["dwconv"], w_out, blk["prelu2"], g1, b1, g2,
                dilation=dilation, causal=cfg.causal)
        w_f = w_out.astype(jnp.float32)
        w1 = jnp.einsum("h,hb->b", g2.astype(jnp.float32), w_f)
        w0 = jnp.einsum("h,hb->b", b2.astype(jnp.float32), w_f)
        z, sums2, w1, w0 = jax.lax.psum((z, sums2, w1, w0), axis)
        y = tp_epilogue(y, z, stats_from_sums(sums2, n), w1, w0)
    from convtasnet_tpu.models.functional import mask_from_scores

    score = pointwise_conv(y, sep["mask_conv"].astype(y.dtype))
    mask = mask_from_scores(cfg, score)
    est = decode_frames(params["decoder"], w, mask)
    out = overlap_and_add(est, cfg.stride).astype(jnp.float32)
    T = mixture.shape[-1]
    if out.shape[-1] < T:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, T - out.shape[-1])))
    return out


def _tp_shard_forward(cfg: ConvTasNetConfig, variables, mixture, axis: str):
    """Local forward: mixture [M_local, T]; H-dim params are local shards."""
    params = variables["params"]
    stats_all = variables.get("batch_stats", {}).get("separator", {})
    frames = frame_signal(mixture, cfg.kernel_size, cfg.stride)
    w = encode_frames(params["encoder"], frames)

    sep = params["separator"]

    def make_block_ops(name, dilation):
        st = stats_all.get(name, {})
        return {
            "dwconv": lambda h, wdw: depthwise_conv1d(
                h, wdw, dilation, cfg.causal),
            "norm1": lambda h: _norm_tp(h, sep[name]["norm1"],
                                        st.get("norm1"), cfg, axis),
            "norm2": lambda h: _norm_tp(h, sep[name]["norm2"],
                                        st.get("norm2"), cfg, axis),
            # W_out is row-sharded: partial products all-reduce before the
            # residual add (Megatron g-operator)
            "combine": lambda res, out: res + jax.lax.psum(out, axis),
        }

    mask = separator_forward(
        cfg, sep, w,
        input_norm=lambda v: _cln_full(v, sep["input_norm"]["gamma"],
                                       sep["input_norm"]["beta"]),
        make_block_ops=make_block_ops,
    )
    est = decode_frames(params["decoder"], w, mask)
    out = overlap_and_add(est, cfg.stride)
    T = mixture.shape[-1]
    if out.shape[-1] < T:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, T - out.shape[-1])))
    return out


def tp_forward(
    cfg: ConvTasNetConfig,
    variables: Dict[str, Any],
    mixture: jax.Array,
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
) -> jax.Array:
    """Forward over the full 2-D (data, model) mesh.

    ``mixture [M, T]`` is sharded over ``data`` on the batch; the hidden
    dimension of every TCN block is sharded over ``model``. Batch size must
    divide the data-axis size. The dual-path family routes to its own
    shard_map (``dpt_tp.dpt_tp_forward``: head-group split, per-shard
    fused kernels).
    """
    if cfg.separator == "dpt":
        from convtasnet_tpu.parallel.dpt_tp import dpt_tp_forward

        return dpt_tp_forward(cfg, variables, mixture, mesh,
                              model_axis=model_axis, data_axis=data_axis)
    if cfg.separator != "tcn":
        raise ValueError(f"unsupported separator family: {cfg.separator}")
    specs = param_partition_specs(cfg, variables)
    n_model = int(dict(mesh.shape).get(model_axis, 1))
    n_data = int(dict(mesh.shape).get(data_axis, 1))
    if n_model > 1 and cfg.norm_type == "gLN" and cfg.use_pallas:
        # populate the fused stage-2 registry for the per-shard shape
        # (idempotent; no-op on CPU / non-gLN / lane-unaligned widths)
        from convtasnet_tpu.ops.pallas.tcn_block_tp import (
            ensure_probed_tcn_tp,
        )

        ensure_probed_tcn_tp(cfg, n_model,
                             max(1, mixture.shape[0] // n_data),
                             mixture.shape[-1])
    if cfg.norm_type == "gLN":
        # stage-split decomposition with per-dilation fused Pallas stage 2
        # (ops/pallas/tcn_block_tp): 3 psums per block instead of 7, and
        # the block body stays VMEM-resident on probed dilations.
        interpret = jax.default_backend() == "cpu"
        body = functools.partial(_tp_shard_forward_gln, cfg,
                                 axis=model_axis, interpret=interpret)
    else:
        body = functools.partial(_tp_shard_forward, cfg, axis=model_axis)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(data_axis, None)),
        out_specs=P(data_axis, None, None),
        check_vma=False,
    )
    return fn(variables, mixture)


def make_tcn_tp_train_step(
    cfg: ConvTasNetConfig,
    tx,
    mesh: Mesh,
    donate: bool = True,
    model_axis: str = "model",
    data_axis: str = "data",
):
    """TCN TP train step through the explicit shard_map decomposition.

    The GSPMD train step (``train/train_step.make_sharded_train_step``)
    demotes the fused kernels under a real model split and pays 7
    collectives per block (one per norm stat + the Megatron g-operator);
    this alternative differentiates THROUGH the hand-written shard_map:
    gLN models use the stage-split body (3 psums per block,
    ``ops/pallas/tcn_block_tp``) with the fused custom-VJP stage-2 pair on
    train-probed dilations; cLN uses the generic per-norm body. BN is
    rejected (running-stat updates need the mutable-variables path — train
    data-parallel instead).

    ``state.params`` stay in the CANONICAL layout (the H-dim shards are
    cut by the shard_map's in_specs), so gradients, optimizer state,
    solver and checkpoints are all layout-unchanged. Returns a jitted
    ``step(state, batch) -> (state, metrics)`` with the
    ``make_train_step`` contract plus a ``.multi`` scan variant.
    """
    import optax

    from convtasnet_tpu.losses.pit import pit_si_snr

    if cfg.separator != "tcn":
        raise ValueError("make_tcn_tp_train_step is TCN-only; the "
                         "dual-path family has make_dpt_tp_train_step")
    if cfg.norm_type == "BN":
        raise ValueError("BN running-stat updates are not supported by "
                         "the TP train step; use gLN/cLN or train "
                         "data-parallel")
    n_model = int(dict(mesh.shape).get(model_axis, 1))
    n_data = int(dict(mesh.shape).get(data_axis, 1))
    interpret = jax.default_backend() == "cpu"
    if cfg.norm_type == "gLN":
        body_fwd = functools.partial(
            _tp_shard_forward_gln, cfg, axis=model_axis,
            interpret=interpret, train=True, data_axis=data_axis)
    else:
        body_fwd = functools.partial(_tp_shard_forward, cfg,
                                     axis=model_axis)

    def body(variables, mixture, lengths, sources, weights):
        est = body_fwd(variables, mixture)
        max_snr, _ = pit_si_snr(sources, est, lengths)
        lsum = -jnp.sum(max_snr * weights.astype(jnp.float32))
        return lsum[None]                   # [1] per data shard

    def loss_fn(params, batch):
        mixture, lengths, sources, weights = batch
        variables = {"params": params}
        specs = param_partition_specs(cfg, variables)
        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, P(data_axis), P(data_axis), P(data_axis),
                      P(data_axis)),
            out_specs=P(data_axis),
        )
        lsums = sm(variables, mixture, lengths, sources, weights)
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
        return jax.lax.scan(lambda s_, b_: step_fn(s_, b_), st, batches)

    jitted_multi = jax.jit(multi_fn, **kwargs)

    degraded = []
    _called: set = set()

    def _call_with_degrade(jfn, rebuild, st, arg, batch0):
        """Run the jitted step; if it fails to TRACE/LOWER with the fused
        custom-VJP pair engaged (the probe validates it OUTSIDE the
        shard_map; composing inside the vma-checked one is
        backend-dependent), clear the train registry and retrace with XLA
        autodiff of the same decomposition. Only a before-first-execution
        failure is retried (no buffer donated yet; jax.jit caches nothing
        on a trace error) — a later failure re-raises."""
        if (n_model > 1 and not degraded and not interpret
                and cfg.norm_type == "gLN" and cfg.use_pallas):
            from convtasnet_tpu.ops.pallas.tcn_block_tp import (
                ensure_probed_tcn_tp,
            )

            ensure_probed_tcn_tp(
                cfg, n_model, max(1, batch0.shape[0] // n_data),
                batch0.shape[-1], train=True)
        k = id(jfn)
        first = k not in _called
        _called.add(k)
        try:
            return jfn(st, arg)
        except Exception:  # noqa: BLE001 — vma/lowering failures
            if degraded or not first:
                raise
            degraded.append(True)
            from convtasnet_tpu.ops.pallas.tcn_block_tp import _TCN_TP_TRAIN

            for k_ in list(_TCN_TP_TRAIN):
                _TCN_TP_TRAIN[k_] = None
            return rebuild()(st, arg)

    def step_with_probe(st, batch):
        return _call_with_degrade(
            jitted, lambda: jax.jit(step_fn, **kwargs), st, batch, batch[0])

    def multi_with_probe(st, batches):
        """``(state, batches[n_steps, ...]) -> (state, metrics[n_steps])``
        — the ``make_multi_train_step`` contract."""
        return _call_with_degrade(
            jitted_multi, lambda: jax.jit(multi_fn, **kwargs), st, batches,
            batches[0][0])

    step_with_probe.multi = multi_with_probe
    return step_with_probe


def shard_variables(variables, mesh: Mesh, cfg: ConvTasNetConfig):
    """Place the variable pytree on the mesh with TP shardings."""
    from jax.sharding import NamedSharding

    specs = param_partition_specs(cfg, variables)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        variables, specs,
        is_leaf=lambda v: not isinstance(v, dict),
    )


def make_gspmd_forward(
    cfg: ConvTasNetConfig,
    variables: Dict[str, Any],
    mesh: Mesh,
    data_axis: str = "data",
):
    """Jitted inference forward over the full 2-D (data, model) mesh —
    GSPMD companion to the hand-written ``tp_forward`` shard_map, and the
    model-parallel inference path for the dual-path family (``tp_forward``
    is TCN-only).

    ``mixture [M, T]`` is sharded over ``data`` on the batch; parameters
    carry ``param_partition_specs`` shardings — for DPT that Megatron-splits
    the attention QKV / FFN-up matmuls (head/channel sharding) and
    row-splits the output / FFN-down matmuls over ``model``, so each device
    computes its own slice of heads and GSPMD inserts the per-sublayer
    partial-sum reduce. Batch size must divide the data-axis size.

    Returns ``(fn, sharded_variables)``; call ``fn(sharded_variables,
    mixture) -> [M, C, T]``.
    """
    from jax.sharding import NamedSharding

    from convtasnet_tpu.models.conv_tasnet import ConvTasNet

    cfg = demote_pallas_for_model_parallel(cfg, mesh)
    specs = param_partition_specs(cfg, variables)
    var_sh = jax.tree_util.tree_map(
        lambda _, s: NamedSharding(mesh, s), variables, specs,
        is_leaf=lambda v: not isinstance(v, dict))
    model = ConvTasNet(cfg)
    fn = jax.jit(
        lambda v, m: model.apply(v, m, train=False),
        in_shardings=(var_sh, NamedSharding(mesh, P(data_axis, None))),
        out_shardings=NamedSharding(mesh, P(data_axis, None, None)),
    )
    return fn, shard_variables(variables, mesh, cfg)
