"""The jitted training step.

Replaces the reference's per-batch eager loop (forward → ``cal_loss`` →
``backward`` → ``clip_grad_norm_(5)`` → Adam step, ``src/solver.py:181-198``)
with one compiled, donated XLA program: forward + uPIT loss + grad + global
grad-norm clip + optimizer update fused into a single device launch. The
learning rate lives inside the optimizer state (``optax.inject_hyperparams``)
so LR halving (``src/solver.py:125-132``) costs no recompilation.

Parallelism: the step is jitted with explicit shardings — parameters
replicated, batch sharded over the mesh's ``data`` axis. XLA turns the loss
mean into a cross-device ``psum`` over ICI; there is no hand-written
all-reduce (SURVEY §2 parallelism table).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
from convtasnet_tpu.losses.pit import pit_si_snr
from convtasnet_tpu.models.conv_tasnet import ConvTasNet


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any  # {} unless norm_type == "BN"


def make_optimizer(cfg: SolverConfig) -> optax.GradientTransformation:
    """Optimizer parity with ``src/train.py:87-95`` (sgd|adam, lr, momentum,
    l2) plus the reference's grad clipping (``src/solver.py:194``), with the
    LR injected as mutable optimizer-state so the solver can halve it."""

    def build(learning_rate):
        if cfg.optimizer == "adam":
            base = optax.adam(learning_rate)
        elif cfg.optimizer == "sgd":
            base = optax.sgd(learning_rate, momentum=cfg.momentum or None)
        else:
            raise ValueError(f"unsupported optimizer: {cfg.optimizer}")
        parts = [optax.clip_by_global_norm(cfg.max_grad_norm)]
        if cfg.l2:
            parts.append(optax.add_decayed_weights(cfg.l2))
        parts.append(base)
        return optax.chain(*parts)

    return optax.inject_hyperparams(build)(learning_rate=cfg.lr)


def get_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def create_train_state(
    model_cfg: ConvTasNetConfig,
    solver_cfg: SolverConfig,
    rng: jax.Array,
    example_len: Optional[int] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    from convtasnet_tpu.models.conv_tasnet import init_params

    variables = init_params(model_cfg, rng, example_len)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(solver_cfg)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
    )
    return state, tx


def _weighted_loss(model, params, batch_stats, batch, train: bool):
    mixture, lengths, sources, weights = batch
    variables = {"params": params}
    has_bn = bool(batch_stats)
    if has_bn:
        variables["batch_stats"] = batch_stats
    if train and has_bn:
        est, updates = model.apply(
            variables, mixture, train=True, mutable=["batch_stats"]
        )
        new_stats = updates["batch_stats"]
    else:
        est = model.apply(variables, mixture, train=train)
        new_stats = batch_stats
    max_snr, _ = pit_si_snr(sources, est, lengths)
    w = weights.astype(jnp.float32)
    # Weighted mean over real rows; padding rows (w=0) contribute nothing.
    loss = -jnp.sum(max_snr * w) / jnp.maximum(jnp.sum(w), 1.0)
    return loss, new_stats


def _loss_and_grads(model, params, batch_stats, batch, batch_chunk: int):
    """Loss + gradients for one batch, optionally accumulated over
    ``batch_chunk``-row slices inside a ``lax.scan``.

    Why chunk: XLA's memory-space assignment homes the TCN blocks'
    inter-block activations in VMEM while a slice's working set fits
    (docs/RESULTS.md "Batch scaling" — the same effect behind
    ``apply_batch_chunked`` serving), and the backward doubles the
    resident set, so a B=24 train step pays exposed HBM traffic an 8-row
    slice does not. The chunked grads are mathematically identical to the
    full-batch grads (the weighted-sum loss is additive over rows; the
    weight normalizer is batch-constant), so this is a pure scheduling
    choice. Skipped for BN configs (running stats are a full-batch
    reduction) and when the batch doesn't divide evenly.
    """
    B = batch[0].shape[0]
    if (not batch_chunk or B <= batch_chunk or B % batch_chunk
            or bool(batch_stats)):
        def loss_fn(params):
            return _weighted_loss(model, params, batch_stats, batch, True)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, new_stats, grads

    n = B // batch_chunk

    def chunk_loss(p, chunk):
        mixture, lengths, sources, weights = chunk
        est = model.apply({"params": p}, mixture, train=True)
        max_snr, _ = pit_si_snr(sources, est, lengths)
        return -jnp.sum(max_snr * weights.astype(jnp.float32))

    chunks = jax.tree_util.tree_map(
        lambda x: x.reshape(n, batch_chunk, *x.shape[1:]), batch)

    def body(carry, chunk):
        lsum, gsum = carry
        l, g = jax.value_and_grad(chunk_loss)(params, chunk)
        return (lsum + l, jax.tree_util.tree_map(jnp.add, gsum, g)), None

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    (lsum, gsum), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), zeros), chunks)
    wsum = jnp.maximum(jnp.sum(batch[3].astype(jnp.float32)), 1.0)
    return (lsum / wsum, batch_stats,
            jax.tree_util.tree_map(lambda g: g / wsum, gsum))


def make_train_step(
    model_cfg: ConvTasNetConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
    batch_chunk: int = 0,
):
    """Build the jitted train step ``(state, batch) -> (state, metrics)``.

    When ``mesh`` is given the step is compiled with parameter-replicated /
    batch-sharded shardings over its ``data`` axis. ``batch_chunk`` > 0
    accumulates gradients over that many rows at a time inside the step
    (``_loss_and_grads``) — same numbers, VMEM-friendlier schedule.
    """
    model = ConvTasNet(model_cfg)

    def step_fn(state: TrainState, batch):
        loss, new_stats, grads = _loss_and_grads(
            model, state.params, state.batch_stats, batch, batch_chunk)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return new_state, metrics

    kwargs: Dict[str, Any] = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # Shardings by pytree prefix: state replicated, batch sharded on axis 0.
        kwargs["in_shardings"] = (repl, (data, data, data, data))
        kwargs["out_shardings"] = (repl, repl)
    return jax.jit(step_fn, **kwargs)


def make_multi_train_step(
    model_cfg: ConvTasNetConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
    batch_chunk: int = 0,
):
    """Run several optimizer steps in ONE device dispatch via ``lax.scan``.

    ``(state, batches) -> (state, metrics)`` where every array in ``batches``
    has a leading ``[n_steps, ...]`` axis (the scan length) and
    ``metrics['loss']`` is ``[n_steps]``. Amortizes host→device dispatch latency (no reference
    equivalent — the reference pays a per-batch ``.cuda()`` + ``loss.item()``
    sync every step, ``src/solver.py:184-198``); with a remote-attached
    accelerator this is the difference between dispatch-bound and
    compute-bound training.
    """
    model = ConvTasNet(model_cfg)

    def multi_fn(state: TrainState, batches):
        def body(st, batch):
            loss, new_stats, grads = _loss_and_grads(
                model, st.params, st.batch_stats, batch, batch_chunk)
            updates, new_opt_state = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            st = st.replace(
                step=st.step + 1, params=new_params,
                opt_state=new_opt_state, batch_stats=new_stats)
            return st, {"loss": loss, "grad_norm": optax.global_norm(grads)}

        return jax.lax.scan(body, state, batches)

    kwargs: Dict[str, Any] = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(None, "data"))  # [n_steps, B, ...]
        kwargs["in_shardings"] = (repl, (data, data, data, data))
        kwargs["out_shardings"] = (repl, repl)
    return jax.jit(multi_fn, **kwargs)


def make_sharded_train_step(
    model_cfg: ConvTasNetConfig,
    tx: optax.GradientTransformation,
    state: TrainState,
    mesh,
    donate: bool = True,
):
    """Train step over a 2-D (data, model) mesh: batch sharded over ``data``,
    TCN hidden-dim parameters (and their Adam moments) sharded over ``model``
    per ``parallel/tensor_parallel.param_partition_specs``. XLA/GSPMD
    partitions the whole forward+backward and inserts the collectives
    (all-reduce over ``data`` for gradients; the per-block partial-sum
    reduce over ``model``) — no hand-written comms.

    Returns (step_fn, shard_state) where ``shard_state`` places an existing
    state onto the mesh with these shardings.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from convtasnet_tpu.parallel.tensor_parallel import (
        demote_pallas_for_model_parallel, param_partition_specs)

    # Fused Pallas kernels assume full-width (un-split) weights; under a
    # real Megatron split they must not engage (GSPMD cannot partition the
    # custom call). Data-only sharding keeps them.
    model_cfg = demote_pallas_for_model_parallel(model_cfg, mesh)
    specs = param_partition_specs(
        model_cfg, {"params": state.params, "batch_stats": state.batch_stats}
    )["params"]

    def to_sharding(spec_tree, value_tree):
        return jax.tree_util.tree_map(
            lambda _, s: NamedSharding(mesh, s), value_tree, spec_tree,
            is_leaf=lambda v: not isinstance(v, dict))

    repl = NamedSharding(mesh, P())
    params_sh = to_sharding(specs, state.params)

    # opt_state: params-shaped subtrees (adam mu/nu) get the param
    # shardings; everything else is replicated.
    flat_params = jax.tree_util.tree_structure(state.params)

    def opt_sharding(opt_state):
        def walk(node):
            try:
                if jax.tree_util.tree_structure(node) == flat_params:
                    return params_sh
            except Exception:
                pass
            if isinstance(node, (list, tuple)):
                mapped = [walk(c) for c in node]
                return type(node)(*mapped) if hasattr(node, "_fields") else type(node)(mapped)
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return repl

        return walk(opt_state)

    state_sh = TrainState(
        step=repl,
        params=params_sh,
        opt_state=opt_sharding(state.opt_state),
        batch_stats=jax.tree_util.tree_map(lambda _: repl, state.batch_stats)
        if state.batch_stats else repl,
    )
    data = NamedSharding(mesh, P("data"))
    model = ConvTasNet(model_cfg)

    def step_fn(st: TrainState, batch):
        def loss_fn(params):
            return _weighted_loss(model, params, st.batch_stats, batch, True)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params)
        updates, new_opt_state = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        new_state = st.replace(
            step=st.step + 1, params=new_params, opt_state=new_opt_state,
            batch_stats=new_stats)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    kwargs: Dict[str, Any] = {
        "in_shardings": (state_sh, (data, data, data, data)),
        "out_shardings": (state_sh, repl),
    }
    if donate:
        kwargs["donate_argnums"] = (0,)
    step = jax.jit(step_fn, **kwargs)

    def shard_state(st: TrainState) -> TrainState:
        return jax.device_put(st, state_sh)

    return step, shard_state


def make_eval_step(model_cfg: ConvTasNetConfig, mesh=None):
    """Jitted validation step ``(state, batch) -> loss`` (no grad, running
    BN statistics; parity: ``src/solver.py:107`` cv pass)."""
    model = ConvTasNet(model_cfg)

    def step_fn(state: TrainState, batch):
        loss, _ = _weighted_loss(model, state.params, state.batch_stats, batch, False)
        return loss

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (repl, (data, data, data, data))
        kwargs["out_shardings"] = repl
    return jax.jit(step_fn, **kwargs)
