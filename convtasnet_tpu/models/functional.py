"""The single source of truth for Conv-TasNet block/separator math.

Four runtimes share the separator math (reference:
``src/conv_tasnet.py:149-278``): the flax training model
(``models/conv_tasnet.py``), the streaming runtime (``models/streaming.py``),
sequence-parallel inference (``parallel/sharded_ops.py``), and
tensor-parallel inference (``parallel/tensor_parallel.py``). They differ only
in *where activations come from and go to* — batched tensors, carried chunk
state, time shards with halo exchanges, or channel shards with psums — never
in the math itself. This module owns that math once; each runtime supplies
the differing pieces as callables:

- ``dwconv(h, w)``   — how the depthwise dilated conv sees its context
  (plain padding / carried ring buffer / ppermute halos),
- ``norm1/norm2(h)`` — how norm statistics reduce (local / psum over time
  shards / psum over channel shards; BN running stats),
- ``combine(res, out)`` — how the block output joins the residual stream
  (plain add / psum-then-add for row-sharded W_out).

Everything else — 1x1 convs as MXU matmuls, PReLU placement, block order,
mask head and nonlinearity, encoder/decoder matmuls — is defined here and
can never skew between runtimes again.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from convtasnet_tpu.ops.conv import pointwise_conv, prelu

BlockOps = Dict[str, Callable]


def block_names(cfg) -> list:
    """Canonical block naming/order shared by params and every runtime."""
    return [
        (f"block_r{r}_x{x}", 2 ** x)
        for r in range(cfg.num_repeats)
        for x in range(cfg.num_blocks)
    ]


def encode_frames(enc_params: Dict[str, Any], frames: jax.Array) -> jax.Array:
    """Framed mixture [..., K, L] -> encoder output [..., K, N].

    The learned analysis filterbank + ReLU (``src/conv_tasnet.py:108-121``)
    as one matmul. Framing itself differs per runtime (batch reshape /
    chunk-carry / shard halo) and is done by the caller.
    """
    w = enc_params["w"].astype(frames.dtype)
    y = jnp.einsum("...kl,ln->...kn", frames, w,
                   preferred_element_type=frames.dtype)
    return jax.nn.relu(y)


def block_forward(
    blk: Dict[str, Any],
    y: jax.Array,
    *,
    dwconv: Callable[[jax.Array, jax.Array], jax.Array],
    norm1: Callable[[jax.Array], jax.Array],
    norm2: Callable[[jax.Array], jax.Array],
    combine: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
) -> jax.Array:
    """One residual TCN block (parity: ``src/conv_tasnet.py:218-278``).

    1x1 (B→H) → PReLU → norm → depthwise dilated → PReLU → norm → 1x1 (H→B),
    residual add, no output ReLU (``src/conv_tasnet.py:243``).
    """
    h = pointwise_conv(y, blk["conv1x1"].astype(y.dtype))
    h = prelu(h, blk["prelu1"].astype(h.dtype))
    h = norm1(h)
    h = dwconv(h, blk["dwconv"].astype(h.dtype))
    h = prelu(h, blk["prelu2"].astype(h.dtype))
    h = norm2(h)
    out = pointwise_conv(h, blk["pwconv"].astype(h.dtype))
    if combine is None:
        return y + out
    return combine(y, out)


def mask_from_scores(cfg, score: jax.Array) -> jax.Array:
    """Mask head output [..., K, C*N] -> masks [..., K, C, N]
    (relu / per-speaker softmax, ``src/conv_tasnet.py:207-214``)."""
    C, N = cfg.num_speakers, cfg.n_filters
    score = score.reshape(*score.shape[:-1], C, N)
    if cfg.mask_nonlinear == "softmax":
        return jax.nn.softmax(score, axis=-2)
    if cfg.mask_nonlinear == "relu":
        return jax.nn.relu(score)
    raise ValueError(f"unsupported mask nonlinearity: {cfg.mask_nonlinear}")


def separator_forward(
    cfg,
    sep: Dict[str, Any],
    mixture_w: jax.Array,
    *,
    input_norm: Callable[[jax.Array], jax.Array],
    make_block_ops: Callable[[str, int], BlockOps],
) -> jax.Array:
    """TCN separator skeleton (parity: ``src/conv_tasnet.py:149-215``).

    cLN input norm → 1x1 bottleneck → R×X dilated blocks → mask head →
    nonlinearity. ``make_block_ops(name, dilation)`` returns the per-block
    ``dwconv``/``norm1``/``norm2``(/``combine``) callables for the runtime.
    Like the reference, there is no skip-connection accumulation path
    (``src/conv_tasnet.py:177``).
    """
    y = input_norm(mixture_w)
    y = pointwise_conv(y, sep["bottleneck"].astype(y.dtype))
    for name, dilation in block_names(cfg):
        y = block_forward(sep[name], y, **make_block_ops(name, dilation))
    score = pointwise_conv(y, sep["mask_conv"].astype(y.dtype))
    return mask_from_scores(cfg, score)


def decode_frames(
    dec_params: Dict[str, Any], mixture_w: jax.Array, est_mask: jax.Array
) -> jax.Array:
    """(encoder output, masks) -> per-speaker frames [..., C, K, L].

    D = W ⊙ M then S = D V (``src/conv_tasnet.py:131-145``) fused into one
    einsum. Overlap-add differs per runtime (batch OLA / incremental carry /
    shard spill exchange) and is done by the caller.
    """
    w = dec_params["w"].astype(mixture_w.dtype)
    return jnp.einsum("...kn,...kcn,nl->...ckl", mixture_w, est_mask, w,
                      preferred_element_type=mixture_w.dtype)
