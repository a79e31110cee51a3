"""Conv-TasNet, TPU-native.

Capability parity with the reference model (``src/conv_tasnet.py:13-361``):
encoder (learned strided filterbank + ReLU), TCN separator (cLN input norm →
1x1 bottleneck → R×X dilated depthwise-separable blocks with residual adds →
1x1 mask head → relu/softmax masks), masked-basis decoder with overlap-add,
all knobs (norm_type ∈ {gLN, cLN, BN}, causal, mask nonlinearity, C speakers).

Design differences (deliberate, TPU-first — this is not a port):

- **Channels-last** ``[batch, time, channels]`` everywhere. Every 1x1 conv is
  a single matmul with the channel axis on the 128-lane dimension, so the
  whole separator maps onto the MXU; the reference's channels-first layout
  would force relayouts around each conv.
- The encoder is framing (reshape + shifted concat) followed by a
  ``[L, N]`` matmul; the decoder is a ``[N, L]`` matmul followed by shifted
  adds. No conv / conv-transpose ops, no scatter.
- The depthwise dilated conv is P=3 shifted fused multiply-adds on the VPU
  (``ops/conv.py``), which XLA fuses with the surrounding PReLU/norm.
- Norm statistics are computed in float32 even under bfloat16 compute.

Shapes at the paper config (N=256, L=20, B=256, H=512, P=3, X=8, R=4, C=2,
4 s @ 8 kHz): mixture [M, 32000] → frames [M, 3199, 20] → enc [M, 3199, 256]
→ TCN (32 blocks) → masks [M, 3199, 2, 256] → decoder [M, 2, 32000].
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.functional import (
    block_forward,
    decode_frames,
    encode_frames,
    mask_from_scores,
)
from convtasnet_tpu.ops.conv import (
    depthwise_conv1d,
    pointwise_conv,
    torch_conv_xavier_normal,
)
from convtasnet_tpu.ops.frames import frame_signal, overlap_and_add
from convtasnet_tpu.ops.norm import (
    batch_norm,
    channelwise_layer_norm,
    global_layer_norm,
)

Dtype = Any


def _conv_init(out_ch: int, in_ch: int, kernel_w: int = 1):
    """Initializer matching ``nn.init.xavier_normal_`` on the equivalent torch
    conv weight (reference init loop, ``src/conv_tasnet.py:41-43``)."""
    std = torch_conv_xavier_normal(out_ch, in_ch, kernel_w)

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class Norm(nn.Module):
    """Norm dispatch, parity with ``chose_norm`` (``src/conv_tasnet.py:298-309``).

    gLN/cLN carry learnable gamma/beta [N] (init 1/0); BN additionally keeps
    running mean/var in the ``batch_stats`` collection (torch
    ``nn.BatchNorm1d`` semantics: momentum 0.1, eps 1e-5, stats over
    batch+time per channel). setup-style so the fused Pallas path can read
    ``gamma``/``beta``/running stats without invoking the op.

    Note: the reference's whole-model Xavier loop actually *overwrites* the
    [1,C,1] gamma/beta of gLN/cLN with Xavier noise — an inherited accident we
    do not copy; standard 1/0 init is used here.
    """

    norm_type: str
    features: int
    stats_dtype: Dtype = jnp.float32

    def setup(self):
        if self.norm_type not in ("gLN", "cLN", "BN"):
            raise ValueError(f"unsupported norm_type: {self.norm_type}")
        self.gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        self.beta = self.param("beta", nn.initializers.zeros, (self.features,))
        if self.norm_type == "BN":
            self.ra_mean = self.variable(
                "batch_stats", "mean",
                lambda: jnp.zeros((self.features,), self.stats_dtype))
            self.ra_var = self.variable(
                "batch_stats", "var",
                lambda: jnp.ones((self.features,), self.stats_dtype))

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        orig_dtype = x.dtype
        xf = x.astype(self.stats_dtype)
        if self.norm_type in ("gLN", "cLN"):
            fn = global_layer_norm if self.norm_type == "gLN" else channelwise_layer_norm
            return fn(xf, self.gamma, self.beta).astype(orig_dtype)
        if train:
            axes = tuple(range(xf.ndim - 1))
            # Under the GSPMD train step the batch axis is globally visible,
            # so this mean/var already covers every shard — no explicit
            # cross-device sync is needed (unlike per-replica DataParallel BN
            # in the reference, src/train.py:83-85).
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            n = xf.size // self.features
            momentum = 0.1  # torch BatchNorm1d default
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                self.ra_mean.value = (
                    (1 - momentum) * self.ra_mean.value + momentum * mean)
                self.ra_var.value = (
                    (1 - momentum) * self.ra_var.value + momentum * unbiased)
        else:
            mean, var = self.ra_mean.value, self.ra_var.value
        return batch_norm(xf, self.gamma, self.beta, mean, var).astype(orig_dtype)


class Encoder(nn.Module):
    """Learned analysis filterbank (parity: ``src/conv_tasnet.py:97-121``).

    mixture [M, T] → frames [M, K, L] → matmul [L, N] → ReLU → [M, K, N].
    """

    cfg: ConvTasNetConfig

    @nn.compact
    def __call__(self, mixture: jax.Array) -> jax.Array:
        cfg = self.cfg
        w = self.param(
            "w", _conv_init(cfg.n_filters, 1, cfg.kernel_size),
            (cfg.kernel_size, cfg.n_filters),
        )
        frames = frame_signal(mixture, cfg.kernel_size, cfg.stride)
        return encode_frames({"w": w}, frames)


class Decoder(nn.Module):
    """Masked basis reconstruction + overlap-add (parity: ``src/conv_tasnet.py:123-146``).

    (mixture_w [M,K,N], masks [M,K,C,N]) → [M,C,K,L] → OLA hop L//2 → [M,C,T].
    """

    cfg: ConvTasNetConfig

    @nn.compact
    def __call__(self, mixture_w: jax.Array, est_mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        w = self.param(
            "w", _conv_init(cfg.kernel_size, cfg.n_filters, 1),
            (cfg.n_filters, cfg.kernel_size),
        )
        # D = W ⊙ M, then S = D V — one einsum: mask-apply fused into the matmul.
        est_frames = decode_frames({"w": w}, mixture_w, est_mask)
        return overlap_and_add(est_frames, cfg.stride)


class TemporalBlock(nn.Module):
    """One residual TCN block (parity: ``src/conv_tasnet.py:218-278``).

    1x1 (B→H) → PReLU → norm → depthwise dilated (P taps) → PReLU → norm →
    1x1 (H→B), with residual add and no output ReLU (reference keeps the
    better-performing variant, ``src/conv_tasnet.py:243``). Causal blocks
    left-pad only — the reference's pad+Chomp collapses to this.
    """

    cfg: ConvTasNetConfig
    dilation: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 params_only: bool = False):
        cfg = self.cfg
        B, H, P = cfg.bottleneck, cfg.hidden, cfg.conv_kernel
        w_in = self.param("conv1x1", _conv_init(H, B, 1), (B, H))
        a1 = self.param("prelu1", nn.initializers.constant(0.25), ())
        w_dw = self.param("dwconv", _conv_init(H, 1, P), (P, H))
        a2 = self.param("prelu2", nn.initializers.constant(0.25), ())
        w_out = self.param("pwconv", _conv_init(B, H, 1), (H, B))
        norm1 = Norm(cfg.norm_type, H, name="norm1")
        norm2 = Norm(cfg.norm_type, H, name="norm2")

        if params_only:
            # Pair-fusion path (TemporalConvNet): declare this block's
            # params under the canonical names and hand them out — the
            # caller feeds two consecutive blocks' params to one fused
            # two-block kernel (ops/pallas/tcn_block_pair). Checkpoint
            # layout is unchanged.
            return (w_in, w_dw, w_out, a1, a2,
                    norm1.gamma, norm1.beta, norm2.gamma, norm2.beta)

        if (cfg.use_pallas and train and x.ndim == 3
                and cfg.norm_type in ("gLN", "cLN")):
            # Fused training path: Pallas forward + single-kernel fused
            # backward (ops/pallas/tcn_block_bwd.py). Gated per dilation on
            # BOTH probe registries — a dilation whose backward lost the
            # on-device race (or never compiled) keeps plain XLA autodiff.
            from convtasnet_tpu.ops.pallas.tcn_block import (
                fused_block_bwd_ready,
                fused_block_ready,
                fused_tcn_block_ad,
                variant_params,
            )

            interpret = jax.default_backend() == "cpu"
            fwd_variant = fused_block_ready(
                self.dilation, cfg.norm_type, cfg.causal, interpret)
            bwd_variant = fused_block_bwd_ready(
                self.dilation, cfg.norm_type, cfg.causal, interpret)
            # The train probe's verdict is authoritative here: it raced the
            # full fused fwd+bwd pair against XLA autodiff (with exactly
            # these forward variant_params), so a recorded backward winner
            # engages the fused pair even when XLA won the *inference*
            # forward-only race for this dilation.
            if bwd_variant is not None:
                store_h2, h_dtype, _ = variant_params(fwd_variant)
                return fused_tcn_block_ad(
                    x, w_in, w_dw, w_out, a1, a2,
                    norm1.gamma, norm1.beta, norm2.gamma, norm2.beta,
                    dilation=self.dilation, causal=cfg.causal,
                    norm_type=cfg.norm_type, store_h2=store_h2,
                    h_dtype=h_dtype, bwd=bwd_variant, interpret=interpret)

        if cfg.use_pallas and not train and x.ndim == 3:
            # Fused single-kernel block (inference path, ops/pallas/tcn_block.py).
            # The trace-time gate consults the per-dilation autotune registry
            # populated by ensure_probed/probe_fused_block: a dilation that
            # failed to compile (or lost the on-device race to XLA) returns
            # None here and this block alone degrades to the XLA ops path —
            # one bad Mosaic compile can't fail the whole model's jit.
            from convtasnet_tpu.ops.pallas.tcn_block import (
                fused_block_ready,
                fused_tcn_block,
                variant_params,
            )

            interpret = jax.default_backend() == "cpu"
            variant = fused_block_ready(
                self.dilation, cfg.norm_type, cfg.causal, interpret)
            if variant is not None:
                bn_stats = None
                if cfg.norm_type == "BN":
                    bn_stats = (norm1.ra_mean.value, norm1.ra_var.value,
                                norm2.ra_mean.value, norm2.ra_var.value)
                store_h2, h_dtype, tile = variant_params(variant)
                kw = {"tile": tile} if tile else {}
                return fused_tcn_block(
                    x, w_in, w_dw, w_out, a1, a2,
                    norm1.gamma, norm1.beta, norm2.gamma, norm2.beta,
                    dilation=self.dilation, causal=cfg.causal,
                    norm_type=cfg.norm_type, bn_stats=bn_stats,
                    store_h2=store_h2, h_dtype=h_dtype, interpret=interpret,
                    **kw)

        blk = {"conv1x1": w_in, "prelu1": a1, "dwconv": w_dw,
               "prelu2": a2, "pwconv": w_out}
        return block_forward(
            blk, x,
            dwconv=lambda h, w: depthwise_conv1d(
                h, w, self.dilation, cfg.causal),
            norm1=lambda h: norm1(h, train=train),
            norm2=lambda h: norm2(h, train=train),
        )


class TemporalConvNet(nn.Module):
    """TCN separator → masks (parity: ``src/conv_tasnet.py:149-215``).

    cLN input norm → 1x1 bottleneck N→B → R repeats × X blocks (dilation
    2**x) → 1x1 B→C·N → relu/softmax masks [M, K, C, N]. Like the reference,
    no skip-connection accumulation path (``src/conv_tasnet.py:177``).
    """

    cfg: ConvTasNetConfig

    @nn.compact
    def __call__(self, mixture_w: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.cfg
        N, B, C = cfg.n_filters, cfg.bottleneck, cfg.num_speakers
        y = Norm("cLN", N, name="input_norm")(mixture_w, train=train)
        w_bottle = self.param("bottleneck", _conv_init(B, N, 1), (N, B))
        y = pointwise_conv(y, w_bottle.astype(y.dtype))
        block_cls = TemporalBlock
        if cfg.remat:
            # recompute block activations in the backward pass instead of
            # keeping 32 x [M, K, H] residents in HBM (jax.checkpoint);
            # `train` (arg 2 counting self) and `params_only` (arg 3) stay
            # static python bools
            block_cls = nn.remat(TemporalBlock, static_argnums=(2, 3))

        def pair_variant(xblk: int):
            """Trace-time gate: fuse blocks (xblk, xblk+1) into one
            two-block Pallas kernel? gLN/cLN inference and gLN training
            (pair custom-VJP, ops/pallas/tcn_block_pair_bwd); a pair
            engages on a real backend only after its probe compiled,
            numerics-gated, and raced it against the chained single-block
            winners (ensure_probed_pairs / ensure_probed_pair_train, run
            from tcn_block.ensure_probed(_train))."""
            if (not cfg.use_pallas or y.ndim != 3
                    or cfg.norm_type not in ("gLN", "cLN")
                    or xblk % 2 != 0 or xblk + 1 >= cfg.num_blocks):
                return None
            if train:
                from convtasnet_tpu.ops.pallas.tcn_block_pair import (
                    fused_block_pair_train_ready,
                )

                return fused_block_pair_train_ready(
                    2 ** xblk, 2 ** (xblk + 1), cfg.norm_type, cfg.causal,
                    jax.default_backend() == "cpu")
            from convtasnet_tpu.ops.pallas.tcn_block_pair import (
                fused_block_pair_ready,
            )

            return fused_block_pair_ready(
                2 ** xblk, 2 ** (xblk + 1), cfg.norm_type, cfg.causal,
                jax.default_backend() == "cpu")

        for r in range(cfg.num_repeats):
            xblk = 0
            while xblk < cfg.num_blocks:
                d = 2 ** xblk
                variant = pair_variant(xblk)
                if variant is not None:
                    from convtasnet_tpu.ops.pallas.tcn_block_pair import (
                        fused_tcn_block_pair,
                        fused_tcn_block_pair_ad,
                        pair_variant_kwargs,
                    )

                    pa = block_cls(cfg, dilation=d,
                                   name=f"block_r{r}_x{xblk}")(
                        y, train, True)
                    pb = block_cls(cfg, dilation=2 * d,
                                   name=f"block_r{r}_x{xblk + 1}")(
                        y, train, True)
                    if train:
                        kw = pair_variant_kwargs(variant)
                        y = fused_tcn_block_pair_ad(
                            y, pa, pb, d1=d, d2=2 * d, causal=cfg.causal,
                            norm_type=cfg.norm_type, bwd=variant,
                            interpret=jax.default_backend() == "cpu",
                            **kw)
                    else:
                        y = fused_tcn_block_pair(
                            y, pa, pb, d1=d, d2=2 * d, causal=cfg.causal,
                            norm_type=cfg.norm_type,
                            interpret=jax.default_backend() == "cpu",
                            **pair_variant_kwargs(variant))
                    xblk += 2
                else:
                    y = block_cls(cfg, dilation=d,
                                  name=f"block_r{r}_x{xblk}")(y, train, False)
                    xblk += 1
        w_mask = self.param("mask_conv", _conv_init(C * N, B, 1), (B, C * N))
        score = pointwise_conv(y, w_mask.astype(y.dtype))
        return mask_from_scores(cfg, score)


class ConvTasNet(nn.Module):
    """Full model (parity: ``src/conv_tasnet.py:13-60``).

    ``__call__(mixture [M, T]) -> est_source [M, C, T]`` — output right-padded
    with zeros back to the input length, as in the reference
    (``src/conv_tasnet.py:56-59``).
    """

    cfg: ConvTasNetConfig

    @nn.compact
    def __call__(self, mixture: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.cfg
        x = mixture.astype(jnp.dtype(cfg.compute_dtype))
        mixture_w = Encoder(cfg, name="encoder")(x)
        if cfg.separator == "dpt":
            from convtasnet_tpu.models.dual_path import DualPathSeparator

            sep_cls = DualPathSeparator
        elif cfg.separator == "tcn":
            sep_cls = TemporalConvNet
        else:
            raise ValueError(f"unsupported separator family: {cfg.separator}")
        est_mask = sep_cls(cfg, name="separator")(mixture_w, train=train)
        est_source = Decoder(cfg, name="decoder")(mixture_w, est_mask)
        T_origin = mixture.shape[-1]
        T_conv = est_source.shape[-1]
        if T_conv < T_origin:
            est_source = jnp.pad(
                est_source, [(0, 0)] * (est_source.ndim - 1) + [(0, T_origin - T_conv)]
            )
        return est_source.astype(jnp.float32)


def create_model(cfg: ConvTasNetConfig) -> ConvTasNet:
    return ConvTasNet(cfg)


def apply_batch_chunked(model, variables, mixture, chunk: int = 8, **kw):
    """Forward with the batch axis processed in ``chunk``-row slices via
    ``lax.map`` inside one jit.

    Why: XLA's memory-space assignment homes the inter-block activations in
    VMEM while a slice's working set fits (~13 MB at 8 x 4 s), which is
    worth ~30% per-element at the paper shapes; a 32-row batch as one call
    spills them to HBM. Chunking a B=32 forward into 4 x 8 restores the
    residency: measured 24.8 -> 20.3 ms (+22% throughput) on v5e
    (docs/RESULTS.md "Batch scaling"). Falls back to one call when the
    batch is small or not divisible by ``chunk``.
    """
    M = mixture.shape[0]
    if chunk <= 0 or M <= chunk or M % chunk != 0:
        return model.apply(variables, mixture, **kw)
    mm = mixture.reshape(M // chunk, chunk, *mixture.shape[1:])
    out = jax.lax.map(lambda c: model.apply(variables, c, **kw), mm)
    return out.reshape(M, *out.shape[2:])


def init_params(
    cfg: ConvTasNetConfig, rng: jax.Array, example_len: Optional[int] = None
):
    """Initialize variables. Returns the full variable dict ({'params', and
    'batch_stats' when norm_type == 'BN'})."""
    model = ConvTasNet(cfg)
    T = example_len or 4 * cfg.sample_rate
    dummy = jnp.zeros((1, T), jnp.float32)
    return model.init(rng, dummy, train=False)
