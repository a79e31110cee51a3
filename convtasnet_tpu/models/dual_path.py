"""Dual-path attention separator (a second separator family, TPU-native).

The reference stack ships exactly one separator — the dilated TCN
(``src/conv_tasnet.py:149-215``). This module adds a dual-path
transformer separator in the SepFormer / DPRNN family (Luo et al.,
arXiv:1910.06379; Subakan et al., arXiv:2010.13154) as a drop-in
alternative behind the same encoder/decoder/mask contract
(``cfg.separator = "dpt"``): frames are segmented into fixed-size chunks
and alternating *intra-chunk* (local) and *inter-chunk* (global)
multi-head self-attention layers model short- and long-range structure.

It is deliberately attention-based rather than the original LSTM dual
path: every op is a batched matmul (QKV projections, attention scores,
FFNs) that maps straight onto the MXU with static shapes, where an LSTM's
sequential recurrence would serialize ~K/chunk steps of tiny matmuls
through a ``lax.scan``. The dual-path trick itself is TPU-friendly —
reshaping [K] into [n_chunks, S] turns one long attention (O(K²), HBM-
hostile at K≈3200) into two short ones (O(K·S) + O(K·K/S)), both sized to
tile cleanly.

Layout notes:
- channels-last throughout: [M, K, B] → [M, n, S, B] via one reshape (no
  transposes; chunks are contiguous, 50%-overlap windowing is framing,
  which the encoder already showed is a reshape+concat on TPU — we use
  non-overlapping chunks, as attention needs no overlap to see across a
  boundary, unlike DPRNN's LSTMs).
- attention softmax/statistics in float32 under bf16 compute (same rule
  as the norms, ``ops/norm.py``).
- padded tail frames (K → n·S) are masked out of every softmax, so the
  valid outputs are independent of the pad content (tested by perturbing
  the pad).
- sinusoidal positional encodings on intra (position-in-chunk) and inter
  (chunk-index) paths — attention is otherwise permutation-equivariant.

Parallelism: data-parallel training works unchanged (batch-axis
sharding); the attention QKV/FFN matmuls Megatron-split over ``model``
for GSPMD training and inference (``parallel/tensor_parallel``:
``make_sharded_train_step`` / ``make_gspmd_forward``); long mixtures run
sequence-parallel with the chunk axis sharded and inter-chunk keys/values
gathered (``parallel/sharded_ops._dpt_shard_forward``). The fused Pallas
TCN kernels simply do not engage for this family (its hot ops are plain
MXU matmuls XLA already fuses well).
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.functional import mask_from_scores
from convtasnet_tpu.ops.conv import pointwise_conv

NEG_INF = -1e9


def sinusoid_encoding(length: int, dim: int) -> np.ndarray:
    """Standard fixed sin/cos positional table [length, dim] (f32)."""
    pos = np.arange(length)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
    enc = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return enc.astype(np.float32)


def masked_mha(q, k, v, key_valid, n_heads: int):
    """Multi-head attention with invalid keys masked out of the softmax.

    q: [..., Tq, D], k/v: [..., Tk, D] (already projected; Tq == Tk for the
    in-model paths, Tq < Tk for the sequence-parallel inter path where keys
    are gathered across shards); key_valid: [..., Tk] bool or None. Softmax
    in f32. Returns [..., Tq, D] in q.dtype.
    """
    *lead, T, D = q.shape
    Tk = k.shape[-2]
    Dh = D // n_heads
    qh = q.reshape(*lead, T, n_heads, Dh)
    kh = k.reshape(*lead, Tk, n_heads, Dh)
    vh = v.reshape(*lead, Tk, n_heads, Dh)
    # [..., heads, Tq, Tk]
    logits = jnp.einsum("...qhd,...khd->...hqk", qh, kh).astype(jnp.float32)
    logits = logits / np.sqrt(Dh)
    if key_valid is not None:
        bias = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)
        logits = logits + bias[..., None, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("...hqk,...khd->...qhd", w, vh)
    return out.reshape(*lead, T, D)


class _LayerNorm(nn.Module):
    """Pre-LN with f32 statistics (last axis). Setup-style so the fused
    Pallas path can read ``gamma``/``beta`` without invoking the op (same
    pattern as ``models.conv_tasnet.Norm``)."""

    features: int

    def setup(self):
        self.gamma = self.param(
            "gamma", nn.initializers.ones, (self.features,))
        self.beta = self.param(
            "beta", nn.initializers.zeros, (self.features,))

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        return (y * self.gamma + self.beta).astype(x.dtype)


class _ProjKernel(nn.Module):
    """Owns one projection weight — the same param path ("<name>/kernel")
    and init as ``nn.Dense(use_bias=False)``, but hands the raw matrix to
    the caller so the fused attention kernel and the XLA path share it."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape)


class _AttentionSublayer(nn.Module):
    """Pre-LN MHA + residual; one dense QKV matmul + output projection.

    ``attend_axis`` selects which axis of the [M, n, S, B] tensor the
    attention mixes: 2 = intra (within each chunk, over S), 1 = inter
    (across chunks, over n). Both paths keep the LN/QKV/output projections
    in the natural channels-last layout — measured on v5e, projecting the
    *transposed* [M, S, n, B] tensor runs the same FLOPs ~7x slower (XLA
    lowers it to per-(m, s) [n, B] matmuls instead of one [M·n·S, B] one),
    which made the inter sublayer 5x the cost of the intra one. Only the
    attention einsums differ between the two paths.
    """

    features: int
    n_heads: int
    attend_axis: int = 2
    train: bool = False
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, frame_valid):
        # x: [M, n, S, B]; frame_valid: [n, S] bool (True = real frame)
        M, n, S, B = x.shape
        h = self.n_heads
        d = self.features // h
        norm = _LayerNorm(self.features, name="norm")
        w_qkv = _ProjKernel((self.features, 3 * self.features),
                            name="qkv")()
        w_out = _ProjKernel((self.features, self.features), name="out")()

        if (self.use_pallas and self.attend_axis == 1
                and x.ndim == 4 and B % h == 0 and B % 128 == 0):
            # Fused inter-chunk sublayer (ops/pallas/dpt_attention.py):
            # pre-LN + QKV + attention-over-chunks + out proj + residual in
            # one VMEM-resident kernel. Trace-time gated on the per-shape
            # probe registries — an unprobed / losing / non-compiling shape
            # keeps the XLA path below. Inference uses the forward kernel;
            # training additionally requires the fused-backward registry
            # (probe_fused_inter_train raced AND cotangent-verified the
            # pair) and goes through the custom-VJP wrapper.
            from convtasnet_tpu.ops.pallas.dpt_attention import (
                fused_inter_attention,
                fused_inter_attention_ad,
                fused_inter_ready,
                fused_inter_train_ready,
            )

            interpret = jax.default_backend() == "cpu"
            st = fused_inter_ready(M, n, S, B, h, x.dtype, interpret)
            trn = self.train and fused_inter_train_ready(
                M, n, S, B, h, x.dtype, interpret)
            if st is not None and (not self.train or trn):
                bias = None
                if frame_valid is not None:
                    bias = jnp.where(frame_valid, 0.0, NEG_INF)
                st_val = None if st == "auto" else st
                if self.train:
                    return fused_inter_attention_ad(
                        x, norm.gamma, norm.beta, w_qkv, w_out, bias,
                        n_heads=h, s_tile=st_val, bwd=True,
                        interpret=interpret)
                return fused_inter_attention(
                    x, norm.gamma, norm.beta, w_qkv, w_out, bias,
                    n_heads=h, s_tile=st_val, interpret=interpret)

        if (self.use_pallas and self.attend_axis == 2
                and x.ndim == 4 and B % h == 0 and B % 128 == 0):
            # Fused intra-chunk sublayer (ops/pallas/dpt_intra.py): same
            # contract and gating discipline as the inter branch above —
            # pre-LN + QKV + per-chunk MHA + out proj + residual in one
            # VMEM-resident kernel, probe-gated per shape.
            from convtasnet_tpu.ops.pallas.dpt_intra import (
                fused_intra_attention,
                fused_intra_attention_ad,
                fused_intra_ready,
                fused_intra_train_ready,
            )

            interpret = jax.default_backend() == "cpu"
            ct = fused_intra_ready(M, n, S, B, h, x.dtype, interpret)
            trn = self.train and fused_intra_train_ready(
                M, n, S, B, h, x.dtype, interpret)
            if ct is not None and (not self.train or trn):
                bias = None
                if frame_valid is not None:
                    bias = jnp.where(frame_valid, 0.0, NEG_INF)
                ct_val = None if ct == "auto" else ct
                if self.train:
                    return fused_intra_attention_ad(
                        x, norm.gamma, norm.beta, w_qkv, w_out, bias,
                        n_heads=h, c_tile=ct_val, bwd=True,
                        interpret=interpret)
                return fused_intra_attention(
                    x, norm.gamma, norm.beta, w_qkv, w_out, bias,
                    n_heads=h, c_tile=ct_val, interpret=interpret)

        y = norm(x)
        qkv = y @ w_qkv.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = q.reshape(M, n, S, h, d)
        kh = k.reshape(M, n, S, h, d)
        vh = v.reshape(M, n, S, h, d)
        scale = 1.0 / np.sqrt(d)
        if self.attend_axis == 2:       # intra: queries/keys over S
            logits = jnp.einsum("mnqhd,mnkhd->mnhqk", qh, kh)
            logits = logits.astype(jnp.float32) * scale
            if frame_valid is not None:
                bias = jnp.where(frame_valid, 0.0, NEG_INF)
                logits = logits + bias[None, :, None, None, :]
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            a = jnp.einsum("mnhqk,mnkhd->mnqhd", w, vh)
        else:                           # inter: queries/keys over n
            logits = jnp.einsum("mqshd,mkshd->mshqk", qh, kh)
            logits = logits.astype(jnp.float32) * scale
            if frame_valid is not None:
                bias = jnp.where(frame_valid.T, 0.0, NEG_INF)
                logits = logits + bias[None, :, None, None, :]
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            a = jnp.einsum("mshqk,mkshd->mqshd", w, vh)
        a = a.reshape(M, n, S, B)
        return x + a @ w_out.astype(x.dtype)


class _DenseParams(nn.Module):
    """Owns one kernel + bias pair — the same param paths
    ("<name>/kernel", "<name>/bias") and initializers as
    ``nn.Dense(use_bias=True)``, but hands the raw arrays to the caller so
    the fused FFN kernel and the XLA path share them."""

    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[1],))
        return k, b


class _FFNSublayer(nn.Module):
    """Pre-LN GELU MLP + residual."""

    features: int
    ff: int
    train: bool = False
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        norm = _LayerNorm(self.features, name="norm")
        w_up, b_up = _DenseParams((self.features, self.ff), name="up")()
        w_down, b_down = _DenseParams((self.ff, self.features),
                                      name="down")()

        if (self.use_pallas and x.ndim == 4
                and self.features % 128 == 0 and self.ff % 128 == 0):
            # Fused FFN sublayer (ops/pallas/dpt_ffn.py): pre-LN + GELU
            # MLP + residual in one VMEM-resident kernel — in XLA the
            # sublayer is HBM-bound on LN/GELU/residual round trips.
            # Probe-gated per shape like the attention kernel. Inference
            # uses the forward kernel; training additionally requires the
            # fused-backward registry (probe_fused_ffn_train raced AND
            # cotangent-verified the pair) and goes through the
            # custom-VJP wrapper.
            from convtasnet_tpu.ops.pallas.dpt_ffn import (
                fused_ffn,
                fused_ffn_ad,
                fused_ffn_ready,
                fused_ffn_train_ready,
            )

            M, n, S, B = x.shape
            interpret = jax.default_backend() == "cpu"
            kt = fused_ffn_ready(M, n * S, B, self.ff, x.dtype, interpret)
            trn = self.train and fused_ffn_train_ready(
                M, n * S, B, self.ff, x.dtype, interpret)
            if kt is not None and (not self.train or trn):
                kt_val = None if kt == "auto" else kt
                if self.train:
                    out = fused_ffn_ad(
                        x.reshape(M, n * S, B), norm.gamma, norm.beta,
                        w_up, b_up, w_down, b_down, k_tile=kt_val,
                        bwd=True, interpret=interpret)
                else:
                    out = fused_ffn(
                        x.reshape(M, n * S, B), norm.gamma, norm.beta,
                        w_up, b_up, w_down, b_down, k_tile=kt_val,
                        interpret=interpret)
                return out.reshape(M, n, S, B)

        y = norm(x)
        y = y @ w_up.astype(x.dtype) + b_up.astype(x.dtype)
        y = jax.nn.gelu(y)
        y = y @ w_down.astype(x.dtype) + b_down.astype(x.dtype)
        return x + y


class DualPathLayer(nn.Module):
    """One intra-chunk + one inter-chunk attention pass (each MHA + FFN)."""

    features: int
    n_heads: int
    ff: int
    train: bool = False
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, frame_valid):
        # x: [M, n, S, B]; frame_valid: [n, S] (True = real frame).
        # Both passes stay in the natural layout; the sublayer's
        # attend_axis picks the mixing axis (no swapaxes round trips).
        # --- intra: attend over S within each chunk ---
        x = _AttentionSublayer(self.features, self.n_heads, attend_axis=2,
                               train=self.train, use_pallas=self.use_pallas,
                               name="intra_att")(x, frame_valid)
        x = _FFNSublayer(self.features, self.ff, train=self.train,
                         use_pallas=self.use_pallas, name="intra_ffn")(x)
        # --- inter: attend over chunks at each in-chunk position ---
        x = _AttentionSublayer(self.features, self.n_heads, attend_axis=1,
                               train=self.train, use_pallas=self.use_pallas,
                               name="inter_att")(x, frame_valid)
        x = _FFNSublayer(self.features, self.ff, train=self.train,
                         use_pallas=self.use_pallas, name="inter_ffn")(x)
        return x


class DualPathSeparator(nn.Module):
    """Encoder frames [M, K, N] -> masks [M, K, C, N].

    Same external contract as ``TemporalConvNet`` so ``ConvTasNet``
    dispatches on ``cfg.separator``; shares the mask head semantics
    (``mask_from_scores``: relu / per-speaker softmax).
    """

    cfg: ConvTasNetConfig

    @nn.compact
    def __call__(self, mixture_w: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.cfg
        N, B, C, S = (cfg.n_filters, cfg.bottleneck, cfg.num_speakers,
                      cfg.dpt_chunk)
        M, K, _ = mixture_w.shape
        y = _LayerNorm(N, name="input_norm")(mixture_w)
        y = nn.Dense(B, use_bias=False, name="bottleneck", dtype=y.dtype)(y)

        n = -(-K // S)  # ceil
        Kp = n * S
        if Kp != K:
            y = jnp.pad(y, ((0, 0), (0, Kp - K), (0, 0)))
        x = y.reshape(M, n, S, B)
        frame_valid = (jnp.arange(Kp).reshape(n, S) < K)

        # positional encodings: in-chunk position + chunk index
        intra_pos = jnp.asarray(sinusoid_encoding(S, B))
        inter_pos = jnp.asarray(sinusoid_encoding(n, B))
        x = x + intra_pos[None, None].astype(x.dtype) \
            + inter_pos[None, :, None].astype(x.dtype)

        layer_cls = DualPathLayer
        if cfg.remat:
            # recompute each dual-path layer in the backward (the [M, n, S, B]
            # residents otherwise stack up per sublayer), same knob as the TCN
            layer_cls = nn.remat(DualPathLayer)
        for i in range(cfg.dpt_layers):
            x = layer_cls(B, cfg.dpt_num_heads, cfg.dpt_ff, train=train,
                          use_pallas=bool(cfg.use_pallas),
                          name=f"layer_{i}")(x, frame_valid)

        x = _LayerNorm(B, name="output_norm")(x)
        x = x.reshape(M, Kp, B)[:, :K]
        w_mask = self.param(
            "mask_conv", nn.initializers.xavier_normal(), (B, C * N))
        score = pointwise_conv(jax.nn.relu(x), w_mask.astype(x.dtype))
        return mask_from_scores(cfg, score)
