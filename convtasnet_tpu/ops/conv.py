"""Convolution ops for channels-last ``[..., K, C]`` activations.

TPU-first formulations of the reference's conv stack
(``src/conv_tasnet.py:97-295``):

- 1x1 convs are plain matmuls over the channel axis — with channels last and
  N/B/H in {256, 512} they tile perfectly onto the 128x128 MXU.
- The depthwise dilated conv (kernel P=3) is P shifted elementwise
  multiply-adds on the VPU instead of a grouped-conv op; XLA fuses the shifts
  and FMAs into one pass over VMEM. Causal padding + chomp
  (``src/conv_tasnet.py:182,281-295``) collapses into "left-pad only".
- PReLU matches ``nn.PReLU()`` default: one shared scalar slope, init 0.25.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def pointwise_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """1x1 conv: ``[..., K, Cin] @ [Cin, Cout] -> [..., K, Cout]`` (MXU matmul)."""
    return jnp.einsum("...ki,io->...ko", x, w, preferred_element_type=x.dtype)


def depthwise_conv1d(
    x: jax.Array, w: jax.Array, dilation: int, causal: bool
) -> jax.Array:
    """Depthwise dilated conv with SAME output length.

    Args:
        x: [..., K, C]
        w: [P, C] per-channel taps
        dilation: dilation factor d
        causal: if True, left-pad (P-1)*d (reference pad+Chomp semantics,
            ``src/conv_tasnet.py:182,253-258,295``); else symmetric SAME pad
            (P-1)*d//2 each side (P odd).

    Returns:
        [..., K, C]
    """
    P = w.shape[0]
    K = x.shape[-2]
    halo = (P - 1) * dilation
    if causal:
        pad = (halo, 0)
    else:
        if (P - 1) % 2 != 0:
            raise ValueError("non-causal SAME padding requires odd kernel size")
        pad = (halo // 2, halo // 2)
    pad_width = [(0, 0)] * (x.ndim - 2) + [pad, (0, 0)]
    xp = jnp.pad(x, pad_width)
    out = xp[..., 0 * dilation : 0 * dilation + K, :] * w[0]
    for p in range(1, P):
        out = out + xp[..., p * dilation : p * dilation + K, :] * w[p]
    return out


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """PReLU with scalar (or per-channel) slope. alpha init 0.25 matches torch."""
    return jnp.where(x >= 0, x, alpha * x)


def torch_conv_xavier_normal(out_ch: int, in_ch_per_group: int, kernel_w: int):
    """Xavier-normal std matching ``nn.init.xavier_normal_`` on a torch conv
    weight ``[out_ch, in_ch/groups, kW]`` (reference init, ``src/conv_tasnet.py:41-43``).

    torch computes fan_in = (in_ch/groups)*kW, fan_out = out_ch*kW; returns the
    gaussian std sqrt(2/(fan_in+fan_out)). Used so our training dynamics match
    the reference's from step 0.
    """
    fan_in = in_ch_per_group * kernel_w
    fan_out = out_ch * kernel_w
    return math.sqrt(2.0 / (fan_in + fan_out))
