"""convtasnet_tpu — a TPU-native (JAX/XLA/Pallas) audio source-separation framework.

A ground-up rebuild of the capabilities of the reference Conv-TasNet stack
(OfekCohen1/Conv-TasNet, itself a fork of kaituoxu/Conv-TasNet) designed for
TPU hardware:

- channels-last ``[batch, time, channels]`` layouts so every 1x1 conv is an
  MXU matmul with the channel dim on the 128-wide lane axis,
- framing / overlap-add as reshapes + shifted adds (no scatter),
- depthwise dilated convs as a handful of shifted fused multiply-adds on the
  VPU (and a fused Pallas TCN block kernel on the hot path),
- fully vectorized utterance-level PIT (permutation one-hot einsum),
- ``jax.sharding``-based data parallelism over a device mesh with XLA
  collectives over ICI,
- a functional solver (epochs / LR-halving / early-stop / checkpointing)
  around one jitted, donated train step.

Reference capability map lives in SURVEY.md at the repo root; individual
modules cite the reference files (path:line) they provide parity with.
"""

__version__ = "0.1.0"

from convtasnet_tpu.config import (  # noqa: F401
    ConvTasNetConfig,
    DataConfig,
    SolverConfig,
    TrainConfig,
)
