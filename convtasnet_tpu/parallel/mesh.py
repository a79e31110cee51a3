"""Device mesh and sharding helpers — the distributed-communication layer.

The reference's only parallelism is single-process ``nn.DataParallel``
(replicate + scatter/gather each step, ``src/train.py:83-85``) and its
"cluster" story is GridEngine job *scheduling* with no inter-job
communication (``egs/wsj0/cmd.sh:13-23``). Here the TPU-native equivalent is
a named device mesh + ``jax.sharding``: parameters are replicated, batches
are sharded over the ``data`` axis, and XLA inserts the gradient
all-reduce over ICI (in-slice) / DCN (cross-slice) automatically from the
sharding annotations. An optional ``model`` axis is reserved for
channel-sharded tensor parallelism.

Multi-host slices initialize via ``jax.distributed.initialize`` (coordinator
discovery is handled by the TPU runtime on Cloud TPU pods).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up. No-op when already initialized or single-host."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process run


def make_mesh(
    n_data: int = -1,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a ``(data, model)`` mesh. ``n_data=-1`` uses all devices / n_model.

    Device order follows ``jax.devices()``, which on TPU enumerates chips so
    that adjacent logical devices are ICI neighbors — keeping the data-axis
    all-reduce on ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        assert len(devices) % n_model == 0
        n_data = len(devices) // n_model
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis (leading array axis)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arrays):
    """Place host arrays on the mesh, batch-sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), arrays)


def pad_batch_to_shards(batch_size: int, n_data: int) -> int:
    """Smallest multiple of ``n_data`` >= batch_size (zero-weight rows fill
    the remainder — see data/dataset.py)."""
    return ((batch_size + n_data - 1) // n_data) * n_data
