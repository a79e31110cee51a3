"""Self-describing checkpoints.

Parity with the reference "package" format (``src/conv_tasnet.py:78-94``,
write sites ``src/solver.py:94-102,138-146``): one file holding the model
hyperparameters, model parameters, optimizer state, epoch, and the full
train/cv loss history — so evaluation/separation can reconstruct the model
with no external config (``load_model_from_package``,
``src/conv_tasnet.py:69-76``).

Implementation: msgpack (via flax.serialization) for the tensors with a JSON
metadata header. Saves are atomic (tmp + rename) so a preempted write never
corrupts the best-model file; loads restore exact dtypes/shapes.

An orbax backend is available behind the same API (``backend="orbax"`` on
save; loads auto-detect): the checkpoint becomes a directory with an orbax
PyTree store plus the same JSON metadata, for interop with the wider
orbax/flax ecosystem (sharded/async multi-host saves). Every consumer
(resume, evaluate, separate, export-torch) accepts either format.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from convtasnet_tpu.config import ConvTasNetConfig

MAGIC = b"CTTPU1\x00\x00"


_async_pool = None


def save_checkpoint(
    path: str,
    state,
    model_cfg: ConvTasNetConfig,
    epoch: int,
    tr_loss=None,
    cv_loss=None,
    extra: Optional[Dict[str, Any]] = None,
    async_save: bool = False,
    backend: str = "msgpack",
) -> None:
    """Write a self-describing checkpoint package atomically.

    ``async_save=True`` fetches device arrays synchronously (cheap — the
    accelerator keeps running) but serializes + writes in a background
    thread, so the train loop never blocks on disk. Atomic tmp+rename makes
    an overlapping save never corrupt the previous file; call
    ``wait_for_saves()`` before relying on the file.

    ``backend="orbax"`` writes an orbax PyTree store directory instead of
    the single-file msgpack package (same metadata; loads auto-detect).
    """
    meta = {
        "format_version": 1,
        "model": model_cfg.to_dict(),
        "epoch": int(epoch),
        "tr_loss": [float(x) for x in (tr_loss or [])],
        "cv_loss": [float(x) for x in (cv_loss or [])],
        "extra": extra or {},
    }
    state_dict = serialization.to_state_dict(state)
    state_dict = jax.tree_util.tree_map(np.asarray, state_dict)

    if backend not in ("msgpack", "orbax"):
        raise ValueError(f"unknown checkpoint backend: {backend}")

    def _write_msgpack():
        payload = serialization.msgpack_serialize(state_dict)
        meta_bytes = json.dumps(meta).encode("utf-8")
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(MAGIC)
            f.write(struct.pack("<Q", len(meta_bytes)))
            f.write(meta_bytes)
            f.write(payload)
        os.replace(tmp, path)

    def _write():
        if backend == "orbax":
            _save_orbax(path, state_dict, meta)
        else:
            _write_msgpack()

    if not async_save:
        _write()
        return
    global _async_pool
    if _async_pool is None:
        from concurrent.futures import ThreadPoolExecutor

        _async_pool = ThreadPoolExecutor(max_workers=1)
    _async_pool.submit(_write)


def wait_for_saves() -> None:
    """Block until all async checkpoint writes have landed."""
    global _async_pool
    if _async_pool is not None:
        _async_pool.shutdown(wait=True)
        _async_pool = None


def _save_orbax(path: str, state_dict, meta) -> None:
    # Atomicity contract (same as the msgpack path's tmp+rename): a
    # preemption at ANY point leaves a restorable checkpoint. orbax's own
    # save is atomic into a fresh directory, but overwriting via
    # ``force=True`` deletes the previous store first — so instead write
    # into ``state.new`` and swap:  state -> state.old, state.new -> state,
    # drop state.old.  If the process dies mid-swap, ``_load_orbax`` falls
    # back to ``state.old``.
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    final = os.path.join(path, "state")
    new = final + ".new"
    old = final + ".old"
    if os.path.exists(new):
        shutil.rmtree(new)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(new, state_dict)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(final):
        os.rename(final, old)
    os.rename(new, final)
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "meta.json"))
    shutil.rmtree(old, ignore_errors=True)


def _load_orbax(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    state = os.path.join(os.path.abspath(path), "state")
    if not os.path.exists(state) and os.path.exists(state + ".old"):
        state = state + ".old"  # save was preempted mid-swap
    with ocp.PyTreeCheckpointer() as ckptr:
        state_dict = ckptr.restore(state)
    return state_dict, meta


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """-> (state_dict, meta). ``state_dict`` is a nested dict of numpy arrays;
    restore into a template with ``restore_state``. Accepts either the
    msgpack package file or an orbax checkpoint directory."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "meta.json")):
            return _load_orbax(path)
        raise ValueError(f"not a checkpoint directory (no meta.json): {path}")
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != MAGIC:
            raise ValueError(f"not a convtasnet_tpu checkpoint: {path}")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        state_dict = serialization.msgpack_restore(f.read())
    return state_dict, meta


def restore_state(template_state, state_dict):
    """Restore a TrainState (or any pytree) from a loaded state dict."""
    return serialization.from_state_dict(template_state, state_dict)


def model_config_from_checkpoint(path: str) -> ConvTasNetConfig:
    """Reconstruct the architecture from checkpoint metadata alone (parity:
    ``ConvTasNet.load_model``, ``src/conv_tasnet.py:62-76``)."""
    _, meta = load_checkpoint(path)
    return ConvTasNetConfig.from_dict(meta["model"])


def load_params_for_inference(path: str):
    """-> (model_cfg, {'params': ..., ['batch_stats': ...]}) ready for
    ``ConvTasNet(cfg).apply``."""
    state_dict, meta = load_checkpoint(path)
    cfg = ConvTasNetConfig.from_dict(meta["model"])
    variables = {"params": state_dict["params"]}
    if state_dict.get("batch_stats"):
        variables["batch_stats"] = state_dict["batch_stats"]
    return cfg, variables
