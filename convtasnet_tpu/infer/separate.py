"""Deployment separation: mixture wavs in, per-speaker wavs out.

Capability parity with ``src/separate.py:17-57``: loads a self-describing
checkpoint, auto-builds the manifest from a mixture directory if needed,
batches length-sorted mixtures, and writes ``<utt>.wav`` (the input mixture)
plus ``<utt>_s{c}.wav`` per separated speaker. The reference's
``strip('.wav')`` filename bug (``src/separate.py:53`` — strips characters,
not a suffix) is fixed with a real splitext.

TPU-first: batched jitted forward with time-bucketed padding; only the
unpadded samples come back to the host.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from convtasnet_tpu.data.audio_io import write_wav
from convtasnet_tpu.data.dataset import EvalDataset
from convtasnet_tpu.models.conv_tasnet import ConvTasNet
from convtasnet_tpu.train.checkpoint import load_params_for_inference
from convtasnet_tpu.utils.padding import remove_pad


def separate(
    model_path: str,
    out_dir: str,
    mix_dir: Optional[str] = None,
    mix_json: Optional[str] = None,
    batch_size: int = 1,
    sample_rate: int = 8000,
    pad_to_multiple: int = 8000,
    write_mix: bool = True,
    streaming: bool = False,
    chunk_seconds: float = 0.5,
    sequence_parallel: bool = False,
    ring_attention: bool = False,
    use_pallas: Optional[bool] = None,
    batch_chunk: int = 8,
    tensor_parallel: int = 0,
) -> int:
    """Separate every mixture; returns the number of utterances written.

    ``batch_chunk``: process the batch axis in this many rows per
    ``lax.map`` slice inside the jit (0 disables) — keeps each slice's
    inter-block activations VMEM-resident (+22% throughput at B=32;
    docs/RESULTS.md "Batch scaling").

    ``streaming=True`` runs the stateful chunk-by-chunk separator instead of
    the batch forward — requires a causal (cLN/BN) checkpoint; this is the
    low-latency deployment path (``models/streaming.py``), exercised here
    offline for functional parity.

    ``tensor_parallel=m > 1`` serves over a 2-D (data x model) mesh: the
    batch shards over ``data`` and the separator's channels/heads
    Megatron-split over a ``model`` axis of size ``m`` — the TCN through
    ``tensor_parallel.tp_forward``, the dual-path family through the
    fused-kernel shard_map (``parallel/dpt_tp.py``).

    ``use_pallas=None`` auto-enables the fused TCN kernels on a real
    accelerator backend (batch path only; probe-gated per dilation).
    """
    cfg, variables = load_params_for_inference(model_path)
    if streaming:
        return _separate_streaming(cfg, variables, out_dir, mix_dir, mix_json,
                                   sample_rate, chunk_seconds, write_mix)
    if sequence_parallel:
        return _separate_sequence_parallel(cfg, variables, out_dir, mix_dir,
                                           mix_json, sample_rate, write_mix,
                                           ring_attention=ring_attention)
    from convtasnet_tpu.infer.evaluate import _maybe_enable_pallas

    cfg = _maybe_enable_pallas(cfg, use_pallas)
    if tensor_parallel > 1:
        return _separate_tensor_parallel(
            cfg, variables, out_dir, mix_dir, mix_json, sample_rate,
            write_mix, batch_size, pad_to_multiple, tensor_parallel)
    model = ConvTasNet(cfg)
    ds = EvalDataset(mix_dir=mix_dir, mix_json=mix_json,
                     batch_size=batch_size, sample_rate=sample_rate)
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def run(mixture):
        # batch chunking keeps each slice's inter-block activations
        # VMEM-resident (+22% at B=32; models/conv_tasnet.apply_batch_chunked)
        from convtasnet_tpu.models.conv_tasnet import apply_batch_chunked

        return apply_batch_chunked(model, variables, mixture,
                                   chunk=batch_chunk, train=False)

    def _write(est_dev, mixture, lengths, names):
        est = np.asarray(jax.device_get(est_dev))
        est_list = remove_pad(est, lengths)
        mix_list = remove_pad(mixture, lengths)
        written = 0
        for b, name in enumerate(names):
            stem = os.path.splitext(os.path.basename(name))[0]
            if write_mix:
                write_wav(os.path.join(out_dir, stem + ".wav"),
                          mix_list[b], sample_rate)
            for c in range(cfg.num_speakers):
                write_wav(os.path.join(out_dir, f"{stem}_s{c + 1}.wav"),
                          est_list[b][c], sample_rate)
            written += 1
        return written

    # one-deep pipeline: dispatch batch i+1 (jax is async — `run` returns
    # a future-like array) BEFORE collecting batch i, so host-side decode
    # and wav writes overlap device compute (and the device link's RTT)
    n_written = 0
    pending = None
    for bi in range(len(ds)):
        mixture, lengths, names = ds.load_batch(bi, pad_to_multiple=pad_to_multiple)
        if cfg.use_pallas:
            from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed

            rows = mixture.shape[0]
            if batch_chunk > 0 and rows > batch_chunk \
                    and rows % batch_chunk == 0:
                rows = batch_chunk
            ensure_probed(cfg, rows, mixture.shape[1])
        est_dev = run(jnp.asarray(mixture))
        if pending is not None:
            n_written += _write(*pending)
        pending = (est_dev, mixture, lengths, names)
    if pending is not None:
        n_written += _write(*pending)
    return n_written


def _separate_streaming(cfg, variables, out_dir, mix_dir, mix_json,
                        sample_rate, chunk_seconds, write_mix) -> int:
    """Chunk-by-chunk separation with the streaming runtime."""
    from convtasnet_tpu.models.streaming import StreamingSeparator

    ds = EvalDataset(mix_dir=mix_dir, mix_json=mix_json, batch_size=1,
                     sample_rate=sample_rate)
    os.makedirs(out_dir, exist_ok=True)
    hop = cfg.stride
    chunk = max(hop, int(chunk_seconds * sample_rate) // hop * hop)
    n_written = 0
    sep = StreamingSeparator(cfg, variables, batch_size=1)
    for bi in range(len(ds)):
        mixture, lengths, names = ds.load_batch(bi)
        T = int(lengths[0])
        # pad to whole chunks
        Tp = ((T + chunk - 1) // chunk) * chunk
        x = np.zeros((1, Tp), np.float32)
        x[0, :T] = mixture[0, :T]
        sep.reset()
        outs = []
        for s in range(0, Tp, chunk):
            outs.append(np.asarray(sep.process(jnp.asarray(x[:, s:s + chunk]))))
        outs.append(np.asarray(sep.flush()))
        est = np.concatenate(outs, axis=-1)[0, :, :T]
        stem = os.path.splitext(os.path.basename(names[0]))[0]
        if write_mix:
            write_wav(os.path.join(out_dir, stem + ".wav"),
                      mixture[0, :T], sample_rate)
        for c in range(cfg.num_speakers):
            write_wav(os.path.join(out_dir, f"{stem}_s{c + 1}.wav"),
                      est[c], sample_rate)
        n_written += 1
    return n_written


def _separate_tensor_parallel(cfg, variables, out_dir, mix_dir, mix_json,
                              sample_rate, write_mix, batch_size,
                              pad_to_multiple, n_model) -> int:
    """Model-parallel serving over a (data x model) mesh: batch rows pad
    up to a data-axis multiple (replicating the last row; extras are
    dropped on the host), the separator Megatron-splits over ``model``
    (``tp_forward``: TCN hidden dim / dual-path head groups with the
    fused partial kernels)."""
    from convtasnet_tpu.parallel.mesh import make_mesh
    from convtasnet_tpu.parallel.tensor_parallel import tp_forward

    mesh = make_mesh(n_data=-1, n_model=n_model)
    n_data = int(dict(mesh.shape)["data"])
    ds = EvalDataset(mix_dir=mix_dir, mix_json=mix_json,
                     batch_size=batch_size, sample_rate=sample_rate)
    os.makedirs(out_dir, exist_ok=True)

    # jit once: without this every batch would re-split/re-stack the
    # weights and re-trace the shard_map (a distinct [rows, T] shape still
    # retraces, as any jit does)
    run = jax.jit(lambda m: tp_forward(cfg, variables, m, mesh))
    n_written = 0
    for bi in range(len(ds)):
        mixture, lengths, names = ds.load_batch(
            bi, pad_to_multiple=pad_to_multiple)
        rows = mixture.shape[0]
        rows_p = -(-rows // n_data) * n_data
        if rows_p != rows:
            mixture = np.concatenate(
                [mixture, np.repeat(mixture[-1:], rows_p - rows, axis=0)],
                axis=0)
        est = np.asarray(jax.device_get(run(jnp.asarray(mixture))))[:rows]
        est_list = remove_pad(est, lengths)
        mix_list = remove_pad(mixture[:rows], lengths)
        for b, name in enumerate(names):
            stem = os.path.splitext(os.path.basename(name))[0]
            if write_mix:
                write_wav(os.path.join(out_dir, stem + ".wav"),
                          mix_list[b], sample_rate)
            for c in range(cfg.num_speakers):
                write_wav(os.path.join(out_dir, f"{stem}_s{c + 1}.wav"),
                          est_list[b][c], sample_rate)
            n_written += 1
    return n_written


def _separate_sequence_parallel(cfg, variables, out_dir, mix_dir, mix_json,
                                sample_rate, write_mix,
                                ring_attention: bool = False) -> int:
    """Arbitrarily-long mixtures: shard the time axis over all devices
    (``parallel/sharded_ops.py``) — memory per chip is T / n_devices, halo
    communication is O(1) in length."""
    import jax

    from convtasnet_tpu.parallel.mesh import make_mesh
    from convtasnet_tpu.parallel.sharded_ops import separate_sharded

    mesh = make_mesh(n_data=-1)
    ds = EvalDataset(mix_dir=mix_dir, mix_json=mix_json, batch_size=1,
                     sample_rate=sample_rate)
    os.makedirs(out_dir, exist_ok=True)
    n_written = 0
    for bi in range(len(ds)):
        mixture, lengths, names = ds.load_batch(bi)
        T = int(lengths[0])
        est = np.asarray(jax.device_get(
            separate_sharded(cfg, variables, jnp.asarray(mixture[0, :T]), mesh,
                             ring_attention=ring_attention)))
        stem = os.path.splitext(os.path.basename(names[0]))[0]
        if write_mix:
            write_wav(os.path.join(out_dir, stem + ".wav"),
                      mixture[0, :T], sample_rate)
        for c in range(cfg.num_speakers):
            write_wav(os.path.join(out_dir, f"{stem}_s{c + 1}.wav"),
                      est[c], sample_rate)
        n_written += 1
    return n_written
