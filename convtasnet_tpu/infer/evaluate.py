"""Evaluation: SI-SNRi (and optional SDRi) on a mixture/sources test set.

Capability parity with ``src/evaluate.py:21-130``: loads a self-describing
checkpoint, runs full-utterance batches, PIT-aligns the estimates, and
reports per-utterance and average SI-SNR improvement over the
mixture-as-estimate baseline; SDRi goes through our native BSS-Eval
(``bss_eval.py``) behind a flag since it is orders of magnitude slower than
the network itself (the reference notes the same, ``src/evaluate.py:79``).

TPU-first: the forward + PIT alignment runs jitted with time-padded batches
bucketed to a multiple (one compile per bucket, masked exact lengths); SI-SNR
improvements are computed on device, only scalars come back per batch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from convtasnet_tpu.data.dataset import SeparationDataset
from convtasnet_tpu.losses.pit import pit_si_snr, reorder_source
from convtasnet_tpu.models.conv_tasnet import ConvTasNet
from convtasnet_tpu.train.checkpoint import load_params_for_inference


def _maybe_enable_pallas(cfg, use_pallas: Optional[bool]):
    """Resolve the inference-time fused-kernel default: on for real
    accelerator backends, off on CPU (where the XLA path is what the tests
    pin down and interpret-mode Pallas is slower). Explicit True/False wins."""
    import dataclasses

    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas == cfg.use_pallas:
        return cfg
    return dataclasses.replace(cfg, use_pallas=use_pallas)


def _masked_sisnr_batch(est, src, mix, lengths):
    """Per-utt SI-SNRi on device: mean-over-speakers SI-SNR of the PIT-aligned
    estimates minus the mixture baseline (parity: ``cal_SISNRi``,
    ``src/evaluate.py:94-111``). Zero-mean/energies honor true lengths."""
    T = src.shape[-1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)

    def masked_sisnr(ref, est_sig):
        # ref/est: [B, T]; stats over true lengths only
        n = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
        ref = (ref - jnp.sum(ref * mask, -1, keepdims=True) / n) * mask
        est_sig = (est_sig - jnp.sum(est_sig * mask, -1, keepdims=True) / n) * mask
        proj = (jnp.sum(ref * est_sig, -1, keepdims=True) * ref
                / (jnp.sum(ref * ref, -1, keepdims=True) + 1e-8))
        noise = est_sig - proj
        return 10.0 * jnp.log10(
            (jnp.sum(proj ** 2, -1) + 1e-8) / (jnp.sum(noise ** 2, -1) + 1e-8))

    C = src.shape[1]
    sisnr_est = jnp.mean(
        jnp.stack([masked_sisnr(src[:, c], est[:, c]) for c in range(C)]), axis=0)
    sisnr_mix = jnp.mean(
        jnp.stack([masked_sisnr(src[:, c], mix) for c in range(C)]), axis=0)
    return sisnr_est - sisnr_mix, sisnr_est, sisnr_mix


def evaluate(
    model_path: str,
    data_dir: str,
    batch_size: int = 1,
    sample_rate: int = 8000,
    cal_sdr: bool = False,
    max_batches: Optional[int] = None,
    pad_to_multiple: int = 8000,
    verbose: bool = True,
    use_pallas: Optional[bool] = None,
    batch_chunk: int = 8,
) -> Dict[str, float]:
    """-> {"si_snri": avg dB, "sdri": avg dB (if cal_sdr)}.

    ``batch_chunk``: forward the batch in this many rows per ``lax.map``
    slice (0 disables) — VMEM-residency optimization, docs/RESULTS.md
    "Batch scaling".

    ``use_pallas=None`` (default) enables the fused TCN kernels automatically
    on a real accelerator backend: each batch shape is AOT-probed/autotuned
    first (``ensure_probed``), so unsupported dilations degrade to XLA
    instead of failing the jit.
    """
    cfg, variables = load_params_for_inference(model_path)
    cfg = _maybe_enable_pallas(cfg, use_pallas)
    model = ConvTasNet(cfg)
    ds = SeparationDataset(
        data_dir, batch_size, sample_rate, segment=-1.0,
        cv_maxlen=float("inf"), num_speakers=cfg.num_speakers)

    @jax.jit
    def run(mixture, sources, lengths):
        from convtasnet_tpu.models.conv_tasnet import apply_batch_chunked

        est = apply_batch_chunked(model, variables, mixture,
                                  chunk=batch_chunk, train=False)
        _, best_perm = pit_si_snr(sources, est, lengths)
        est = reorder_source(est, best_perm)
        si_snri, si_est, si_mix = _masked_sisnr_batch(est, sources, mixture, lengths)
        return est, si_snri

    total_sisnri, total_sdri, count = 0.0, 0.0, 0

    def _consume(est_dev, si_dev, batch):
        nonlocal total_sisnri, total_sdri, count
        si_snri = np.asarray(jax.device_get(si_dev))
        for b in range(len(si_snri)):
            count += 1
            total_sisnri += float(si_snri[b])
            if verbose:
                print(f"Utt {count}: SI-SNRi {float(si_snri[b]):.2f} dB", flush=True)
            if cal_sdr:
                from convtasnet_tpu.infer.bss_eval import bss_eval_sources

                n = int(batch.lengths[b])
                src_np = batch.sources[b, :, :n]
                mix_np = batch.mixture[b, :n]
                est_np = np.asarray(est_dev[b])[:, :n]
                sdr, _, _, _ = bss_eval_sources(src_np, est_np)
                sdr_mix, _, _, _ = bss_eval_sources(
                    src_np, np.tile(mix_np, (cfg.num_speakers, 1)),
                    compute_permutation=False)
                sdri = float(np.mean(sdr - sdr_mix))
                total_sdri += sdri
                if verbose:
                    print(f"Utt {count}: SDRi {sdri:.2f} dB", flush=True)

    # one-deep pipeline: dispatch batch i+1 before collecting batch i so
    # host-side work (decode; BSS-Eval under --cal-sdr, which dominates)
    # overlaps device compute and the device link's RTT
    n_batches = len(ds) if max_batches is None else min(len(ds), max_batches)
    pending = None
    for bi in range(n_batches):
        batch = ds.load_batch(bi, pad_to_multiple=pad_to_multiple)
        if cfg.use_pallas:
            from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed

            rows = batch.mixture.shape[0]
            if batch_chunk > 0 and rows > batch_chunk \
                    and rows % batch_chunk == 0:
                rows = batch_chunk  # the per-lax.map-slice shape is probed
            ensure_probed(cfg, rows, batch.mixture.shape[1])
        est, si_snri = run(
            jnp.asarray(batch.mixture), jnp.asarray(batch.sources),
            jnp.asarray(batch.lengths))
        if pending is not None:
            _consume(*pending)
        pending = (est, si_snri, batch)
    if pending is not None:
        _consume(*pending)
    result = {"si_snri": total_sisnri / max(count, 1)}
    if cal_sdr:
        result["sdri"] = total_sdri / max(count, 1)
    if verbose:
        print(f"Average SI-SNRi: {result['si_snri']:.2f} dB")
        if cal_sdr:
            print(f"Average SDRi: {result['sdri']:.2f} dB")
    return result
