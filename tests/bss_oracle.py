"""Direct (slow, obviously-correct) BSS-Eval v3 oracle.

Anchor for ``convtasnet_tpu/infer/bss_eval.py``: the production code solves
the projections via FFT correlations + block-Toeplitz normal equations; this
oracle builds the explicit delayed-source design matrix and calls
``np.linalg.lstsq`` — a line-by-line transcription of the decomposition in
Vincent, Gribonval & Fevotte, "Performance measurement in blind audio source
separation", IEEE TASLP 2006 (the definition behind
``mir_eval.bss_eval_sources``, which the reference uses at
``src/evaluate.py:76-91`` and which is not installed in this image).

O(C * (T * C * FLEN)^~2) — test-sized signals only.
"""

from __future__ import annotations

from itertools import permutations

import numpy as np


def _design_matrix(refs: np.ndarray, flen: int) -> np.ndarray:
    """[T + flen - 1, n * flen] matrix whose columns are every delay
    (0..flen-1) of every reference source."""
    n, T = refs.shape
    A = np.zeros((T + flen - 1, n * flen))
    for i in range(n):
        for tau in range(flen):
            A[tau:tau + T, i * flen + tau] = refs[i]
    return A


def _project_direct(refs: np.ndarray, est: np.ndarray, flen: int) -> np.ndarray:
    """lstsq projection of ``est`` (zero-padded) onto the span of delayed
    refs. Same contract as ``bss_eval._project``."""
    n, T = refs.shape
    A = _design_matrix(refs, flen)
    y = np.zeros(T + flen - 1)
    y[:T] = est
    h, *_ = np.linalg.lstsq(A, y, rcond=None)
    return A @ h


def bss_eval_sources_direct(reference_sources, estimated_sources, flen=512):
    """-> (sdr [C], sir [C], sar [C], perm [C]) — the oracle twin of
    ``convtasnet_tpu.infer.bss_eval.bss_eval_sources``."""
    refs = np.asarray(reference_sources, np.float64)
    ests = np.asarray(estimated_sources, np.float64)
    assert refs.shape == ests.shape
    C, T = refs.shape
    eps = np.finfo(np.float64).eps
    sdr = np.zeros((C, C))
    sir = np.zeros((C, C))
    sar = np.zeros((C, C))
    for i in range(C):
        p_all = _project_direct(refs, ests[i], flen)
        e_artif = np.zeros(T + flen - 1)
        e_artif[:T] = ests[i]
        e_artif = e_artif - p_all
        for j in range(C):
            s_target = _project_direct(refs[j:j + 1], ests[i], flen)
            e_interf = p_all - s_target

            def db(num, den):
                return 10.0 * np.log10(
                    (np.sum(num ** 2) + eps) / (np.sum(den ** 2) + eps))

            sdr[i, j] = db(s_target, e_interf + e_artif)
            sir[i, j] = db(s_target, e_interf)
            sar[i, j] = db(s_target + e_interf, e_artif)
    best = max(permutations(range(C)),
               key=lambda p: np.mean([sdr[p[j], j] for j in range(C)]))
    perm = np.array(best)
    j = np.arange(C)
    return sdr[perm, j], sir[perm, j], sar[perm, j], perm
