"""Padding utilities (parity: ``remove_pad``, ``src/utils.py:50-67``)."""

from __future__ import annotations

from typing import List

import numpy as np


def remove_pad(inputs, lengths) -> List[np.ndarray]:
    """Strip per-utterance padding.

    Args:
        inputs: [B, C, T] or [B, T] array (device or host).
        lengths: [B] true sample counts.

    Returns:
        list of B numpy arrays, [C, T_b] or [T_b].
    """
    inputs = np.asarray(inputs)
    lengths = np.asarray(lengths)
    out = []
    for row, n in zip(inputs, lengths):
        out.append(row[..., : int(n)].copy())
    return out
