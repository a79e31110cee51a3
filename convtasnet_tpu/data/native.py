"""ctypes bindings for the native (C++) audio data path.

Loads ``native/libwavio.so`` (built by ``make -C native``) and exposes
batch WAV decode with a thread pool plus the segment-plan helper. Every
entry point has a pure-numpy fallback (``data/audio_io.py``) so the
framework works without the native build; when present, the native decoder
feeds the training loader's hot path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def build_native(quiet: bool = True) -> bool:
    """Compile libwavio.so in-tree. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _native_dir()],
            check=True,
            capture_output=quiet)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library(build_if_missing: bool = True):
    """-> ctypes lib or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_native_dir(), "libwavio.so")
    if not os.path.exists(so) and build_if_missing:
        build_native()
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.wav_num_frames.restype = ctypes.c_int64
    lib.wav_num_frames.argtypes = [ctypes.c_char_p]
    lib.wav_sample_rate.restype = ctypes.c_int
    lib.wav_sample_rate.argtypes = [ctypes.c_char_p]
    lib.wav_decode.restype = ctypes.c_int64
    lib.wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.wav_decode_batch.restype = None
    lib.wav_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int]
    lib.segment_plan.restype = ctypes.c_int64
    lib.segment_plan.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    try:  # shorten decoder (absent in pre-existing builds of the .so)
        lib.shorten_probe.restype = ctypes.c_int64
        lib.shorten_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.shorten_decode.restype = ctypes.c_int64
        lib.shorten_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    except AttributeError:
        pass
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def decode_batch(
    paths: Sequence[str], max_frames: int, num_threads: int = 4
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode files into a dense [n, max_frames] float32 array (zero-padded).

    Returns (audio, lengths). Falls back to the numpy codec when the native
    library is unavailable or a file needs resampling-free decode only —
    native path decodes at the file's own sample rate.
    """
    lib = load_library()
    n = len(paths)
    out = np.zeros((n, max_frames), np.float32)
    lengths = np.zeros((n,), np.int64)
    if lib is None:
        from convtasnet_tpu.data.audio_io import read_wav

        for i, p in enumerate(paths):
            x, _ = read_wav(p)
            ln = min(len(x), max_frames)
            out[i, :ln] = x[:ln]
            lengths[i] = ln
        return out, lengths
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.wav_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_frames, num_threads)
    if np.any(lengths < 0):
        bad = [paths[i] for i in np.nonzero(lengths < 0)[0]]
        raise IOError(f"native wav decode failed for: {bad[:3]}")
    return out, lengths


def shorten_decode(data: bytes, max_samples: int
                   ) -> Optional[Tuple[np.ndarray, int]]:
    """Native Shorten v2 decode: -> (samples [n, nchan] int32, ftype), or
    None when the native library is unavailable (callers fall back to the
    pure-Python decoder, ``data/shorten.py``). Raises ValueError on a
    corrupt/unsupported stream (same contract as the Python decoder)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "shorten_decode"):
        return None
    nchan = ctypes.c_int32(0)
    ftype = ctypes.c_int32(0)
    rc = lib.shorten_probe(data, len(data), ctypes.byref(nchan),
                           ctypes.byref(ftype))
    if rc != 0:
        # bad magic / unsupported feature / corrupt header: let the Python
        # decoder produce its canonical error (or handle what it can)
        return None
    out = np.empty((max_samples, nchan.value), np.int32)
    n = lib.shorten_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_samples, ctypes.byref(nchan), ctypes.byref(ftype))
    if n == -3:
        raise EOFError("shorten bitstream exhausted")
    if n < 0:
        raise ValueError(f"shorten: corrupt stream (native rc={n})")
    return out[:n], int(ftype.value)


def num_frames(path: str) -> Optional[int]:
    lib = load_library()
    if lib is None:
        return None
    n = lib.wav_num_frames(path.encode())
    return None if n < 0 else int(n)


def segment_starts(length: int, segment_len: int, batch_size: int) -> List[int]:
    """Reference segment slicing offsets (native or python)."""
    lib = load_library()
    if lib is not None:
        buf = (ctypes.c_int64 * (batch_size + 2))()
        n = lib.segment_plan(length, segment_len, batch_size, buf, batch_size + 2)
        return [int(buf[i]) for i in range(n)]
    starts = []
    if length < segment_len:
        return starts
    max_index = min(length - segment_len + 1, (batch_size - 1) * segment_len + 1)
    starts = list(range(0, max_index, segment_len))
    if length % segment_len != 0 and length < batch_size * segment_len:
        starts.append(length - segment_len)
    return starts
