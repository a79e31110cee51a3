"""Observability: metrics logging, loss-curve history, and profiling.

The reference's observability is stdout prints + a visdom HTTP server for
live loss curves (``src/solver.py:45-52,148-166,200-218``). Here:

- stdout prints with the same information density (epoch summaries, periodic
  per-iter loss/avg/ms-per-batch),
- a JSONL history file (``<save_folder>/history.jsonl``) that any plotting
  front-end can tail — the visdom-curve equivalent without a server
  dependency,
- ``profile()`` context manager wrapping ``jax.profiler`` traces (the
  reference has no profiler at all, SURVEY §5 "Tracing/profiling: none").
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        print_freq: int = 10,
        quiet: bool = False,
    ):
        self.print_freq = print_freq
        self.quiet = quiet
        self.history_path = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.history_path = os.path.join(log_dir, "history.jsonl")

    def print(self, msg: str) -> None:
        if not self.quiet:
            print(msg, flush=True)

    def _append(self, record: Dict[str, Any]) -> None:
        if self.history_path:
            with open(self.history_path, "a") as f:
                f.write(json.dumps(record) + "\n")

    def log_iter(self, epoch: int, it: int, metrics: Dict[str, float]) -> None:
        self.print(
            "Epoch {0} | Iter {1} | Average Loss {2:.3f} | Current Loss {3:.6f} "
            "| {4:.1f} ms/batch".format(
                epoch + 1,
                it + 1,
                metrics.get("avg_loss", float("nan")),
                metrics.get("loss", float("nan")),
                metrics.get("ms_per_batch", float("nan")),
            )
        )
        self._append({"kind": "iter", "epoch": epoch, "iter": it, "t": time.time(), **metrics})

    def log_epoch(self, epoch: int, split: str, loss: float, seconds: float) -> None:
        name = "Train" if split == "train" else "Valid"
        self.print("-" * 85)
        self.print(
            f"{name} Summary | End of Epoch {epoch + 1} | "
            f"Time {seconds:.2f}s | {name} Loss {loss:.3f}"
        )
        self.print("-" * 85)
        self._append(
            {"kind": "epoch", "epoch": epoch, "split": split, "loss": loss,
             "seconds": seconds, "t": time.time()}
        )


@contextlib.contextmanager
def profile(log_dir: str, enabled: bool = True):
    """JAX profiler trace around a block; view with xprof/tensorboard.

    Relay caveat: when the device is reached through a tunneled backend
    (this image's `axon` relay), device-side trace collection is not
    plumbed — the trace contains host/runtime events only (dispatch, jit
    boundaries, transfers). On a directly-attached TPU the same flag yields
    full device traces.
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Trace a window of training steps: [start_step, start_step + num_steps).

    Used by the Solver's ``--profile DIR`` plumbing: step 0 (the compile +
    warmup step) is excluded by default so the trace shows steady-state
    steps, not one giant XLA build. Call ``step(i)`` with the 0-based step
    index before dispatching step ``i``; ``close()`` is safe to call
    unconditionally (stops an open trace, e.g. on early epoch end).
    See ``profile()`` for the relay host-only-trace caveat.
    """

    def __init__(self, log_dir: str, start_step: int = 1,
                 num_steps: int = 10, enabled: bool = True):
        self.log_dir = log_dir
        self.start_step = start_step
        self.end_step = start_step + num_steps
        self.enabled = enabled and bool(log_dir)
        self._active = False

    def step(self, i: int) -> None:
        if not self.enabled:
            return
        if not self._active and self.start_step <= i < self.end_step:
            import jax

            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and i >= self.end_step:
            self.close()
            self.enabled = False  # one window per epoch/run

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Wall-clock step timing with warmup discard — the per-step timing story
    the reference lacked (only whole-epoch deltas, ``src/solver.py:84-89``)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._last = None
        self._count = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
