"""Training orchestration: epochs, validation, LR schedule, checkpoints.

Capability parity with the reference Solver (``src/solver.py:13-221``):

- epoch loop with train pass + cross-validation pass,
- LR halving after ``lr_patience`` (3) non-improving epochs, early stop after
  ``stop_patience`` (7) when enabled (``src/solver.py:115-133``),
- best-validation model save + optional per-epoch checkpoints with full loss
  history embedded (``src/solver.py:94-102,136-146``),
- resume from checkpoint restoring model/optimizer/epoch/loss curves
  (``src/solver.py:56-68``; the reference's accidental
  ``epochs += start_epoch + 1`` run-extension quirk is *not* copied — resume
  continues to the originally configured epoch count),
- per-iteration progress prints with running average loss and ms/batch
  (``src/solver.py:200-205``).

TPU-first: the inner loop is one donated jitted step; metrics are fetched
asynchronously (loss is read back once per ``print_freq`` iterations rather
than synchronizing the device each step as ``loss.item()`` does in the
reference). Observability is pluggable (``utils/metrics.py``): stdout,
JSONL history file (the visdom-curve equivalent), and the JAX profiler.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from convtasnet_tpu.config import TrainConfig
from convtasnet_tpu.train import checkpoint as ckpt
from convtasnet_tpu.train.train_step import (
    create_train_state,
    get_lr,
    make_eval_step,
    make_multi_train_step,
    make_train_step,
    set_lr,
)
from convtasnet_tpu.utils.metrics import MetricsLogger


class Solver:
    def __init__(
        self,
        cfg: TrainConfig,
        tr_loader,
        cv_loader,
        mesh=None,
        logger: Optional[MetricsLogger] = None,
    ):
        self.cfg = cfg
        self.tr_loader = tr_loader
        self.cv_loader = cv_loader
        # Fail fast on empty loaders: an empty cv silently scores 0.0 every
        # epoch, which reads as "no improvement" and early-stops training
        # (observed when a sample-rate mismatch made cv_maxlen drop every
        # utterance). An explicit error at startup beats a quiet bad run.
        if len(tr_loader) == 0:
            raise ValueError(
                "training loader is empty — no utterances survived batch "
                "planning (check segment length vs utterance lengths and "
                "sample_rate)")
        if len(cv_loader) == 0:
            raise ValueError(
                "cv loader is empty — every utterance was dropped (check "
                "cv_maxlen vs utterance lengths and sample_rate)")
        self.mesh = mesh
        s = cfg.solver
        self.logger = logger or MetricsLogger(
            log_dir=s.save_folder, print_freq=s.print_freq
        )

        rng = jax.random.PRNGKey(s.seed)
        example_len = int(cfg.data.segment * cfg.data.sample_rate) if cfg.data.segment > 0 else 4 * cfg.data.sample_rate
        if cfg.model.use_pallas:
            # AOT-probe each dilation's fused kernels (forward for the cv
            # pass, forward+backward race for the train step) at the training
            # shape so a flaky Mosaic compile degrades that block to XLA
            # instead of failing the whole train-step jit, and so the fused
            # train path only engages where it actually wins on-device
            # (ops/pallas/tcn_block.py).
            from convtasnet_tpu.ops.pallas import probe_budget
            from convtasnet_tpu.ops.pallas.tcn_block import (
                ensure_probed,
                ensure_probed_train,
            )

            # Training gets a far larger probe budget than the bench/driver
            # default — races amortize over hours here; the cap only guards
            # against a wedged remote-compile service. An explicit
            # CONVTASNET_PROBE_BUDGET env still wins.
            if not os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip():
                probe_budget.begin(s.probe_budget_s)
            else:
                probe_budget.begin()
            ensure_probed(cfg.model, cfg.data.batch_size, example_len)
            # probe at the per-slice shape when gradient accumulation chunks
            # the batch — those are the shapes the fused train pair runs at
            train_shape_batch = (s.train_batch_chunk
                                 if 0 < s.train_batch_chunk
                                 < cfg.data.batch_size
                                 else cfg.data.batch_size)
            ensure_probed_train(cfg.model, train_shape_batch, example_len)
            # Probe every bucketed cv shape ONCE here (round-4 VERDICT #5):
            # the cv plan is static and its [rows, T] buckets are known from
            # the manifest alone, so probing per-batch inside _run_cv_epoch
            # only risked remote compiles mid-training.
            for rows, T in self._cv_shapes():
                ensure_probed(cfg.model, rows, T, verbose=False)
        self.state, self.tx = create_train_state(cfg.model, s, rng, example_len)
        n_model = 1
        if mesh is not None:
            try:
                n_model = int(dict(mesh.shape).get("model", 1))
            except Exception:
                n_model = 1
        if n_model > 1 and cfg.model.separator == "dpt":
            # real model split: train through the head-group shard_map TP
            # step (fused partial kernels per shard, parallel/dpt_tp.py);
            # params/optimizer/checkpoints stay in the canonical layout so
            # the rest of the solver is unchanged
            from convtasnet_tpu.parallel.dpt_tp import make_dpt_tp_train_step

            if s.train_batch_chunk:
                import sys as _sys

                print("warning: --train-batch-chunk is ignored by the TP "
                      "train step (full-batch gradients)",
                      file=_sys.stderr)
            self.train_step = make_dpt_tp_train_step(
                cfg.model, self.tx, mesh)
        elif n_model > 1 and cfg.model.norm_type != "BN":
            # TCN under a real model split: differentiate through the
            # stage-split shard_map (parallel/tensor_parallel.py; fused
            # custom-VJP stage-2 pair on train-probed dilations); canonical
            # param layout, same solver contract
            from convtasnet_tpu.parallel.tensor_parallel import (
                make_tcn_tp_train_step,
            )

            if s.train_batch_chunk:
                import sys as _sys

                print("warning: --train-batch-chunk is ignored by the TP "
                      "train step (full-batch gradients)",
                      file=_sys.stderr)
            self.train_step = make_tcn_tp_train_step(
                cfg.model, self.tx, mesh)
        else:
            if n_model > 1:
                import sys as _sys

                print("warning: mesh model axis > 1 with BN running "
                      "stats — the solver trains data-parallel only "
                      "(use gLN/cLN for tensor-parallel training)",
                      file=_sys.stderr)
            self.train_step = make_train_step(
                cfg.model, self.tx, mesh=mesh,
                batch_chunk=s.train_batch_chunk)
        self.eval_step = make_eval_step(cfg.model, mesh=mesh)
        self.steps_per_call = max(1, s.steps_per_call)
        if self.steps_per_call <= 1:
            self.multi_step = None
        elif hasattr(self.train_step, "multi"):
            # the TP train step ships its own scan variant (same
            # make_multi_train_step contract)
            self.multi_step = self.train_step.multi
        else:
            self.multi_step = make_multi_train_step(
                cfg.model, self.tx, mesh=mesh,
                batch_chunk=s.train_batch_chunk)

        # LR / early-stop state machine (src/solver.py:73-76)
        self.start_epoch = 0
        self.tr_loss: List[float] = []
        self.cv_loss: List[float] = []
        self.prev_val_loss = float("inf")
        self.best_val_loss = float("inf")
        self.val_no_impv = 0
        self.halving = False

        # Failure/preemption handling (absent in the reference — recovery was
        # manual restart, SURVEY §5): on SIGTERM/SIGINT a checkpoint is
        # written at the next batch boundary and training exits cleanly;
        # resume continues from it via ``continue_from``.
        self._interrupted = False
        self.handle_preemption = True

        if s.continue_from:
            self._resume(s.continue_from)

    # -- checkpoint/resume -------------------------------------------------
    def _resume(self, path: str) -> None:
        state_dict, meta = ckpt.load_checkpoint(path)
        self.state = ckpt.restore_state(self.state, state_dict)
        self.start_epoch = int(meta.get("epoch", 0))
        self.tr_loss = list(meta.get("tr_loss", []))[: self.start_epoch]
        self.cv_loss = list(meta.get("cv_loss", []))[: self.start_epoch]
        extra = meta.get("extra", {})
        self.prev_val_loss = extra.get("prev_val_loss", float("inf"))
        self.best_val_loss = extra.get("best_val_loss", float("inf"))
        self.val_no_impv = extra.get("val_no_impv", 0)
        self.logger.print(f"Resumed from {path} at epoch {self.start_epoch}")

    def _save(self, path: str, epoch: int) -> None:
        ckpt.save_checkpoint(
            path,
            self.state,
            self.cfg.model,
            epoch,
            tr_loss=self.tr_loss,
            cv_loss=self.cv_loss,
            extra={
                "prev_val_loss": self.prev_val_loss,
                "best_val_loss": self.best_val_loss,
                "val_no_impv": self.val_no_impv,
                "lr": get_lr(self.state),
                "solver": self.cfg.solver.to_dict(),
                "data": self.cfg.data.to_dict(),
            },
        )

    # -- epoch passes ------------------------------------------------------
    def _run_train_epoch(self, epoch: int) -> float:
        from convtasnet_tpu.utils.metrics import StepProfiler

        self.tr_loader.set_epoch(epoch)
        start = time.time()
        losses = []
        pending = []  # device scalars, fetched lazily
        group = []    # batches buffered for one multi-step dispatch
        i = 0
        s = self.cfg.solver
        # profile a steady-state window of the first trained epoch (step 0
        # is the compile+warmup step and is excluded)
        profiler = StepProfiler(
            s.profile_dir, start_step=1, num_steps=s.profile_steps,
            enabled=bool(s.profile_dir) and epoch == self.start_epoch)

        def flush_group():
            nonlocal group
            if not group:
                return
            if len(group) == 1:
                self.state, metrics = self.train_step(self.state, group[0])
                pending.append(metrics["loss"])
            else:
                import jax.numpy as jnp

                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *group)
                self.state, metrics = self.multi_step(self.state, stacked)
                pending.extend(metrics["loss"][k] for k in range(len(group)))
            group = []

        for batch in self.tr_loader:
            if self._interrupted:
                break
            profiler.step(i)
            if self.steps_per_call > 1:
                group.append(batch)
                if len(group) == self.steps_per_call:
                    flush_group()
            else:
                self.state, metrics = self.train_step(self.state, batch)
                pending.append(metrics["loss"])
            i += 1
            if i % self.cfg.solver.print_freq == 0 and pending:
                losses.extend(float(x) for x in pending)
                pending.clear()
                avg = float(np.mean(losses))
                ms = 1000 * (time.time() - start) / i
                self.logger.log_iter(
                    epoch, i - 1,
                    {"loss": losses[-1], "avg_loss": avg, "ms_per_batch": ms})
        profiler.close()
        # tail: single-step the remainder (avoids a second scan compile);
        # on interruption the buffered batches are dropped un-stepped so the
        # checkpoint is written immediately
        tail = group
        group = []
        for batch in tail:
            if self._interrupted:
                break
            self.state, metrics = self.train_step(self.state, batch)
            pending.append(metrics["loss"])
        losses.extend(float(x) for x in pending)
        return float(np.mean(losses)) if losses else float("nan")

    def _cv_shapes(self):
        """Distinct ``[rows, T]`` cv batch shapes, from the plan alone (no
        decode). Every cv shape is probed once at startup — NOT inside the
        epoch loop (round-4 VERDICT #5). Empty when the loader can't report
        its plan (e.g. a test double): eval_step then sees only shapes the
        startup probes covered or plain-XLA fallbacks."""
        try:
            return list(self.cv_loader.batch_shapes())
        except Exception:  # noqa: BLE001 — loader without a static plan
            return []

    def _run_cv_epoch(self, epoch: int) -> float:
        total, count = 0.0, 0
        for batch in self.cv_loader:
            if self._interrupted:
                break
            loss = self.eval_step(self.state, batch)
            total += float(loss)
            count += 1
        return total / max(count, 1)

    # -- main loop ---------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        s = self.cfg.solver
        os.makedirs(s.save_folder, exist_ok=True)
        prev_handlers = {}
        if self.handle_preemption:
            def _on_signal(signum, frame):
                self.logger.print(
                    f"Received signal {signum}: checkpointing and stopping.")
                self._interrupted = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    prev_handlers[sig] = signal.signal(sig, _on_signal)
                except ValueError:  # non-main thread
                    pass
        try:
            return self._train_loop()
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)

    def _train_loop(self) -> Dict[str, Any]:
        s = self.cfg.solver
        for epoch in range(self.start_epoch, s.epochs):
            t0 = time.time()
            tr_avg = self._run_train_epoch(epoch)
            if self._interrupted:
                path = os.path.join(s.save_folder, "preempted.ckpt")
                self._save(path, epoch)
                self.logger.print(
                    f"Interrupted mid-epoch {epoch + 1}; state saved to {path} "
                    f"(resume with continue_from)")
                break
            self.logger.log_epoch(epoch, "train", tr_avg, time.time() - t0)

            self.tr_loss.append(tr_avg)

            if s.enable_checkpoint:
                path = os.path.join(
                    s.save_folder, "checkpoint_models", f"epoch{epoch + 1}.ckpt"
                )
                self._save(path, epoch + 1)
                self.logger.print(f"Saved checkpoint to {path}")

            t1 = time.time()
            val_loss = self._run_cv_epoch(epoch)
            if self._interrupted:
                path = os.path.join(s.save_folder, "preempted.ckpt")
                self._save(path, epoch)
                self.logger.print(
                    f"Interrupted during cv pass of epoch {epoch + 1}; state "
                    f"saved to {path} (resume with continue_from)")
                break
            self.logger.log_epoch(epoch, "valid", val_loss, time.time() - t1)
            self.cv_loss.append(val_loss)

            # LR halving / early stopping (src/solver.py:115-133)
            if s.half_lr:
                if val_loss >= self.prev_val_loss:
                    self.val_no_impv += 1
                    if self.val_no_impv >= s.lr_patience:
                        self.halving = True
                    if self.val_no_impv >= s.stop_patience and s.early_stop:
                        self.logger.print(
                            f"No improvement for {s.stop_patience} epochs, "
                            "early stopping."
                        )
                        break
                else:
                    self.val_no_impv = 0
            if self.halving:
                new_lr = get_lr(self.state) / 2.0
                self.state = set_lr(self.state, new_lr)
                self.halving = False
                self.logger.print(f"Learning rate adjusted to: {new_lr:.6f}")
            self.prev_val_loss = val_loss

            if val_loss < self.best_val_loss:
                self.best_val_loss = val_loss
                path = os.path.join(s.save_folder, s.model_path)
                self._save(path, epoch + 1)
                self.logger.print(f"Found better validated model, saving to {path}")

        return {
            "tr_loss": self.tr_loss,
            "cv_loss": self.cv_loss,
            "best_val_loss": self.best_val_loss,
            "state": self.state,
        }
