"""Typed configuration for the whole framework.

The reference had three skewed config mechanisms (bash flags in
``egs/wsj0/run.sh:20-73``, hardcoded python in ``src/train.py:16-61``, and
hyperparams embedded in checkpoints ``src/conv_tasnet.py:78-94``). Here a
single set of dataclasses serves the CLI, the library API, and checkpoint
metadata; every config round-trips through plain dicts / JSON.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


def _fromdict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})


@dataclass(frozen=True)
class ConvTasNetConfig:
    """Model hyperparameters.

    Mirrors the knobs of the reference model (``src/conv_tasnet.py:14-35``):
    N/L/B/H/P/X/R/C, norm_type in {gLN, cLN, BN}, causal flag, mask
    nonlinearity in {relu, softmax}. Defaults are the paper config used by the
    reference (``src/train.py:25-34``).
    """

    n_filters: int = 256        # N: autoencoder basis size
    kernel_size: int = 20       # L: encoder filter length in samples
    bottleneck: int = 256       # B: bottleneck channels
    hidden: int = 512           # H: conv block channels
    conv_kernel: int = 3        # P: depthwise conv kernel size
    num_blocks: int = 8         # X: blocks per repeat (dilation 2**0..2**(X-1))
    num_repeats: int = 4        # R: repeats
    num_speakers: int = 2       # C
    norm_type: str = "gLN"      # gLN | cLN | BN
    causal: bool = False
    mask_nonlinear: str = "relu"  # relu | softmax
    sample_rate: int = 8000
    # Separator family: "tcn" is the reference architecture; "dpt" is the
    # dual-path attention separator (models/dual_path.py — no reference
    # equivalent; SepFormer/DPRNN family, MXU-native). The dpt_* knobs only
    # apply to "dpt".
    separator: str = "tcn"      # tcn | dpt
    dpt_chunk: int = 128        # intra-chunk segment length (frames)
    dpt_layers: int = 4         # dual-path layer pairs
    # Attention heads for the dual-path layers. 0 (default) = auto:
    # head-dim 32, i.e. heads = bottleneck // 32 — the measured quality
    # sweet spot at BOTH gate scales (B=128: 4 heads +11.3 dB vs 8 heads
    # +11.0; B=256: 8 heads +19.0 dB vs 4 heads +16.0 — docs/RESULTS.md
    # "Second separator family"). Set explicitly to trade quality for
    # speed: at B=256, 4 heads (head-dim 64) measures ~2x faster than 8
    # (deeper MXU contraction) at a ~3 dB at-scale quality cost.
    dpt_heads: int = 0
    dpt_ff: int = 1024          # FFN hidden width
    # TPU-specific knobs (no reference equivalent):
    compute_dtype: str = "float32"  # bfloat16 for MXU-friendly training
    param_dtype: str = "float32"
    use_pallas: bool = False        # fused Pallas TCN kernels on the hot path
    remat: bool = False             # rematerialize TCN blocks in the backward
                                    # pass (trade FLOPs for HBM on long inputs)

    @property
    def stride(self) -> int:
        return self.kernel_size // 2

    @property
    def dpt_num_heads(self) -> int:
        """Resolved head count: explicit ``dpt_heads``, else head-dim 32."""
        return self.dpt_heads or max(1, self.bottleneck // 32)

    def receptive_field(self) -> int:
        """Receptive field of the TCN in encoder frames."""
        per_repeat = sum((self.conv_kernel - 1) * 2 ** x for x in range(self.num_blocks))
        return 1 + self.num_repeats * per_repeat

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "ConvTasNetConfig":
        return _fromdict(cls, d)


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline configuration (parity: ``src/data.py:34``, ``src/train.py:20-24``)."""

    train_dir: str = ""
    valid_dir: str = ""
    sample_rate: int = 8000
    segment: float = 4.0        # seconds; <0 => full utterances
    cv_maxlen: float = 8.0      # seconds; skip longer cv utts
    # "fixed" (skip one over-long utt at a time) or "reference" (skip the
    # whole batch_size window like src/data.py:124-128 — for parity runs)
    cv_skip_semantics: str = "fixed"
    batch_size: int = 3         # segments per minibatch
    max_hours: Optional[float] = None
    shuffle: bool = True
    num_workers: int = 4
    # Decode-once memmapped cache of planned train batches: epoch 0 fills,
    # epochs >=1 stream slices with zero decode (data/segment_cache.py).
    # CONVTASNET_SEGMENT_CACHE=0 force-disables regardless of this flag.
    segment_cache: bool = True

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "DataConfig":
        return _fromdict(cls, d)


@dataclass(frozen=True)
class SolverConfig:
    """Training-loop configuration (parity: ``src/solver.py:15-54``, ``src/train.py:36-58``)."""

    epochs: int = 30
    optimizer: str = "adam"     # adam | sgd
    lr: float = 1e-3
    momentum: float = 0.0       # sgd only
    l2: float = 0.0             # weight decay
    max_grad_norm: float = 5.0
    half_lr: bool = True        # halve LR after `lr_patience` non-improving epochs
    lr_patience: int = 3
    early_stop: bool = True
    stop_patience: int = 7
    save_folder: str = "exp/temp"
    enable_checkpoint: bool = False   # per-epoch checkpoints
    model_path: str = "final.ckpt"    # best-model filename inside save_folder
    continue_from: str = ""
    print_freq: int = 10
    seed: int = 0
    steps_per_call: int = 1   # optimizer steps per device dispatch (lax.scan)
    # Gradient accumulation over this many batch rows per slice inside the
    # step (0 = full batch). Same numbers, VMEM-friendlier schedule
    # (train/train_step._loss_and_grads); no effect on BN configs.
    train_batch_chunk: int = 0
    # JAX profiler: trace `profile_steps` steady-state steps of the first
    # epoch into `profile_dir` (empty = off). SURVEY §5 tracing subsystem.
    profile_dir: str = ""
    profile_steps: int = 10
    # Wall-clock cap on the startup autotune probe chain (seconds; 0 =
    # unlimited). Training amortizes the races over hours, so its default
    # is far above the bench/driver default (ops/pallas/probe_budget):
    # the cap only exists so a wedged remote-compile service can't hang
    # startup forever. CONVTASNET_PROBE_BUDGET overrides when set.
    probe_budget_s: float = 3600.0

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "SolverConfig":
        return _fromdict(cls, d)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism configuration (TPU-native; reference had only
    single-process ``nn.DataParallel``, ``src/train.py:83-85``)."""

    data_axis: int = -1   # -1 => all devices on the data axis
    model_axis: int = 1   # optional channel-sharded TP axis
    axis_names: tuple = ("data", "model")

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "MeshConfig":
        d = dict(d)
        if "axis_names" in d:
            d["axis_names"] = tuple(d["axis_names"])
        return _fromdict(cls, d)


@dataclass(frozen=True)
class TrainConfig:
    """Top-level bundle: model + data + solver + mesh."""

    model: ConvTasNetConfig = field(default_factory=ConvTasNetConfig)
    data: DataConfig = field(default_factory=DataConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def to_dict(self) -> dict:
        return {
            "model": self.model.to_dict(),
            "data": self.data.to_dict(),
            "solver": self.solver.to_dict(),
            "mesh": self.mesh.to_dict(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        return cls(
            model=ConvTasNetConfig.from_dict(d.get("model", {})),
            data=DataConfig.from_dict(d.get("data", {})),
            solver=SolverConfig.from_dict(d.get("solver", {})),
            mesh=MeshConfig.from_dict(d.get("mesh", {})),
        )

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        return cls.from_dict(json.loads(s))


def exp_name(cfg: TrainConfig) -> str:
    """Auto-derived experiment directory name encoding the full config.

    Parity with ``egs/wsj0/run.sh:103-107`` which bakes every hyperparameter
    into the exp dir name.
    """
    m, d, s = cfg.model, cfg.data, cfg.solver
    return (
        f"train_r{d.sample_rate}_seg{d.segment}_bs{d.batch_size}"
        f"_N{m.n_filters}_L{m.kernel_size}_B{m.bottleneck}_H{m.hidden}"
        f"_P{m.conv_kernel}_X{m.num_blocks}_R{m.num_repeats}_C{m.num_speakers}"
        f"_{m.norm_type}_causal{int(m.causal)}_{m.mask_nonlinear}"
        + ("" if m.separator == "tcn" else f"_{m.separator}")
        + f"_ep{s.epochs}_{s.optimizer}_lr{s.lr}_gn{s.max_grad_norm}"
    )
