"""Command-line interface: the recipe pipeline as subcommands.

Replaces the reference's three skewed config surfaces (bash
``egs/wsj0/run.sh`` + Kaldi ``parse_options.sh``, hardcoded
``src/train.py:16-61``, and the disabled argparse ``src/train.py:105-109``)
with one typed-config CLI. Stage map vs ``egs/wsj0/run.sh:78-176``:

===========  ===============================================================
stage 0      ``prepare``  — generate mixture corpus from a pair list
             (Python port of the MATLAB generator; sphere conversion is
             upstream of this framework)
stage 1      ``preprocess`` — build JSON manifests from the wav tree
stage 2      ``train``
stage 3      ``evaluate``  — SI-SNRi (+ SDRi with --cal-sdr)
stage 4      ``separate``  — write separated wavs
``recipe``   runs stages 1..4 with --stage/--stop-stage gating, exp dir
             auto-named from the full config (parity: run.sh:103-107)
===========  ===============================================================

Every hyperparameter of the reference recipe is exposed as a flag; flags are
converted into the typed ``TrainConfig`` and stored in checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from convtasnet_tpu.config import (
    ConvTasNetConfig,
    DataConfig,
    MeshConfig,
    SolverConfig,
    TrainConfig,
    exp_name,
)


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("model")
    g.add_argument("--N", type=int, default=256, help="filters in autoencoder")
    g.add_argument("--L", type=int, default=20, help="filter length (samples)")
    g.add_argument("--B", type=int, default=256, help="bottleneck channels")
    g.add_argument("--H", type=int, default=512, help="conv block channels")
    g.add_argument("--P", type=int, default=3, help="dw conv kernel size")
    g.add_argument("--X", type=int, default=8, help="blocks per repeat")
    g.add_argument("--R", type=int, default=4, help="repeats")
    g.add_argument("--C", type=int, default=2, help="speakers")
    g.add_argument("--norm-type", default="gLN", choices=["gLN", "cLN", "BN"])
    g.add_argument("--causal", type=int, default=0)
    g.add_argument("--mask-nonlinear", default="relu", choices=["relu", "softmax"])
    g.add_argument("--separator", default="tcn", choices=["tcn", "dpt"],
                   help="separator family: reference TCN or dual-path "
                        "attention (models/dual_path.py)")
    g.add_argument("--dpt-chunk", type=int, default=128)
    g.add_argument("--dpt-layers", type=int, default=4)
    g.add_argument("--dpt-heads", type=int, default=0,
                   help="0 = auto (head-dim 32, the measured quality sweet "
                        "spot at both gate scales); 4 at B=256 is ~2x faster "
                        "at a ~3 dB at-scale cost — see docs/RESULTS.md")
    g.add_argument("--dpt-ff", type=int, default=1024)
    # Default follows ConvTasNetConfig so CLI- and library-trained models use
    # identical precision (f32, like the reference). Pass bfloat16 to trade
    # exact parity for TPU MXU throughput.
    g.add_argument("--compute-dtype",
                   default=ConvTasNetConfig.compute_dtype,
                   choices=["float32", "bfloat16"])
    g.add_argument("--use-pallas", type=int, default=-1, choices=[-1, 0, 1],
                   help="fused TCN kernels for training: -1 auto (on for "
                        "real accelerators; per-dilation probe races the "
                        "fused fwd+bwd against XLA autodiff and keeps the "
                        "winner), 0 off, 1 on")


def _add_data_flags(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("data")
    g.add_argument("--sample-rate", type=int, default=8000)
    g.add_argument("--segment", type=float, default=4.0)
    g.add_argument("--cv-maxlen", type=float, default=8.0)
    g.add_argument("--cv-skip-semantics", default="fixed",
                   choices=["fixed", "reference"],
                   help="over-long cv utterance handling: 'fixed' skips one "
                        "utt at a time; 'reference' reproduces the "
                        "reference's whole-window skip (src/data.py:124-128) "
                        "for licensed-data parity runs")
    g.add_argument("--batch-size", type=int, default=3)
    g.add_argument("--max-hours", type=float, default=None)
    g.add_argument("--num-workers", type=int, default=4)
    g.add_argument("--shuffle", type=int, default=1)
    g.add_argument("--segment-cache", type=int, default=1,
                   help="decode-once memmapped cache of planned train "
                        "batches (epoch 0 fills, later epochs stream with "
                        "zero decode); 0 re-decodes every epoch")


def _add_solver_flags(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("solver")
    g.add_argument("--epochs", type=int, default=30)
    g.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    g.add_argument("--lr", type=float, default=1e-3)
    g.add_argument("--momentum", type=float, default=0.0)
    g.add_argument("--l2", type=float, default=0.0)
    g.add_argument("--max-norm", type=float, default=5.0)
    g.add_argument("--half-lr", type=int, default=1)
    g.add_argument("--early-stop", type=int, default=1)
    g.add_argument("--save-folder", default="exp/temp")
    g.add_argument("--enable-checkpoint", type=int, default=0)
    g.add_argument("--model-path", default="final.ckpt")
    g.add_argument("--continue-from", default="")
    g.add_argument("--print-freq", type=int, default=10)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps per device dispatch (lax.scan)")
    g.add_argument("--train-batch-chunk", type=int, default=0,
                   help="accumulate gradients over this many batch rows per "
                        "slice inside the step (0 = full batch; same "
                        "numbers, VMEM-friendlier schedule)")
    g.add_argument("--profile", default="", metavar="DIR",
                   help="write a JAX profiler trace of the first epoch's "
                        "steady-state steps to DIR (view with "
                        "xprof/tensorboard; through a tunneled backend the "
                        "trace is host-side only)")
    g.add_argument("--profile-steps", type=int, default=10,
                   help="steps to trace with --profile")
    g.add_argument("--n-data", type=int, default=-1,
                   help="devices on the data-parallel mesh axis (-1 = all)")
    g.add_argument("--n-model", type=int, default=1,
                   help="devices on the model-parallel mesh axis; the "
                        "solver trains through the explicit shard_map TP "
                        "step — dpt: head-group split with fused kernels "
                        "per shard (parallel/dpt_tp.py); tcn gLN/cLN: "
                        "hidden-dim split with the fused stage-2 pair "
                        "(parallel/tensor_parallel.py)")


def _cfg_from_args(a: argparse.Namespace) -> TrainConfig:
    import jax

    return TrainConfig(
        model=ConvTasNetConfig(
            n_filters=a.N, kernel_size=a.L, bottleneck=a.B, hidden=a.H,
            conv_kernel=a.P, num_blocks=a.X, num_repeats=a.R,
            num_speakers=a.C, norm_type=a.norm_type, causal=bool(a.causal),
            mask_nonlinear=a.mask_nonlinear, sample_rate=a.sample_rate,
            separator=a.separator, dpt_chunk=a.dpt_chunk,
            dpt_layers=a.dpt_layers, dpt_heads=a.dpt_heads,
            dpt_ff=a.dpt_ff,
            compute_dtype=a.compute_dtype,
            use_pallas=(jax.default_backend() != "cpu"
                        if a.use_pallas < 0 else bool(a.use_pallas))),
        data=DataConfig(
            train_dir=getattr(a, "train_dir", ""),
            valid_dir=getattr(a, "valid_dir", ""),
            sample_rate=a.sample_rate, segment=a.segment,
            cv_maxlen=a.cv_maxlen,
            cv_skip_semantics=getattr(a, "cv_skip_semantics", "fixed"),
            batch_size=a.batch_size,
            max_hours=a.max_hours, shuffle=bool(a.shuffle),
            num_workers=a.num_workers,
            segment_cache=bool(getattr(a, "segment_cache", 1))),
        solver=SolverConfig(
            epochs=a.epochs, optimizer=a.optimizer, lr=a.lr,
            momentum=a.momentum, l2=a.l2, max_grad_norm=a.max_norm,
            half_lr=bool(a.half_lr), early_stop=bool(a.early_stop),
            save_folder=a.save_folder,
            enable_checkpoint=bool(a.enable_checkpoint),
            model_path=a.model_path, continue_from=a.continue_from,
            print_freq=a.print_freq, seed=a.seed,
            steps_per_call=getattr(a, "steps_per_call", 1),
            train_batch_chunk=getattr(a, "train_batch_chunk", 0),
            profile_dir=getattr(a, "profile", "") or "",
            profile_steps=getattr(a, "profile_steps", 10)),
        mesh=MeshConfig(data_axis=a.n_data,
                        model_axis=getattr(a, "n_model", 1)),
    )


def cmd_prepare(a) -> int:
    from convtasnet_tpu.tools.mixture import (
        create_mixtures,
        create_mixtures_multi,
        read_pair_list,
    )

    if getattr(a, "wsj0_root", ""):
        # one-command stage 0: raw sphere disc tree + MERL lists ->
        # wav{8,16}k/{min,max}/{tr,cv,tt} trees (data_prepare.sh +
        # create_wav_2speakers.m in one step, no sph2pipe/MATLAB)
        from convtasnet_tpu.tools.wsj0 import prepare_wsj0

        if not a.lists_dir:
            print("--wsj0-root requires --lists-dir "
                  "(the MERL mix_2_spk_{tr,cv,tt}.txt directory)",
                  file=sys.stderr)
            return 2
        summary = prepare_wsj0(
            a.wsj0_root, a.lists_dir, a.out_dir,
            num_speakers=getattr(a, "C", 2))
        total = sum(summary.values())
        print(f"wsj0 stage 0 complete: {total} mixtures "
              f"({', '.join(f'{k}={v}' for k, v in summary.items())}) "
              f"x 4 variants in {a.out_dir}")
        return 0
    if not a.pair_list:
        print("either --pair-list or --wsj0-root is required",
              file=sys.stderr)
        return 2
    rows = read_pair_list(a.pair_list)
    if getattr(a, "all_variants", 0):
        # 8k+16k x min+max in one pass (create_wav_2speakers.m:157-181)
        names = create_mixtures_multi(rows, a.out_dir,
                                      source_root=a.source_root)
        print(f"generated {len(names)} mixtures x 4 variants "
              f"(wav8k/wav16k x min/max) in {a.out_dir}")
    else:
        names = create_mixtures(rows, a.out_dir, a.sample_rate, mode=a.mode,
                                source_root=a.source_root)
        print(f"generated {len(names)} mixtures in {a.out_dir}")
    return 0


def cmd_preprocess(a) -> int:
    from convtasnet_tpu.data.manifest import build_manifests

    build_manifests(a.data_dir, a.out_dir, a.sample_rate,
                    num_speakers=a.C)
    print(f"manifests written to {a.out_dir}")
    return 0


def cmd_train(a) -> int:
    import jax

    from convtasnet_tpu.data.dataset import SeparationDataset
    from convtasnet_tpu.data.loader import BatchLoader
    from convtasnet_tpu.parallel.mesh import batch_sharding, make_mesh
    from convtasnet_tpu.train.solver import Solver

    cfg = _cfg_from_args(a)
    if a.auto_exp_name:
        cfg = TrainConfig(
            model=cfg.model, data=cfg.data, mesh=cfg.mesh,
            solver=SolverConfig(**{**cfg.solver.to_dict(),
                                   "save_folder": os.path.join(
                                       a.save_folder, exp_name(cfg))}))
    mesh = None
    sharding = None
    n_shards = 1
    if len(jax.devices()) > 1:
        mesh = make_mesh(n_data=cfg.mesh.data_axis,
                         n_model=max(1, cfg.mesh.model_axis))
        sharding = batch_sharding(mesh)
        n_shards = mesh.shape["data"]

    tr_ds = SeparationDataset(
        a.train_dir, cfg.data.batch_size, cfg.data.sample_rate,
        segment=cfg.data.segment, max_hours=cfg.data.max_hours,
        num_speakers=cfg.model.num_speakers, pad_rows_to_multiple=n_shards)
    cv_ds = SeparationDataset(
        a.valid_dir, 1, cfg.data.sample_rate, segment=-1.0,
        cv_maxlen=cfg.data.cv_maxlen, num_speakers=cfg.model.num_speakers,
        pad_rows_to_multiple=n_shards,
        cv_skip_semantics=cfg.data.cv_skip_semantics)
    from convtasnet_tpu.data.segment_cache import maybe_cache

    tr = BatchLoader(maybe_cache(tr_ds, enable=cfg.data.segment_cache),
                     shuffle=cfg.data.shuffle, sharding=sharding,
                     num_workers=cfg.data.num_workers, seed=cfg.solver.seed)
    cv = BatchLoader(cv_ds, sharding=sharding,
                     num_workers=cfg.data.num_workers,
                     pad_to_multiple=cfg.data.sample_rate)
    os.makedirs(cfg.solver.save_folder, exist_ok=True)
    with open(os.path.join(cfg.solver.save_folder, "config.json"), "w") as f:
        f.write(cfg.to_json())
    result = Solver(cfg, tr, cv, mesh=mesh).train()
    print(f"best cv loss: {result['best_val_loss']:.3f}")
    # Let callers (cmd_recipe) find the exp dir this run actually used
    # instead of walking for the newest checkpoint afterwards.
    a.resolved_save_folder = cfg.solver.save_folder
    return 0


def cmd_evaluate(a) -> int:
    from convtasnet_tpu.infer.evaluate import evaluate

    up = getattr(a, "use_pallas", -1)
    res = evaluate(a.model_path, a.data_dir, batch_size=a.batch_size,
                   sample_rate=a.sample_rate, cal_sdr=bool(a.cal_sdr),
                   max_batches=getattr(a, "max_batches", None),
                   use_pallas=None if up < 0 else bool(up),
                   batch_chunk=getattr(a, "batch_chunk", 8))
    print(json.dumps(res))
    return 0


def cmd_separate(a) -> int:
    from convtasnet_tpu.infer.separate import separate

    up = getattr(a, "use_pallas", -1)
    n = separate(a.model_path, a.out_dir, mix_dir=a.mix_dir,
                 mix_json=a.mix_json, batch_size=a.batch_size,
                 sample_rate=a.sample_rate,
                 streaming=bool(getattr(a, "streaming", 0)),
                 chunk_seconds=getattr(a, "chunk_seconds", 0.5),
                 sequence_parallel=bool(getattr(a, "sequence_parallel", 0)),
                 ring_attention=bool(getattr(a, "ring_attention", 0)),
                 use_pallas=None if up < 0 else bool(up),
                 batch_chunk=getattr(a, "batch_chunk", 8),
                 tensor_parallel=getattr(a, "tensor_parallel", 0))
    print(f"separated {n} utterances into {a.out_dir}")
    return 0


def cmd_stream_demo(a) -> int:
    from convtasnet_tpu.infer.stream_demo import stream_demo

    stats = stream_demo(a.model_path, a.wav, a.chunk_ms, a.out_dir,
                        realtime=bool(a.realtime))
    print(json.dumps(stats))
    return 0


def cmd_export_torch(a) -> int:
    from convtasnet_tpu.models.torch_import import export_to_torch

    export_to_torch(a.ckpt_path, a.out_path)
    print(f"exported {a.ckpt_path} -> {a.out_path}")
    return 0


def cmd_import_torch(a) -> int:
    from convtasnet_tpu.models.torch_import import import_to_checkpoint

    cfg = import_to_checkpoint(a.torch_path, a.out_path)
    print(f"imported {a.torch_path} -> {a.out_path} ({cfg.to_dict()})")
    return 0


def cmd_recipe(a) -> int:
    """Stages 1..4 with --stage/--stop-stage gating (run.sh parity)."""
    data_json = os.path.join(a.work_dir, "json")
    exp_dir = os.path.join(a.work_dir, "exp")
    if a.stage <= 1 <= a.stop_stage:
        ns = argparse.Namespace(**vars(a))
        ns.out_dir = data_json
        cmd_preprocess(ns)
    model = None
    if a.stage <= 2 <= a.stop_stage:
        ns = argparse.Namespace(**vars(a))
        ns.train_dir = os.path.join(data_json, "tr")
        ns.valid_dir = os.path.join(data_json, "cv")
        ns.save_folder = exp_dir
        ns.auto_exp_name = True
        cmd_train(ns)
        model = os.path.join(ns.resolved_save_folder, a.model_path)
    if model is None and a.stop_stage >= 3 and a.stage >= 3:
        # Standalone stage 3/4 on a previous run: find the newest checkpoint
        # under the exp dir (training writes into auto-named subdirs).
        cands = []
        for root, _, files in os.walk(exp_dir):
            if a.model_path in files:
                cands.append(os.path.join(root, a.model_path))
        if not cands:
            print(f"error: no {a.model_path} found under {exp_dir}; "
                  "run stage 2 first or pass --model-path",
                  file=sys.stderr)
            return 1
        model = max(cands, key=os.path.getmtime)
    if a.stage <= 3 <= a.stop_stage:
        ns = argparse.Namespace(
            model_path=model, data_dir=os.path.join(data_json, "tt"),
            batch_size=1, sample_rate=a.sample_rate, cal_sdr=a.cal_sdr)
        cmd_evaluate(ns)
    if a.stage <= 4 <= a.stop_stage:
        ns = argparse.Namespace(
            model_path=model, out_dir=os.path.join(a.work_dir, "separate"),
            mix_dir=os.path.join(a.data_dir, "tt", "mix"), mix_json=None,
            batch_size=1, sample_rate=a.sample_rate)
        cmd_separate(ns)
    return 0


def _honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS=cpu convtasnet-tpu ...`` actually work.

    Some environments pre-register an accelerator plugin from
    ``sitecustomize`` and set ``jax.config.jax_platforms`` in the process,
    after which the environment variable is silently ignored. Re-assert the
    user's env choice before the first backend initialization.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized (library use); leave it be


def main(argv=None) -> int:
    _honor_jax_platforms_env()
    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # repeat XLA builds become disk hits
    parser = argparse.ArgumentParser(
        prog="convtasnet-tpu",
        description="TPU-native Conv-TasNet speech separation framework")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prepare", help="generate mixture corpus (stage 0)")
    p.add_argument("--pair-list", default="")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--source-root", default="")
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--mode", default="min", choices=["min", "max"])
    p.add_argument("--all-variants", type=int, default=0,
                   help="emit 8k+16k x min+max trees in one pass "
                        "(MATLAB generator parity)")
    p.add_argument("--wsj0-root", default="",
                   help="raw WSJ0 sphere disc tree: decode .wv1/.wv2 "
                        "natively and build the full wsj0-2mix corpus "
                        "(with --lists-dir; replaces sph2pipe + MATLAB)")
    p.add_argument("--lists-dir", default="",
                   help="directory containing the MERL "
                        "mix_2_spk_{tr,cv,tt}.txt pairing lists")
    p.add_argument("--C", type=int, default=2,
                   help="speakers per mixture (list files named "
                        "mix_<C>_spk_*.txt for C != 2)")
    p.set_defaults(fn=cmd_prepare)

    p = sub.add_parser("preprocess", help="build JSON manifests (stage 1)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--C", type=int, default=2)
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("train", help="train (stage 2)")
    p.add_argument("--train-dir", required=True, help="json dir with tr manifests")
    p.add_argument("--valid-dir", required=True, help="json dir with cv manifests")
    p.add_argument("--auto-exp-name", type=int, default=0)
    _add_model_flags(p); _add_data_flags(p); _add_solver_flags(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("evaluate", help="SI-SNRi / SDRi eval (stage 3)")
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-dir", required=True, help="json dir with tt manifests")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--cal-sdr", type=int, default=0)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--use-pallas", type=int, default=-1, choices=[-1, 0, 1],
                   help="fused TCN kernels: -1 auto (on for real "
                        "accelerators), 0 off, 1 on")
    p.add_argument("--batch-chunk", type=int, default=8,
                   help="rows per lax.map slice of the forward (0 = whole "
                        "batch); keeps activations VMEM-resident")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("separate", help="write separated wavs (stage 4)")
    p.add_argument("--model-path", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--mix-dir", default=None)
    p.add_argument("--mix-json", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--streaming", type=int, default=0,
                   help="chunk-by-chunk causal streaming runtime")
    p.add_argument("--chunk-seconds", type=float, default=0.5)
    p.add_argument("--sequence-parallel", type=int, default=0,
                   help="shard each mixture's time axis over all devices")
    p.add_argument("--ring-attention", type=int, default=0,
                   help="with --sequence-parallel on a dpt model: rotate "
                        "inter-chunk keys/values around the mesh (online "
                        "softmax) instead of gathering them — O(chunks/"
                        "device) memory for extreme lengths")
    p.add_argument("--use-pallas", type=int, default=-1, choices=[-1, 0, 1],
                   help="fused TCN kernels: -1 auto (on for real "
                        "accelerators), 0 off, 1 on")
    p.add_argument("--batch-chunk", type=int, default=8,
                   help="rows per lax.map slice of the forward (0 = whole "
                        "batch); keeps activations VMEM-resident")
    p.add_argument("--tensor-parallel", type=int, default=0,
                   help="model-axis size m > 1: serve over a (data x "
                        "model) mesh — TCN hidden dim / dual-path head "
                        "groups Megatron-split, fused kernels per shard "
                        "(parallel/dpt_tp.py, ops/pallas/tcn_block_tp.py)")
    p.set_defaults(fn=cmd_separate)

    p = sub.add_parser("stream-demo",
                       help="real-time chunked separation with latency stats")
    p.add_argument("--model-path", required=True, help="causal checkpoint")
    p.add_argument("--wav", required=True)
    p.add_argument("--chunk-ms", type=float, default=8.0)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--realtime", type=int, default=0)
    p.set_defaults(fn=cmd_stream_demo)

    p = sub.add_parser("import-torch", help="convert a reference checkpoint")
    p.add_argument("--torch-path", required=True)
    p.add_argument("--out-path", required=True)
    p.set_defaults(fn=cmd_import_torch)

    p = sub.add_parser("export-torch",
                       help="convert a native checkpoint to a reference-style torch package")
    p.add_argument("--ckpt-path", required=True)
    p.add_argument("--out-path", required=True)
    p.set_defaults(fn=cmd_export_torch)

    p = sub.add_parser("recipe", help="staged pipeline (stages 1-4)")
    p.add_argument("--data-dir", required=True, help="wav tree root")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--stage", type=int, default=1)
    p.add_argument("--stop-stage", type=int, default=4)
    p.add_argument("--cal-sdr", type=int, default=0)
    _add_model_flags(p); _add_data_flags(p); _add_solver_flags(p)
    p.set_defaults(fn=cmd_recipe)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
