"""Worker process for the multi-host integration test.

Run as: python multihost_worker.py <coordinator> <num_procs> <proc_id> <dir> [devs_per_proc]

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent); two
processes form one 8-device global mesh over jax.distributed (the DCN path
of SURVEY §2's data-parallelism row). Process 0 writes the corpus; both
build the same dataset and run 2 sharded train steps through BatchLoader's
``make_array_from_process_local_data`` branch; losses print to stdout for
the parent to compare against a single-process run.
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")


def log(msg):
    print(msg, flush=True)


def main():
    coordinator, num_procs, proc_id, work_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    devs_per_proc = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs
    n_global = len(jax.devices())
    assert n_global == devs_per_proc * num_procs, jax.devices()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
    from convtasnet_tpu.data.dataset import SeparationDataset
    from convtasnet_tpu.data.loader import BatchLoader
    from convtasnet_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from convtasnet_tpu.train.train_step import create_train_state, make_train_step

    marker = os.path.join(work_dir, "corpus_ready")
    if proc_id == 0:
        from convtasnet_tpu.data.audio_io import write_wav

        rng = np.random.default_rng(0)
        for part in ("mix", "s1", "s2"):
            os.makedirs(os.path.join(work_dir, "tr", part), exist_ok=True)
        for i in range(16):
            t = np.arange(8000) / 8000.0
            s1 = 0.3 * np.sin(2 * np.pi * rng.uniform(200, 800) * t)
            s2 = 0.3 * np.sin(2 * np.pi * rng.uniform(900, 1500) * t)
            for part, x in (("mix", s1 + s2), ("s1", s1), ("s2", s2)):
                write_wav(os.path.join(work_dir, "tr", part, f"u{i}.wav"),
                          x.astype(np.float32), 8000)
        from convtasnet_tpu.data.manifest import build_manifests

        build_manifests(work_dir, os.path.join(work_dir, "json"), 8000)
        with open(marker, "w") as f:
            f.write("ok")
    else:
        for _ in range(300):
            if os.path.exists(marker):
                break
            time.sleep(0.1)
        else:
            raise RuntimeError("corpus never appeared")

    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    cfg = ConvTasNetConfig(
        n_filters=16, kernel_size=8, bottleneck=12, hidden=24,
        conv_kernel=3, num_blocks=2, num_repeats=1, num_speakers=2)
    solver_cfg = SolverConfig(lr=1e-3, seed=0)
    ds = SeparationDataset(
        os.path.join(work_dir, "json", "tr"), batch_size=8, sample_rate=8000,
        segment=1.0, pad_rows_to_multiple=n_global)
    loader = BatchLoader(ds, shuffle=False, sharding=sharding, num_workers=2)

    state, tx = create_train_state(cfg, solver_cfg, jax.random.PRNGKey(0), 8000)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(cfg, tx, mesh=mesh)

    losses = []
    for k, batch in enumerate(loader):
        state, metrics = step(state, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
        if k >= 1:
            break
    log("LOSSES " + " ".join(f"{v:.6f}" for v in losses))


if __name__ == "__main__":
    main()
