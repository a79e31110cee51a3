"""Measured wsj0-scale epoch, data pipeline included (VERDICT r2 item #3).

Generates a ~30 h synthetic 2-speaker corpus once (wsj0-2mix tr is ~30 h /
~20k utterances), then runs ONE real training epoch — BatchLoader with
threaded decode+prefetch, host->device transfer, multi-step dispatch, the
probe-gated fused train step — on the chip, and reports:

- epoch wall-clock,
- host time blocked waiting on the loader (chip-starvation bound),
- host time in dispatch calls,
- steady-state pure-device step time (same protocol as bench_train) and the
  derived device-busy estimate / idle fraction.

The round-2 docs claimed "~30 h epoch ~= 1.5 min" by extrapolating step
time x step count; this measures it.

Usage: python scripts/bench_epoch.py [--hours 30] [--corpus DIR]
       [--steps-per-call 8] [--batch-size 24] [--gen-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 8000


def ensure_corpus(root: str, hours: float, seed: int = 0) -> str:
    """Synthetic {tr}/{mix,s1,s2} tree totalling ~`hours` of audio with a
    wsj0-like utterance-length distribution (lognormal, 2-13 s). Returns the
    manifest dir; skips generation when the manifest already covers it."""
    from convtasnet_tpu.data.audio_io import write_wav
    from convtasnet_tpu.data.manifest import build_manifests

    json_dir = os.path.join(root, "json")
    marker = os.path.join(root, f"corpus_{hours:g}h.done")
    if os.path.exists(marker):
        return json_dir
    rng = np.random.default_rng(seed)
    for part in ("mix", "s1", "s2"):
        os.makedirs(os.path.join(root, "tr", part), exist_ok=True)
    total = 0.0
    i = 0
    target = hours * 3600
    t0 = time.time()
    while total < target:
        dur = float(np.clip(rng.lognormal(np.log(6.0), 0.45), 2.0, 13.0))
        n = int(dur * SR)
        s1 = 0.25 * rng.standard_normal(n).astype(np.float32)
        s2 = 0.25 * rng.standard_normal(n).astype(np.float32)
        mix = s1 + s2
        peak = max(np.abs(mix).max(), np.abs(s1).max(), np.abs(s2).max())
        scale = 0.9 / peak
        name = f"utt{i:06d}.wav"
        write_wav(os.path.join(root, "tr", "s1", name), scale * s1, SR)
        write_wav(os.path.join(root, "tr", "s2", name), scale * s2, SR)
        write_wav(os.path.join(root, "tr", "mix", name), scale * mix, SR)
        total += dur
        i += 1
        if i % 2000 == 0:
            print(f"  corpus gen: {i} utts, {total / 3600:.1f} h "
                  f"({time.time() - t0:.0f} s)", file=sys.stderr, flush=True)
    print(f"corpus: {i} utterances, {total / 3600:.2f} h in "
          f"{time.time() - t0:.0f} s", file=sys.stderr, flush=True)
    build_manifests(root, json_dir, SR, splits=("tr",))
    with open(marker, "w") as f:
        f.write(f"{i} utts {total / 3600:.2f} h\n")
    return json_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=30.0)
    ap.add_argument("--corpus", default="/tmp/convtasnet_epoch_corpus")
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--steps-per-call", type=int, default=8)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--segment-cache", type=int, default=1,
                    help="decode-once memmapped batch cache (epoch 0 "
                         "fills; the measured epoch streams slices)")
    ap.add_argument("--max-steps", type=int, default=0,
                    help="cap dispatched optimizer steps (0 = full epoch)")
    a = ap.parse_args()

    json_dir = ensure_corpus(a.corpus, a.hours)
    if a.gen_only:
        return

    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
    from convtasnet_tpu.data.dataset import SeparationDataset
    from convtasnet_tpu.data.loader import BatchLoader
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet  # noqa: F401
    from convtasnet_tpu.ops.pallas.tcn_block import (
        ensure_probed,
        ensure_probed_train,
    )
    from convtasnet_tpu.train.train_step import (
        create_train_state,
        make_multi_train_step,
        make_train_step,
    )
    from convtasnet_tpu.utils.timing import rtt_baseline

    cfg = ConvTasNetConfig(
        compute_dtype="bfloat16",
        use_pallas=jax.default_backend() != "cpu")
    scfg = SolverConfig(steps_per_call=a.steps_per_call)
    T = 4 * SR
    ds = SeparationDataset(os.path.join(json_dir, "tr"), a.batch_size,
                           sample_rate=SR, segment=4.0)
    cache_frac = -1.0
    if a.segment_cache:
        from concurrent.futures import ThreadPoolExecutor

        from convtasnet_tpu.data.segment_cache import CachedDataset

        ds = CachedDataset(ds, os.path.join(a.corpus, "segcache"))
        if ds.hit_fraction() < 1.0:
            # epoch-0 experience: decode-and-fill every planned batch
            # (threaded like the loader), timed separately so the measured
            # epoch below is the steady-state (epoch >= 1) cost
            t0 = time.time()
            with ThreadPoolExecutor(a.num_workers) as pool:
                list(pool.map(ds.load_batch, range(len(ds))))
            print(f"segment cache fill (epoch-0 decode): "
                  f"{time.time() - t0:.1f} s", flush=True)
        cache_frac = ds.hit_fraction()
    loader = BatchLoader(ds, shuffle=True, num_workers=a.num_workers, seed=0)
    n_batches = len(loader)
    audio_h = n_batches * a.batch_size * 4.0 / 3600
    print(f"epoch plan: {n_batches} batches x B={a.batch_size} x 4 s "
          f"= {audio_h:.1f} h on-device audio "
          f"(backend={jax.default_backend()})", flush=True)

    ensure_probed(cfg, a.batch_size, T)
    ensure_probed_train(cfg, a.batch_size, T)
    state, tx = create_train_state(cfg, scfg, jax.random.PRNGKey(0), T)
    train_step = make_train_step(cfg, tx)
    multi_step = (make_multi_train_step(cfg, tx)
                  if a.steps_per_call > 1 else None)

    # -- compile with the first batch (excluded from the epoch timing) -----
    it = iter(loader)
    first = next(it)
    g0 = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([first] * a.steps_per_call))
    t0 = time.time()
    if multi_step is not None:
        state, m = multi_step(state, g0)
    else:
        state, m = train_step(state, first)
    jax.device_get(m["loss"])
    print(f"compile+first dispatch: {time.time() - t0:.1f} s", flush=True)

    # steady-state pure-device step time (cached batch). The train step
    # DONATES the state, so each timed call must carry the returned state —
    # re-passing the old one would fetch deleted buffers.
    rtt = rtt_baseline(first[0], trials=3)
    times = []
    for _ in range(3):
        t0 = time.time()
        if multi_step is not None:
            state, mm = multi_step(state, g0)
        else:
            state, mm = train_step(state, first)
        jax.device_get(mm["loss"])
        times.append(time.time() - t0)
    times.sort()
    t_call = max(times[len(times) // 2] - rtt, 1e-9)
    step_s = t_call / a.steps_per_call
    print(f"steady-state step: {step_s * 1e3:.1f} ms "
          f"({t_call * 1e3:.1f} ms per {a.steps_per_call}-step call)",
          flush=True)

    # -- the measured epoch ------------------------------------------------
    wall0 = time.time()
    loader_blocked = 0.0
    dispatch_host = 0.0
    group = [first]
    steps = 1
    last_loss = m["loss"]
    while True:
        if a.max_steps and steps >= a.max_steps:
            break
        tb = time.time()
        try:
            batch = next(it)
        except StopIteration:
            break
        loader_blocked += time.time() - tb
        group.append(batch)
        if len(group) == a.steps_per_call and multi_step is not None:
            td = time.time()
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *group)
            state, mm = multi_step(state, stacked)
            dispatch_host += time.time() - td
            last_loss = mm["loss"]
            steps += len(group)
            group = []
        elif multi_step is None:
            td = time.time()
            state, mm = train_step(state, group.pop())
            dispatch_host += time.time() - td
            last_loss = mm["loss"]
            steps += 1
    for b in group:  # tail, single-stepped
        td = time.time()
        state, mm = train_step(state, b)
        dispatch_host += time.time() - td
        last_loss = mm["loss"]
        steps += 1
    tsync = time.time()
    jax.device_get(last_loss)
    sync_s = time.time() - tsync
    wall = time.time() - wall0

    busy = steps * step_s
    idle_frac = max(0.0, 1.0 - busy / wall)
    summary = {
        "epoch_wall_s": round(wall, 1),
        "steps": steps,
        "audio_hours": round(steps * a.batch_size * 4.0 / 3600, 2),
        "loader_blocked_s": round(loader_blocked, 1),
        "dispatch_host_s": round(dispatch_host, 1),
        "final_sync_s": round(sync_s, 1),
        "steady_step_ms": round(step_s * 1e3, 1),
        "device_busy_est_s": round(busy, 1),
        "chip_idle_frac_est": round(idle_frac, 3),
        "steps_per_call": a.steps_per_call,
        "batch_size": a.batch_size,
        "segment_cache_hit_frac": round(cache_frac, 3),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    from convtasnet_tpu.ops.pallas import probe_budget

    # measurement scripts want the FULL race, not the bench/driver's
    # deadline-capped subset (explicit env still wins)
    if not os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip():
        probe_budget.begin(0)
    main()
