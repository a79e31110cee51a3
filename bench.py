"""Benchmark: separation throughput (x real-time per chip) on the flagship
paper-config model (4 s @ 8 kHz segments, bf16 compute).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north-star of 200x real-time per v5e chip (the
reference publishes no throughput numbers at all — SURVEY §6).

Method: the forward pass is iterated INNER times inside one jitted
``lax.scan`` (output fed back as the next input so iterations serialize) and
the result is fetched once — this measures on-device throughput rather than
the host<->device round-trip latency of the tunneled test harness, which
otherwise dominates (~100 ms RTT vs ~10 ms of compute). ``block_until_ready``
does not actually block through the axon relay, so timing always brackets a
``device_get``.
"""

from __future__ import annotations

import json
import os
import sys


def _last_bench_path() -> str:
    base = os.environ.get("CONVTASNET_COMPILE_CACHE") or os.path.expanduser(
        "~/.cache/convtasnet_tpu")
    return os.path.join(base, "last_bench.json")


def emit(result: dict) -> None:
    """Print the one JSON line and remember it, so an unreachable-relay
    run can report the last real measurement (marked stale) instead of 0."""
    print(json.dumps(result))
    try:
        os.makedirs(os.path.dirname(_last_bench_path()), exist_ok=True)
        with open(_last_bench_path(), "w") as f:
            json.dump(result, f)
    except OSError:
        pass

def _stale_line() -> dict:
    """Contract line for a run that produced no fresh measurement: value 0
    with an error, upgraded to the last REAL measurement (explicitly marked
    stale) when one exists — a 0.0 would read as a throughput regression
    when the only failure is the test harness's relay being down."""
    line = {
        "metric": "separation throughput (audio-sec/sec/chip, "
                  "paper config)",
        "value": 0.0,
        "unit": "x realtime",
        "vs_baseline": 0.0,
        "error": "tpu relay unreachable (backend probe timed out)",
    }
    try:
        with open(_last_bench_path()) as f:
            prev = json.load(f)
        if prev.get("value"):
            line.update(prev)
            line["stale"] = True
            line["error"] = ("tpu relay unreachable; value is the "
                             "last successful measurement")
    except (OSError, ValueError):
        pass
    return line


def _watchdog(argv: list) -> int:
    """Run the bench as a child process under a hard wall-clock deadline.

    The probe budget (ops/pallas/probe_budget) bounds a *responsive* cold
    start, but a single jax call blocked on a hung TPU relay can never be
    interrupted from inside the process (observed round 5: the relay
    wedged mid-probe and a trivial jit hung for minutes — the budget only
    ticks between calls). The parent is pure Python with no jax backend
    touch, so it can always enforce the deadline: kill the child and still
    print a contract line.

    Outcome logic, keyed on ``emit``'s ``last_bench.json`` side-file:
    - child exits 0 → it printed its own contract line(s); print nothing;
    - child killed/crashed but saved a FRESH line (mtime >= child start)
      → re-print that real measurement as the final stdout line;
    - otherwise → print the stale/error fallback line.

    ``CONVTASNET_BENCH_DEADLINE`` seconds (default 2400 — a healthy
    budget-capped cold run on a pathologically slow relay measured 32 min
    end-to-end in round 5, so the deadline must sit ABOVE that, and still
    inside the driver's own kill timeout); <= 0 disables the wrapper. An
    explicit ``CONVTASNET_PROBE_BUDGET <= 0`` (unlimited races — a
    measurement run, not the driver) also disables it: an unbounded race
    chain under a fixed deadline would be killed mid-probe by design.
    """
    import subprocess
    import time

    raw_budget = os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip()
    try:
        if raw_budget and float(raw_budget) <= 0:
            return -1  # unlimited-race measurement run: no deadline
    except ValueError:
        pass
    try:
        deadline = float(
            os.environ.get("CONVTASNET_BENCH_DEADLINE", "").strip() or 2400)
    except ValueError:
        deadline = 2400.0
    if deadline <= 0:
        return -1  # disabled: caller runs the bench in-process
    env = dict(os.environ, CONVTASNET_BENCH_WATCHDOG="1")
    t0 = time.time()
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), *argv], env=env)
    try:
        rc = child.wait(timeout=deadline)
    except subprocess.TimeoutExpired:
        print(f"bench watchdog: deadline ({deadline:.0f} s) exceeded; "
              f"killing the bench child", file=sys.stderr)
        child.kill()
        child.wait()
        rc = None
    if rc == 0:
        return 0  # every successful child path printed a contract line
    fresh = None
    try:
        if os.stat(_last_bench_path()).st_mtime >= t0:
            with open(_last_bench_path()) as f:
                fresh = json.load(f)
    except (OSError, ValueError):
        fresh = None
    if fresh and fresh.get("value"):
        # the child measured and printed the contract line before hanging
        # (e.g. in the optional DPT phase); re-print it as the LAST line
        print(json.dumps(fresh))
    else:
        print(json.dumps(_stale_line()))
    return 0


import jax
import jax.numpy as jnp
import numpy as np

# 30 chained forwards ≈ 160 ms of device work per fetch: the relay's
# run-to-run RTT jitter (several ms) is ~2% of the signal instead of the
# ~5-8% observed at the old INNER=10 (flagship readings 5,577-6,307x across
# identical programs). Throughput per iteration is unchanged — the scan
# body is identical, only the integration window grew.
INNER = 30
TRIALS = 9


def dpt_line(batch_size: int = 8, seconds: float = 4.0,
             trials: int = TRIALS) -> None:
    """Labeled dual-path (second family) throughput line, printed AFTER the
    first contract line (the contract must be on stdout before any optional
    work can be killed by the driver's timeout) and BEFORE the contract
    line's final re-print. Best-effort: any failure here must not disturb
    the TCN contract line."""
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
    from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed
    from convtasnet_tpu.utils.timing import median_fetch_seconds, rtt_baseline

    T = int(seconds * 8000)
    cfg = ConvTasNetConfig(
        separator="dpt", compute_dtype="bfloat16",
        use_pallas=jax.default_backend() != "cpu")
    ensure_probed(cfg, batch_size, T, verbose=True)
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    params = variables["params"]

    def chain(p, m):
        def body(carry, _):
            out = model.apply({"params": p}, carry)
            return jnp.sum(out, axis=1), jnp.float32(0)

        final, _ = jax.lax.scan(body, m, None, length=INNER)
        return jnp.sum(final)

    fwd = jax.jit(chain)
    # mixture generated on device: the relay moves bulk arrays at well
    # under 1 MB/s, so even a 1 MB upload costs seconds
    mixture = jax.jit(
        lambda k: jax.random.normal(k, (batch_size, T), jnp.float32)
    )(jax.random.PRNGKey(0))
    rtt_s = rtt_baseline(mixture, trials=trials)
    jax.device_get(fwd(params, mixture))
    dt = max(median_fetch_seconds(fwd, params, mixture, trials=trials)
             - rtt_s, 1e-9)
    rtf = batch_size * seconds * INNER / dt
    # print only — the contract (and last_bench fallback) is the TCN line
    print(json.dumps({
        "metric": "separation throughput (audio-sec/sec/chip, "
                  "dpt quality-default)",
        "value": round(rtf, 1),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 200.0, 2),
    }))


def main(batch_size: int = 8, seconds: float = 4.0, trials: int = TRIALS,
         profile_dir: str = "") -> None:
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
    from convtasnet_tpu.ops.pallas import probe_budget
    from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed
    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    sr = 8000
    T = int(seconds * sr)
    # Fused Pallas TCN blocks on: each dilation is AOT-probed and autotuned
    # first (any variant that fails to compile or loses the on-device race
    # degrades that block to XLA — the bench cannot be broken by a flaky
    # Mosaic compile, only slowed).
    #
    # Deadline safety (round-4 rc=124 postmortem: a cold autotune cache made
    # the probe chain outlast the driver's bench timeout and no contract
    # line ever printed): the probes get a hard wall-clock budget
    # (CONVTASNET_PROBE_BUDGET, default 6 min). Once exhausted, un-raced
    # dilations stay on XLA for this run — slower contract value, but the
    # line always prints; partial race results persist, so the next run
    # finishes the races.
    cfg = ConvTasNetConfig(
        compute_dtype="bfloat16",
        use_pallas=jax.default_backend() != "cpu")
    probe_budget.begin()
    ensure_probed(cfg, batch_size, T, verbose=True)
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    params = variables["params"]

    def chain(p, m):
        def body(carry, _):
            out = model.apply({"params": p}, carry)
            return jnp.sum(out, axis=1), jnp.float32(0)

        final, _ = jax.lax.scan(body, m, None, length=INNER)
        return jnp.sum(final)

    fwd = jax.jit(chain)
    # mixture generated on device (see dpt_line: relay bulk bandwidth)
    mixture = jax.jit(
        lambda k: jax.random.normal(k, (batch_size, T), jnp.float32)
    )(jax.random.PRNGKey(0))

    # shared relay timing protocol: device_get-forced, RTT-subtracted
    from convtasnet_tpu.utils.timing import median_fetch_seconds, rtt_baseline

    rtt_s = rtt_baseline(mixture, trials=trials)
    jax.device_get(fwd(params, mixture))  # extra warmup beyond compile
    if profile_dir:
        # --profile DIR: trace one timed chain (host-side events only
        # through the relay — see utils/metrics.profile)
        from convtasnet_tpu.utils.metrics import profile

        with profile(profile_dir):
            jax.device_get(fwd(params, mixture))
    dt = max(median_fetch_seconds(fwd, params, mixture, trials=trials)
             - rtt_s, 1e-9)

    audio_seconds = batch_size * seconds * INNER
    rtf = audio_seconds / dt
    result = {
        "metric": "separation throughput (audio-sec/sec/chip, paper config)",
        "value": round(rtf, 1),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 200.0, 2),
    }
    # The CONTRACT line prints FIRST (round-4 VERDICT #1c): if anything after
    # this point is killed by the driver's timeout, the throughput number is
    # already on stdout.
    emit(result)
    sys.stdout.flush()
    try:
        probe_budget.begin()  # fresh budget for the optional second family
        dpt_line(batch_size, seconds, trials)
    except Exception as e:  # noqa: BLE001 — second-family line is optional
        print(f"dpt bench line failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    # ... and the contract line also prints LAST: the driver may parse
    # either the first or the final JSON line of stdout — both must be the
    # contract metric, with the labeled DPT line in between.
    print(json.dumps(result))


def fallback(batch_size: int = 8, seconds: float = 4.0, trials: int = 8) -> None:
    """Plain per-call timing (no scan chain) in case the chained compile is
    unavailable; RTT-subtracted, slightly noisier but always runs."""
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

    T = int(seconds * 8000)
    cfg = ConvTasNetConfig(compute_dtype="bfloat16")
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    fwd = jax.jit(lambda p, m: jnp.sum(model.apply({"params": p}, m)))
    rng = np.random.default_rng(0)
    mixture = jnp.asarray(rng.standard_normal((batch_size, T)), jnp.float32)
    from convtasnet_tpu.utils.timing import median_fetch_seconds, rtt_baseline

    rtt = rtt_baseline(mixture, trials=trials)
    dt = max(median_fetch_seconds(fwd, variables["params"], mixture,
                                  trials=trials) - rtt, 1e-9)
    rtf = batch_size * seconds / dt
    emit({
        "metric": "separation throughput (audio-sec/sec/chip, paper config)",
        "value": round(rtf, 1),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 200.0, 2),
    })


if __name__ == "__main__":
    if os.environ.get("CONVTASNET_BENCH_WATCHDOG") != "1":
        rc = _watchdog(sys.argv[1:])
        if rc >= 0:
            sys.exit(rc)
        # deadline <= 0: wrapper disabled, fall through to run in-process
    args = list(sys.argv[1:])
    prof = ""
    if "--profile" in args:
        i = args.index("--profile")
        prof = args[i + 1]
        del args[i:i + 2]
    bs = int(args[0]) if args else 8
    # The tunneled TPU relay hangs (not errors) on the first backend touch
    # when it is down — probe it in a subprocess under a timeout so the
    # bench always prints its one JSON line instead of wedging the driver.
    from __graft_entry__ import _ambient_device_count

    if _ambient_device_count(timeout=120.0) < 1:
        print("TPU relay unreachable; no device to bench", file=sys.stderr)
        print(json.dumps(_stale_line()))
        sys.exit(0)
    try:
        main(batch_size=bs, profile_dir=prof)
    except Exception as e:  # compile-service flakiness: degrade gracefully
        print(f"chained bench failed ({type(e).__name__}); falling back",
              file=sys.stderr)
        fallback(batch_size=bs)
