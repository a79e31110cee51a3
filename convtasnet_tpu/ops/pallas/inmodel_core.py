"""Shared greedy in-model winner re-validation engine.

Isolated kernel races cannot see a kernel's cost to the REST of the jitted
program: a Pallas custom call is a fusion barrier, so engaging it changes
what XLA fuses around it and what stays VMEM-resident — and that cost is
batch-dependent and mispredicts in both directions (measured on v5e: the
DPT intra kernel wins isolated at every batch yet slows the B=8 forward
~3%; loses isolated at B=32 yet speeds the full forward ~11%).

This module owns the decision discipline used by both in-model validators
(``dpt_inmodel`` for the dual-path forward sublayers, ``tcn_inmodel_train``
for the TCN fused train pairs): time the real jitted program as-probed,
greedily try demoting each engaged winner to XLA and promoting each
isolated-race loser to its best numerics-verified fused variant, lock in
flips that beat a jitter margin (median-of-3 re-measure inside the
borderline band), and persist the decision keyed against the raced winners
so it self-invalidates when a kernel is re-raced.

Reference parity: the reference (src/conv_tasnet.py) has one fixed torch
graph and nothing to validate; this is TPU-specific autotune discipline.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

# flip a winner only when the alternative measures faster by more than this
# margin — relay RTT jitter is a few ms per call and the chained timing
# suppresses most of it but ~1-2% run-to-run noise remains (measured: a
# cached-trace re-measurement of the *identical* program moved 3.9%); every
# real in-model effect observed so far is >=4%. A single-sample win inside
# (1x, 2x] of this margin is re-measured median-of-3 before it locks in —
# the margin alone sits below the measured identical-program jitter.
DEMOTE_MARGIN = 0.03

Regs = Dict[str, Tuple[dict, tuple]]


def apply_cached_decision(regs: Regs, cached: dict) -> bool:
    """Apply a persisted decision on top of the raced winners. Returns True
    when every entry applied cleanly; False when any sublayer's raced winner
    no longer matches what was validated (a re-raced winner must be
    re-validated)."""
    stale = False
    for nm, (reg, key) in regs.items():
        dec = cached.get(nm)
        if dec is None:
            continue
        raced, final = dec.get("raced"), dec.get("final")
        if reg.get(key) == raced:
            reg[key] = final
        else:
            stale = True
    return not stale


def greedy_validate(
    regs: Regs,
    best_fused: Dict[str, object],
    time_fn: Callable[[], float],
    *,
    demote_order: Sequence[str],
    promote_order: Sequence[str],
    margin: float = DEMOTE_MARGIN,
    log: Callable[[str], None] = lambda msg: None,
) -> Optional[dict]:
    """Greedy demote/promote over ``regs`` against ``time_fn`` timings.

    ``regs`` maps a name to ``(registry_dict, key)``; ``best_fused`` maps a
    name to the promotion candidate for names whose registry entry is None.
    Mutates the registries in place. Returns the decision dict to persist
    ({name: {raced, final}}), ``{}`` when there was nothing to validate, or
    None when timing failed (registries restored to the raced winners).
    """
    raced = {nm: reg.get(key) for nm, (reg, key) in regs.items()}
    engaged = {nm for nm, (reg, key) in regs.items()
               if reg.get(key) is not None}
    promotable = {nm for nm in regs
                  if nm not in engaged and best_fused.get(nm) is not None}
    if not engaged and not promotable:
        return {}

    def try_flip(nm: str, alt, base: float, action: str) -> float:
        """Time with ``nm``'s winner flipped to ``alt``; keep the flip if it
        beats ``base`` by the margin (median-of-3 inside the borderline
        band), else restore."""
        reg, key = regs[nm]
        keep = reg[key] if key in reg else None
        reg[key] = alt
        try:
            flipped = time_fn()
        except Exception:  # noqa: BLE001 — keep the current winner
            reg[key] = keep
            return base
        win = flipped < base * (1.0 - margin)
        if win and flipped > base * (1.0 - 2.0 * margin):
            # Borderline win: the single sample sits inside the measured
            # jitter band, so one spike could lock in a wrong flip —
            # median-of-3 before committing.
            try:
                flipped = sorted([flipped, time_fn(), time_fn()])[1]
            except Exception:  # noqa: BLE001 — keep the current winner
                reg[key] = keep
                return base
            win = flipped < base * (1.0 - margin)
        if win:
            log(f"{nm} {action} ({flipped * 1e3:.2f} vs {base * 1e3:.2f} ms "
                f"in-model)")
            return flipped
        reg[key] = keep
        log(f"{nm} kept ({action} {flipped * 1e3:.2f} vs "
            f"{base * 1e3:.2f} ms)")
        return base

    try:
        base = time_fn()
        log(f"as-probed {base * 1e3:.2f} ms")
        for nm in demote_order:
            if nm in engaged:
                base = try_flip(nm, None, base, "DEMOTED to xla")
        for nm in promote_order:
            if nm in promotable:
                base = try_flip(nm, best_fused[nm], base,
                                f"PROMOTED to fused {best_fused[nm]}")
    except Exception as e:  # noqa: BLE001 — validation is best-effort
        for nm, (reg, key) in regs.items():  # restore raced winners
            reg[key] = raced[nm]
        log(f"validation failed ({type(e).__name__}); raced winners kept")
        return None
    return {nm: {"raced": raced[nm], "final": regs[nm][0].get(regs[nm][1])}
            for nm in regs}
