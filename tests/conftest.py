"""Test harness: run everything on a virtual 8-device CPU platform so
pjit/shard_map collectives are exercised without TPU hardware (SURVEY §4).

Note: this image's sitecustomize imports jax at interpreter start (to register
the tunneled `axon` TPU backend) with JAX_PLATFORMS=axon pinned in the
environment, so plain env-var overrides here are too late — use
``jax.config.update`` before any backend is initialized instead.
"""

import os
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Hermeticity: the autotune-winner disk cache (ops/pallas/tcn_block) must
# never read or write the user's real ~/.cache during tests — a warm cache
# from a bench run would leak into probe tests (round-2 VERDICT weak #1).
# Individual tests still monkeypatch this var to their own tmp_path.
os.environ["CONVTASNET_AUTOTUNE_CACHE"] = tempfile.mkdtemp(
    prefix="convtasnet-test-autotune-")

# The probe wall-clock budget (ops/pallas/probe_budget) must never trip
# mid-suite — one pytest process runs for ~an hour. 0 = unlimited; tests
# that exercise the budget call probe_budget.begin()/reset() explicitly.
os.environ["CONVTASNET_PROBE_BUDGET"] = "0"

# The in-model winner re-validation (ops/pallas/dpt_inmodel) times the real
# separator stack on-device; several registry tests monkeypatch the backend
# to "tpu", which would otherwise trigger it. Tests that exercise it opt in
# by monkeypatching this var back to "1".
os.environ["CONVTASNET_INMODEL_RACE"] = "0"

# Two-block pair fusion engages unconditionally under interpret mode (CPU),
# which would silently shift every model test off the single-block fused
# path. Tests exercise the pair kernel explicitly (tests/test_tcn_pair.py)
# by monkeypatching this back to "1".
os.environ["CONVTASNET_PAIR_FUSION"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")
# Exact f32 matmuls in tests (TPU bf16 passes are exercised explicitly).
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
