#!/bin/bash
# On-chip work queued during the TPU relay outage (round 3).
# Run from the repo root the moment the relay is back:
#   bash scripts/tpu_pending.sh 2>&1 | tee /tmp/tpu_pending.log
#
# Each step is independently time-bounded; first compiles go through the
# remote compile service (minutes each, then disk-cached). The races
# populate the persistent autotune cache, so later runs (bench.py, the
# driver) start warm.
set -u
cd "$(dirname "$0")/.."

echo "=== 1. DPT forward: race fused inter+FFN+intra vs XLA (B=8) ==="
timeout 3600 python scripts/bench_train.py --separator dpt

echo "=== 2. DPT train step: race the fused custom-VJP pairs (B=24) ==="
timeout 3600 python scripts/bench_train.py --separator dpt --train

echo "=== 3. Per-sublayer ablation (shows the post-fusion distribution) ==="
timeout 1800 python scripts/bench_dpt_ablate.py

echo "=== 4. DPT serving sweep (chunk x heads) ==="
timeout 1800 python scripts/bench_dpt.py --quick

echo "=== 5. Batch-chunked DPT serving at B=32 ==="
timeout 1800 python scripts/bench_chunked.py 32 8 dpt

echo "=== 6. TP partial kernels: compile/numerics/race at local widths ==="
timeout 1800 python - <<'EOF'
import jax
from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.parallel.dpt_tp import ensure_probed_dpt_tp
from convtasnet_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
cfg = ConvTasNetConfig(separator="dpt", n_filters=256, bottleneck=256,
                       compute_dtype="bfloat16")
T = 4 * cfg.sample_rate
for n_model in (2, 4):
    print(f"--- probing TP partial kernels (fwd + train), "
          f"n_model={n_model} ---", flush=True)
    ensure_probed_dpt_tp(cfg, n_model, batch=8, T=T, verbose=True,
                         train=True)
EOF

echo "=== 7. TCN fused stage-2 under TP: numerics gate + race at local widths ==="
timeout 3600 python - <<'EOF'
import jax
from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.ops.pallas.tcn_block_tp import ensure_probed_tcn_tp
from convtasnet_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
cfg = ConvTasNetConfig(compute_dtype="bfloat16")  # paper TCN: H=512, gLN
T = 4 * cfg.sample_rate
for n_model in (2, 4):
    print(f"--- probing TCN TP stage-2 kernels, n_model={n_model} ---",
          flush=True)
    ensure_probed_tcn_tp(cfg, n_model, batch=8, T=T, verbose=True)
EOF

echo "=== 8. Flagship bench sanity ==="
timeout 1800 python bench.py
