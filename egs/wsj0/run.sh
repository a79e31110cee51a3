#!/usr/bin/env bash
# wsj0-2mix recipe — ops-level entry mirroring the reference 5-stage pipeline
# (reference: egs/wsj0/run.sh:78-176), driving the typed-config CLI.
#
# Stage 0 (corpus): the original wsj0-2mix wavs come from the WSJ0 corpus via
#   sph2pipe + the MERL mixing scripts; given a pair list this framework can
#   generate the mixtures itself:
#     python -m convtasnet_tpu.cli prepare --pair-list mix_2_spk_tr.txt \
#         --out-dir $data/tr --source-root $wsj0_wav
# Stages 1-4: manifests -> train -> evaluate -> separate.

set -euo pipefail

stage=1
stop_stage=4
data=data/2speakers/wav8k/min       # wav tree with {tr,cv,tt}/{mix,s1,s2}
work=work/wsj0_2mix
sample_rate=8000
batch_size=24
epochs=100
cal_sdr=0
extra_args=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --stage) stage=$2; shift 2 ;;
    --stop-stage) stop_stage=$2; shift 2 ;;
    --data) data=$2; shift 2 ;;
    --work) work=$2; shift 2 ;;
    --sample-rate) sample_rate=$2; shift 2 ;;
    --batch-size) batch_size=$2; shift 2 ;;
    --epochs) epochs=$2; shift 2 ;;
    --cal-sdr) cal_sdr=$2; shift 2 ;;
    *) extra_args+=("$1"); shift ;;
  esac
done

python -m convtasnet_tpu.cli recipe \
  --data-dir "$data" --work-dir "$work" \
  --stage "$stage" --stop-stage "$stop_stage" \
  --sample-rate "$sample_rate" --batch-size "$batch_size" \
  --epochs "$epochs" --cal-sdr "$cal_sdr" \
  --compute-dtype bfloat16 \
  "${extra_args[@]}"

# render the loss curves (visdom-equivalent)
hist=$(find "$work/exp" -name history.jsonl | head -1 || true)
[[ -n "${hist:-}" ]] && python -m convtasnet_tpu.utils.plot "$hist" || true
