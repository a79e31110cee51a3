#!/usr/bin/env bash
# wsj0-2mix recipe — ops-level entry mirroring the reference 5-stage pipeline
# (reference: egs/wsj0/run.sh:78-176), driving the typed-config CLI.
#
# Stage 0 (corpus): one command replaces sph2pipe + the MERL MATLAB scripts —
#   pass --wsj0-root (raw sphere disc tree) and --lists-dir (the MERL
#   mix_2_spk_{tr,cv,tt}.txt files) and it decodes every .wv1/.wv2 natively
#   and emits the wav{8,16}k/{min,max}/{tr,cv,tt} trees:
#     python -m convtasnet_tpu.cli prepare --wsj0-root $WSJ0_DISCS \
#         --lists-dir $MERL_LISTS --out-dir data/2speakers
#   (For custom corpora, --pair-list generates mixtures from any pairing
#   list: prepare --pair-list pairs.txt --out-dir $data/tr --source-root ...)
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
# --cmd: stage launcher (Kaldi cmd.sh capability). "local" runs in-process;
# otherwise a blocking submission template with {script}/{log} placeholders,
# e.g. --cmd 'sbatch --wait -o {log} {script}'  or
#      --cmd 'qsub -sync y -j y -o {log} {script}'
cmd=local
wsj0_root=            # raw WSJ0 sphere disc tree (enables stage 0)
lists_dir=            # MERL mix_2_spk_{tr,cv,tt}.txt directory
corpus_out=data/2speakers
extra_args=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --wsj0-root) wsj0_root=$2; shift 2 ;;
    --lists-dir) lists_dir=$2; shift 2 ;;
    --corpus-out) corpus_out=$2; shift 2 ;;
    --stage) stage=$2; shift 2 ;;
    --stop-stage) stop_stage=$2; shift 2 ;;
    --data) data=$2; shift 2 ;;
    --work) work=$2; shift 2 ;;
    --sample-rate) sample_rate=$2; shift 2 ;;
    --batch-size) batch_size=$2; shift 2 ;;
    --epochs) epochs=$2; shift 2 ;;
    --cal-sdr) cal_sdr=$2; shift 2 ;;
    --cmd) cmd=$2; shift 2 ;;
    *) extra_args+=("$1"); shift ;;
  esac
done

# Stage 0: corpus generation from the raw sphere tree (no sph2pipe/MATLAB).
if [[ $stage -le 0 && -n "$wsj0_root" ]]; then
  python -m convtasnet_tpu.cli prepare \
    --wsj0-root "$wsj0_root" --lists-dir "$lists_dir" \
    --out-dir "$corpus_out"
fi
[[ $stage -lt 1 ]] && stage=1

recipe_stage() {  # recipe_stage <from> <to>
  python -m convtasnet_tpu.cli recipe \
    --data-dir "$data" --work-dir "$work" \
    --stage "$1" --stop-stage "$2" \
    --sample-rate "$sample_rate" --batch-size "$batch_size" \
    --epochs "$epochs" --cal-sdr "$cal_sdr" \
    --compute-dtype bfloat16 \
    "${extra_args[@]}"
}

if [[ "$cmd" == "local" ]]; then
  recipe_stage "$stage" "$stop_stage"
else
  # per-stage batch submission with captured logs (queue.pl-style)
  mkdir -p "$work/logs"
  for s in $(seq "$stage" "$stop_stage"); do
    script="$work/logs/stage${s}.sh"
    log="$work/logs/stage${s}.log"
    { echo "#!/usr/bin/env bash"; echo "set -e"
      echo "cd $(pwd)"
      declare -f recipe_stage
      echo "data=$(printf %q "$data"); work=$(printf %q "$work")"
      echo "sample_rate=$sample_rate; batch_size=$batch_size"
      echo "epochs=$epochs; cal_sdr=$cal_sdr"
      echo "extra_args=(${extra_args[*]@Q})"
      echo "recipe_stage $s $s"
    } > "$script"
    chmod +x "$script"
    render=${cmd//'{script}'/$script}
    render=${render//'{log}'/$log}
    echo "[run.sh] stage $s via: $render"
    eval "$render"
  done
fi

# render the loss curves (visdom-equivalent)
hist=$(find "$work/exp" -name history.jsonl | head -1 || true)
[[ -n "${hist:-}" ]] && python -m convtasnet_tpu.utils.plot "$hist" || true
