#!/bin/bash
# Assemble the canonical eval-artifact checkpoint trees from the round-4
# training runs (final checkpoint + config + metrics only), then build
# both matrices:
#   runs/eval_artifact      -- new dynamics  {PPO_SP, PPO_BC, BC}
#   runs/eval_artifact_old  -- old dynamics  (reference protocol variant)
set -e
cd "$(dirname "$0")/.."

copy_last() {  # copy_last <src_run_dir> <dst_dir>
  src=$1; dst=$2
  last=$(ls -d "$src"/step_* | awk -F_ '{print $NF, $0}' | sort -n | tail -1 | cut -d" " -f2-)
  mkdir -p "$dst"
  rm -rf "$dst"/step_* "$dst"/config.json "$dst"/metrics.jsonl
  cp -r "$last" "$dst/"
  cp "$src/config.json" "$src/metrics.jsonl" "$dst/"
}

L5="cramped_room asymmetric_advantages coordination_ring forced_coordination counter_circuit_o_1order"

rm -rf runs/eval_artifact runs/eval_artifact_old
copy_last runs/r4_probe_cramped runs/eval_artifact/ppo_sp_cramped_room
# counter_circuit needs the slow entropy anneal (NOTES.md) -- v2 run
copy_last runs/r4_sp_counter_circuit_v2 \
  runs/eval_artifact/ppo_sp_counter_circuit_o_1order
for L in $L5; do
  case "$L" in
    cramped_room|counter_circuit_o_1order) ;;  # ppo_sp copied above
    *) copy_last "runs/r4_sp_$L" "runs/eval_artifact/ppo_sp_$L";;
  esac
  copy_last "runs/r4_bcppo_$L" "runs/eval_artifact/ppo_bc_$L"
  cp -r "runs/r4_bc/bc_proxy_$L" "runs/eval_artifact/bc_proxy_$L"
  copy_last "runs/r4_old_sp_$L" "runs/eval_artifact_old/ppo_sp_$L"
  copy_last "runs/r4_old_bcppo_$L" "runs/eval_artifact_old/ppo_bc_$L"
  cp -r "runs/r4_bc_old/bc_proxy_$L" "runs/eval_artifact_old/bc_proxy_$L"
done

python scripts/make_eval_artifact.py --games 10 --platform cpu
python scripts/make_eval_artifact.py --games 10 --platform cpu \
  --old-dynamics --art-dir runs/eval_artifact_old
