#!/bin/bash
# Round-5 lr re-tune for the chip-speed geometry (VERDICT r4 item 2):
# 1024x64 mb256 saturates the fused iteration at ~43.7% MFU (2x the mb64
# recipe), so the minibatch grows 4x and the lr must be re-tuned.  Three
# 2.5M-step ablations, same league setup (external demo anchor), floor on:
#   A: 1e-4 -> 3e-5   (unscaled r4c schedule — control)
#   B: 2e-4 -> 6e-5   (sqrt scaling)
#   C: 4e-4 -> 1.2e-4 (linear scaling)
set -u
cd "$(dirname "$0")/.."
PRESETS="default sventon sventon_ppo resblock experiment_sventon_ppo r5_learning"

run_one() {
  local id=$1 init=$2 fin=$3
  echo "=== $id: lr $init -> $fin ($(date -u +%T)) ==="
  python -m drl_tetris_tpu train \
    --presets $PRESETS \
    --set "value_lr={\"__kind__\":\"LinearParameter\",\"init_val\":$init,\"final_val\":$fin,\"time_horizon\":10000000}" \
    --run-id "$id" --steps 2500000 --n-envs 1024 --horizon 64 --seed 0 \
    --save-every 15 --log-every 5 \
    --league-every 8 --league-games 16 --league-anchor data/demo_weights \
    > "data/${id}.log" 2>&1
  echo "=== $id done rc=$? ($(date -u +%T)) ==="
}

run_one ab_r5_lrA 1e-4 3e-5
run_one ab_r5_lrB 2e-4 6e-5
run_one ab_r5_lrC 4e-4 1.2e-4
echo "sweep complete"
