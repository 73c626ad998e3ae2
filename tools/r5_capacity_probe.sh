#!/bin/bash
# Capacity probe (r5f): the one lever NOTES_ROUND5 left unexplored.
# Same recipe of record as the r4c/r5 flagships (r5_learning: mb64,
# lr 1e-4 -> 3e-5 over 10M, entropy floor), pure self-play from scratch,
# but at 2x model width (tower 5x128, value 6x256 vs the reference's
# 5x64 / 6x128 — experiments/sventon_ppo.py geometry).  League anchored
# on data/demo_weights so the Elo/demo-anchor gap is comparable at equal
# steps with parity10m_r4c's recorded curve
# (data/models/parity10m_r4c/elo_history.jsonl).
set -u
cd "$(dirname "$0")/.."
PRESETS="default sventon sventon_ppo resblock experiment_sventon_ppo r5_learning"

echo "=== parity10m_r5f: 2x-capacity from-scratch probe ($(date -u +%T)) ==="
# First attempt at the recipe-of-record lr (1e-4 decay) collapsed
# INSTANTLY (entropy 0.0005 by 327k steps, floor penalty pinned at its
# full-deficit value — vs r4c's 3.44 at the same tick at 1x width;
# data/r5f_attempt1.log).  The doubled-width model sharpens much harder
# per update, so the probe runs at half the lr (5e-5 -> 3e-5), between
# the proven 1x-width scratch lr and the proven continuation lr 3e-5.
bash tools/supervise_train.sh 3 \
  --presets $PRESETS \
  --set tower_filters=128 val_filters=256 \
        'value_lr={"__kind__":"LinearParameter","init_val":5e-5,"final_val":3e-5,"time_horizon":10000000}' \
  --run-id parity10m_r5f --steps 10000000 --n-envs 1024 --horizon 64 \
  --seed 0 --save-every 15 --log-every 5 \
  --league-every 15 --league-games 16 --league-anchor data/demo_weights \
  > data/r5f_train.log 2>&1
echo "r5f done rc=$?"
