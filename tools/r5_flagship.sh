#!/bin/bash
# Round-5 flagship: 10M steps at the chip-speed recipe (r5_learning:
# 1024x64 mb256, lr 4e-4 -> 1.2e-4, entropy floor) with the PFSP
# opponent pool — the valid pool experiment r4 skipped (VERDICT r4 item
# 1): snapshots every 8 iterations (524k steps, engaging from ~0.5M),
# pool_size 8, pool_prob 0.25, variance-weighted opponent draw, and the
# 6M demo seeded into the pool from iteration 0 (safe under PFSP: a
# hopeless opponent gets the floor weight until the learner starts
# taking games off it — the r4b zero-signal failure mode cannot occur).
set -u
cd "$(dirname "$0")/.."
PRESETS="default sventon sventon_ppo resblock experiment_sventon_ppo r5_learning"
bash tools/supervise_train.sh 3 \
  --presets $PRESETS \
  --set pool_prob=0.25 pool_size=8 pool_every=8 pool_mode=pfsp \
  --run-id parity10m_r5 --steps 10000000 --n-envs 1024 --horizon 64 \
  --seed 0 --save-every 15 --log-every 5 \
  --league-every 15 --league-games 16 --league-anchor data/demo_weights \
  --pool-seed data/demo_weights \
  > data/r5_train.log 2>&1
echo "flagship done rc=$?"
