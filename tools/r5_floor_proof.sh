#!/bin/bash
# Entropy-floor guard validation (VERDICT r4 item 7): repeat the r4
# cliff-collapse recipe — ab_r4_B's exact geometry and settings (512x72
# mb64, clean recipe + lr decay, seed 0; entropy cliff-collapsed 2.7 ->
# 0.001 at ~1.6M, ratings cratered) — WITH the standalone entropy floor
# on.  The guard is validated iff losses/entropy_floor_penalty fires and
# the collapse mode is blocked (entropy holds >= ~0.4 nats).
set -u
cd "$(dirname "$0")/.."
PRESETS="default sventon sventon_ppo resblock experiment_sventon_ppo r4_learning"
python -m drl_tetris_tpu train \
  --presets $PRESETS \
  --set entropy_floor_standalone=10 ppo_epsilon=0.05 \
  --run-id ab_r5_floorproof --steps 2500000 --n-envs 512 --horizon 72 \
  --seed 0 --save-every 20 --log-every 5 \
  --league-every 10 --league-games 16 --league-anchor data/demo_weights \
  > data/ab_r5_floorproof.log 2>&1
echo "floorproof done rc=$?"
