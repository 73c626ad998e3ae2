#!/bin/bash
# Campaign v5: third PFSP continuation (r5d -> r5e).  Each 8M PFSP
# continuation has added ~4-6pp vs the fixed demo baseline (25 -> 30 ->
# 35.9 -> 39.1%); self-play strength is saturated (r5d ~even with r5c
# and its own snapshots) but demo exploitation keeps compounding.
set -u
cd "$(dirname "$0")/.."
PRESETS="default sventon sventon_ppo resblock experiment_sventon_ppo r5_learning"

echo "=== parity10m_r5e: PFSP continuation from r5d final ($(date -u +%T)) ==="
bash tools/supervise_train.sh 3 \
  --presets $PRESETS \
  --set minibatch_size=64 'value_lr=3e-5' \
        pool_prob=0.3 pool_size=8 pool_every=8 pool_mode=pfsp \
  --run-id parity10m_r5e --steps 8000000 --n-envs 1024 --horizon 64 \
  --seed 4 --save-every 15 --log-every 5 \
  --league-every 15 --league-games 16 --league-anchor data/demo_weights \
  --init-from data/models/parity10m_r5d \
  --pool-seed data/demo_weights \
  --pool-seed data/models/parity10m_r5c \
  --pool-seed data/models/parity10m_r4d \
  > data/r5e_train.log 2>&1
echo "r5e done rc=$?"

echo "=== h2h parity10m_r5e ($(date -u +%T)) ==="
python tools/h2h.py data/models/parity10m_r5e --vs data/demo_weights \
  --games 64 --out data/summaries/h2h_r5e.json > data/h2h_r5e.log 2>&1
echo "h2h r5e rc=$?"
echo "campaign v5 complete"
