#!/bin/bash
# Round-5 main campaign, v2 (after the ab_r5_poolhot negative control:
# PFSP pool from scratch at the hot retuned lr drives collapse-recover-
# collapse oscillation — frozen opponents sharpen the policy much harder
# than live self-play).  Structure mirrors what worked in r4 (r4c -> r4d),
# at 2x speed:
#   1. parity10m_r5: PURE self-play 10M at the lrC recipe (healthy in the
#      2.5M sweep: floor-caught cliff at 655k, stable H~1.0-1.4 after).
#   2. gauntlet vs demo + own snapshots.
#   3. parity10m_r5b: 8M continuation at constant lr 1.2e-4 (the schedule
#      floor; the linear-scaled analog of r4d's 3e-5-at-mb64) with the
#      PFSP pool: demo seed + own snapshots every 524k.
#   4. gauntlet r5b + r5-vs-r5b.
set -u
cd "$(dirname "$0")/.."
PRESETS="default sventon sventon_ppo resblock experiment_sventon_ppo r5_learning"

echo "=== flagship parity10m_r5 ($(date -u +%T)) ==="
bash tools/supervise_train.sh 3 \
  --presets $PRESETS \
  --run-id parity10m_r5 --steps 10000000 --n-envs 1024 --horizon 64 \
  --seed 0 --save-every 15 --log-every 5 \
  --league-every 15 --league-games 16 --league-anchor data/demo_weights \
  > data/r5_train.log 2>&1
echo "flagship done rc=$?"

echo "=== h2h parity10m_r5 ($(date -u +%T)) ==="
python tools/h2h.py data/models/parity10m_r5 --vs data/demo_weights \
  --games 64 --out data/summaries/h2h_r5.json > data/h2h_r5.log 2>&1
echo "h2h r5 rc=$?"

echo "=== continuation parity10m_r5b ($(date -u +%T)) ==="
bash tools/supervise_train.sh 3 \
  --presets $PRESETS \
  --set pool_prob=0.3 pool_size=8 pool_every=8 pool_mode=pfsp \
        'value_lr=1.2e-4' \
  --run-id parity10m_r5b --steps 8000000 --n-envs 1024 --horizon 64 \
  --seed 1 --save-every 15 --log-every 5 \
  --league-every 15 --league-games 16 --league-anchor data/demo_weights \
  --init-from data/models/parity10m_r5 \
  --pool-seed data/demo_weights \
  > data/r5b_train.log 2>&1
echo "r5b done rc=$?"

echo "=== h2h parity10m_r5b ($(date -u +%T)) ==="
python tools/h2h.py data/models/parity10m_r5b --vs data/demo_weights \
  --games 64 --out data/summaries/h2h_r5b.json > data/h2h_r5b.log 2>&1
echo "h2h r5b rc=$?"

echo "=== r5 final vs r5b final ($(date -u +%T)) ==="
python -m drl_tetris_tpu eval data/models/parity10m_r5 \
  data/models/parity10m_r5b --games 64 > data/h2h_r5_vs_r5b.log 2>&1
echo "campaign complete"
