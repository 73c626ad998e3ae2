#!/bin/bash
# Campaign v4: second PFSP continuation (r5c -> r5d), same recipe that
# produced the 30% -> 35.9%-vs-demo step, new seed, pool seeded with the
# demo plus BOTH strong finals (r4c, r4d) for opponent diversity.
set -u
cd "$(dirname "$0")/.."
PRESETS="default sventon sventon_ppo resblock experiment_sventon_ppo r5_learning"

echo "=== parity10m_r5d: PFSP continuation from r5c final ($(date -u +%T)) ==="
bash tools/supervise_train.sh 3 \
  --presets $PRESETS \
  --set minibatch_size=64 'value_lr=3e-5' \
        pool_prob=0.3 pool_size=8 pool_every=8 pool_mode=pfsp \
  --run-id parity10m_r5d --steps 8000000 --n-envs 1024 --horizon 64 \
  --seed 3 --save-every 15 --log-every 5 \
  --league-every 15 --league-games 16 --league-anchor data/demo_weights \
  --init-from data/models/parity10m_r5c \
  --pool-seed data/demo_weights \
  --pool-seed data/models/parity10m_r4c \
  --pool-seed data/models/parity10m_r4d \
  > data/r5d_train.log 2>&1
echo "r5d done rc=$?"

echo "=== h2h parity10m_r5d ($(date -u +%T)) ==="
python tools/h2h.py data/models/parity10m_r5d --vs data/demo_weights \
  --games 64 --out data/summaries/h2h_r5d.json > data/h2h_r5d.log 2>&1
echo "h2h r5d rc=$?"

echo "=== r5d final vs r5c final ($(date -u +%T)) ==="
python -m drl_tetris_tpu eval data/models/parity10m_r5d \
  data/models/parity10m_r5c --games 64 > data/h2h_r5d_vs_r5c.log 2>&1
echo "campaign v4 complete"
