#!/bin/bash
# Round-5 campaign v3.  Evidence so far: the mb256 recipe matches mb64 to
# 2.5M but DEGRADES by 10M (h2h_r5.json: final loses to its own 4-7M
# snapshots and 0-64 to the demo) — so the beat-the-demo chase continues
# from the strongest agent on record (parity10m_r4c's 10M final, still on
# disk) with the PFSP pool at the low constant lr that worked for r4d,
# while one ablation probes whether more epochs repair mb256's late-run
# degradation (fewer optimizer steps is the leading hypothesis).
set -u
cd "$(dirname "$0")/.."
PRESETS="default sventon sventon_ppo resblock experiment_sventon_ppo r5_learning"

echo "=== ab_r5_ep8: mb256 x 8 epochs, 5M ($(date -u +%T)) ==="
python -m drl_tetris_tpu train \
  --presets $PRESETS \
  --set n_train_epochs_per_update=8 \
        'value_lr={"__kind__":"LinearParameter","init_val":2e-4,"final_val":6e-5,"time_horizon":10000000}' \
  --run-id ab_r5_ep8 --steps 5000000 --n-envs 1024 --horizon 64 \
  --seed 0 --save-every 15 --log-every 5 \
  --league-every 10 --league-games 16 --league-anchor data/demo_weights \
  > data/ab_r5_ep8.log 2>&1
echo "ep8 rc=$?"

echo "=== parity10m_r5c: PFSP continuation from r4c final ($(date -u +%T)) ==="
# mb64 (the geometry that holds strength), constant 3e-5 (r4d's healthy
# choice), pool: demo + r4d-final seeds + own snapshots every 8 iters,
# variance-weighted draw.
bash tools/supervise_train.sh 3 \
  --presets $PRESETS \
  --set minibatch_size=64 'value_lr=3e-5' \
        pool_prob=0.3 pool_size=8 pool_every=8 pool_mode=pfsp \
  --run-id parity10m_r5c --steps 8000000 --n-envs 1024 --horizon 64 \
  --seed 2 --save-every 15 --log-every 5 \
  --league-every 15 --league-games 16 --league-anchor data/demo_weights \
  --init-from data/models/parity10m_r4c \
  --pool-seed data/demo_weights \
  --pool-seed data/models/parity10m_r4d \
  > data/r5c_train.log 2>&1
echo "r5c done rc=$?"

echo "=== h2h parity10m_r5c ($(date -u +%T)) ==="
python tools/h2h.py data/models/parity10m_r5c --vs data/demo_weights \
  --games 64 --out data/summaries/h2h_r5c.json > data/h2h_r5c.log 2>&1
echo "h2h r5c rc=$?"

echo "=== r5c final vs r4c/r4d finals ($(date -u +%T)) ==="
python -m drl_tetris_tpu eval data/models/parity10m_r5c \
  data/models/parity10m_r4c data/models/parity10m_r4d --games 64 \
  > data/h2h_r5c_vs_r4.log 2>&1
echo "campaign v3 complete"
