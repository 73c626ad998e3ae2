#!/bin/bash
# Supervisor: relaunch `train --resume` on nonzero exit (transient backend
# failures — e.g. dropped remote-compile connections — must not end a
# multi-hour run).  Usage: supervise_train.sh <max_restarts> <train args...>
set -u
MAX=$1; shift
for i in $(seq 0 "$MAX"); do
  if [ "$i" -gt 0 ]; then
    echo "[supervisor] restart #$i (resuming) at $(date -u +%T)"; sleep 15
  fi
  python -m drl_tetris_tpu train "$@" --resume && exit 0
  echo "[supervisor] train exited nonzero at $(date -u +%T)"
done
echo "[supervisor] giving up after $MAX restarts"; exit 1
