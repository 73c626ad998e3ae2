"""Export a training run's latest checkpoint as shippable demo weights.

The full train-state checkpoint carries optimizer moments and env state
(~3x the params).  Demo weights only need the params subtree plus the
settings side-file and the run's Elo history — the same triple the
reference distributes (README.md:76 pre-trained weights, the
weights<->settings pairing of sventon_agent_base.py:116-129).

Usage:
  python tools/export_demo_weights.py data/models/parity10m \
      [--out data/demo_weights]

Runs on CPU; no TPU needed.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default="data/demo_weights")
    ap.add_argument("--step", type=int, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    from drl_tetris_tpu.runtime import checkpoint as ckpt

    step = args.step or ckpt.latest_step(args.run_dir)
    if step is None:
        sys.exit(f"no checkpoint in {args.run_dir}")
    raw = ckpt.restore_raw(args.run_dir, step)
    params = raw.get("params", raw) if isinstance(raw, dict) else raw

    out = os.path.abspath(args.out)
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    with ocp.CheckpointManager(
            out, options=ocp.CheckpointManagerOptions(max_to_keep=None)) as m:
        m.save(step, args=ocp.args.StandardSave({"params": params}))
        m.wait_until_finished()

    for side in ("settings.json", "elo_history.jsonl"):
        src = os.path.join(args.run_dir, side)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out, side))

    n = sum(x.size for x in jax.tree.leaves(params))
    print(json.dumps({"out": out, "step": step, "n_params": int(n)}))


if __name__ == "__main__":
    main()
