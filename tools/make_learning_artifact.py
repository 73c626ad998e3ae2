"""Assemble the learning-parity artifact (LEARNING_r{N}.json).

Collects a training run's Elo curve (elo_history.jsonl written by
runtime/league.py during `train --league-every`), the run settings, and an
optional head-to-head result vs a baseline checkpoint into one JSON file —
the evidence for BASELINE.md row 3 (the reference's 10M-step SVENton-PPO
run, /root/reference/README.md:43).

Usage:
  python tools/make_learning_artifact.py data/models/parity10m \
      [--vs data/demo_weights --games 64] [--out LEARNING_r02.json]

The --vs match plays the run's final checkpoint against another checkpoint
with `runtime/evaluate.round_robin` (needs the TPU/devices; omit for a
curve-only artifact).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

# Runnable as `python tools/make_learning_artifact.py` from anywhere: the
# interpreter puts tools/ (not the repo root) on sys.path for direct script
# invocation, so add the parent explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_curve(run_dir):
    path = os.path.join(run_dir, "elo_history.jsonl")
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--vs", default=None,
                    help="checkpoint dir to play the final snapshot against")
    ap.add_argument("--also", default=None,
                    help="second run dir whose curve is embedded alongside "
                         "(e.g. the hot-lr demo run next to the canonical "
                         "reference-config run)")
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="LEARNING.json")
    args = ap.parse_args()

    entries = load_curve(args.run_dir)
    if not entries:
        sys.exit(f"no elo history in {args.run_dir}")
    final = entries[-1]
    final_elo = final["ratings"].get(final["snapshot"])
    anchor_elo = final["ratings"].get("random", 1000.0)

    settings = None
    sp = os.path.join(args.run_dir, "settings.json")
    if os.path.exists(sp):
        with open(sp) as f:
            settings = json.load(f)

    out = {
        "run_dir": args.run_dir,
        "total_steps": final["step"],
        "snapshots": len(entries),
        "final_elo": final_elo,
        "anchor_elo": anchor_elo,
        "elo_vs_random": (None if final_elo is None
                          else final_elo - anchor_elo),
        "curve": [{"step": e["step"],
                   "elo": e["ratings"].get(e["snapshot"])} for e in entries],
        "final_ratings": final["ratings"],
        "settings": settings,
    }

    if args.also:
        e2 = load_curve(args.also)
        f2 = e2[-1]
        s2 = None
        sp2 = os.path.join(args.also, "settings.json")
        if os.path.exists(sp2):
            with open(sp2) as f:
                s2 = json.load(f)
        out["also_run"] = {
            "run_dir": args.also,
            "total_steps": f2["step"],
            "snapshots": len(e2),
            "final_elo": f2["ratings"].get(f2["snapshot"]),
            "anchor_elo": f2["ratings"].get("random", 1000.0),
            "curve": [{"step": e["step"],
                       "elo": e["ratings"].get(e["snapshot"])} for e in e2],
            "settings": s2,
        }

    if args.vs:
        from drl_tetris_tpu.cli.main import _check_compat, _load_agent
        from drl_tetris_tpu.config.presets import load
        from drl_tetris_tpu.runtime.evaluate import round_robin

        cfg = load(["default", "sventon", "sventon_ppo", "resblock",
                    "experiment_sventon_ppo"], {})
        ours, cfg_a = _load_agent(args.run_dir, cfg, name="ours")
        theirs, cfg_b = _load_agent(args.vs, cfg, name="baseline")
        _check_compat([cfg_a, cfg_b])
        board = round_robin(cfg_a.env, [ours, theirs],
                            games_per_pair=args.games, seed=args.seed)
        wins = board.wins.get(("ours", "baseline"), 0)
        losses = board.wins.get(("baseline", "ours"), 0)
        played = wins + losses
        out["vs_baseline_checkpoint"] = {
            "baseline": args.vs,
            "games": played,
            "wins": wins,
            "losses": losses,
            "win_rate": (wins / played) if played else None,
        }

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("curve", "settings")}, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
