"""Head-to-head gauntlet: a run's FINAL checkpoint vs every earlier
snapshot and (optionally) an external baseline checkpoint.

The r2 regression evidence was exactly this gauntlet failing (the 10M
checkpoint losing 54/64 to the 6M demo, LEARNING_r02.json); the r3
done-bar is the final checkpoint beating every earlier snapshot at >= 55%
and beating the baseline (VERDICT r2 item 3).

Usage:
  python tools/h2h.py data/models/parity10m_r3 [--vs data/demo_weights]
      [--games 64] [--out H2H.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--vs", default=None)
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from drl_tetris_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from drl_tetris_tpu.cli.main import _load_agent
    from drl_tetris_tpu.config.presets import load
    from drl_tetris_tpu.runtime import checkpoint as ckpt
    from drl_tetris_tpu.runtime.evaluate import EvalAgent, play_match

    import jax.numpy as jnp

    cfg = load()
    steps = sorted(int(d) for d in os.listdir(args.run_dir) if d.isdigit())
    final_step = steps[-1]
    # _load_agent reconstructs net+settings and restores the LATEST step
    final, fcfg = _load_agent(args.run_dir, cfg)
    env_cfg = fcfg.env

    def snapshot_params(step):
        raw = ckpt.restore_raw(args.run_dir, step=step)
        raw_params = raw.get("params", raw) if isinstance(raw, dict) else raw
        return jax.tree.map(
            lambda ref, v: jnp.asarray(v, ref.dtype).reshape(ref.shape),
            final.params, raw_params)

    results = {}

    def duel(name, opp):
        # hash() is salted per process (PYTHONHASHSEED); a sha1 digest keeps
        # the gauntlet reproducible across invocations with a fixed --seed.
        # Games are spread over several independent seed pairs: with
        # deterministic (argmax) agents, outcomes WITHIN one reset batch
        # are correlated (measured r5: two 32-game batches jointly hit 73%
        # where the 768-game rate is ~35% — docs/NOTES_ROUND5.md), so a
        # single-pair estimate carries far more than binomial variance.
        import hashlib
        h = int(hashlib.sha1(name.encode()).hexdigest(), 16) % 1000
        pairs = max(1, min(4, args.games // 16))
        per = max(1, args.games // (2 * pairs))
        wins = losses = und = 0
        for k in range(pairs):
            base = args.seed + h + 2 * k
            w_a, w_b, u = play_match(env_cfg, (final, opp), n_games=per,
                                     seed=base)
            w2_b, w2_a, u2 = play_match(env_cfg, (opp, final), n_games=per,
                                        seed=base + 1)
            wins += int(w_a + w2_a)
            losses += int(w_b + w2_b)
            und += int(u + u2)
        results[name] = {
            "final_wins": wins, "final_losses": losses,
            "undecided": und,
            "final_winrate_decided": (round(wins / max(wins + losses, 1), 3)),
        }
        print(f"final vs {name}: {wins}-{losses} "
              f"({results[name]['final_winrate_decided']:.0%} of decided)",
              flush=True)

    for s in steps[:-1]:
        snap = EvalAgent(name=f"step_{s}", params=snapshot_params(s),
                         net=final.net, distribution=final.distribution,
                         kind=final.kind)
        duel(f"step_{s}", snap)

    if args.vs:
        base, bcfg = _load_agent(args.vs, cfg)
        # cross-checkpoint compatibility (tools/utils.py:54-64 game_size
        # equality; VERDICT r4 item 6)
        from drl_tetris_tpu.cli.main import _check_compat
        _check_compat([fcfg, bcfg])
        duel(os.path.basename(args.vs.rstrip("/")), base)

    out = {"run_dir": args.run_dir, "final_step": final_step,
           "games_per_pair": args.games, "results": results,
           "all_beaten_55pct": all(
               r["final_winrate_decided"] >= 0.55 for r in results.values())}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
