"""bf16-vs-f32 learning A/B (closes the r2 NOTES debt).

Two standalone SVENton-PPO runs, identical seed and shape, differing only
in ModelConfig.compute_dtype; logs entropy/loss trajectories and finishes
with a head-to-head match.  Prints one JSON line for docs/NOTES_ROUND3.md.

Usage: python tools/ab_bf16.py [total_steps] [n_envs] [horizon]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def run_one(dtype, total_steps, n_envs, horizon):
    import dataclasses
    from drl_tetris_tpu.models.nets import ModelConfig
    from drl_tetris_tpu.algos.ppo import PPOConfig
    from drl_tetris_tpu.runtime.standalone import (
        StandaloneConfig, StandaloneTrainer)

    cfg = StandaloneConfig(
        model=ModelConfig(compute_dtype=dtype),
        ppo=PPOConfig(lr=1e-4, minibatch_size=512),
        n_envs=n_envs, horizon=horizon, seed=0)
    tr = StandaloneTrainer(cfg)
    curve = []
    t0 = time.time()
    while tr.total_steps < total_steps:
        stats = tr.train_iteration()
        if len(curve) == 0 or tr.total_steps // (total_steps // 8) > len(curve) - 1:
            curve.append({"step": tr.total_steps,
                          "entropy": round(float(stats["entropy/entropy"]), 4),
                          "loss": round(float(stats["losses/total_loss"]), 5)})
    dt = time.time() - t0
    return tr, curve, round(tr.total_steps / dt, 1)


def main():
    from drl_tetris_tpu import enable_compilation_cache
    enable_compilation_cache()
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    horizon = int(sys.argv[3]) if len(sys.argv) > 3 else 72

    tr_bf, curve_bf, sps_bf = run_one("bfloat16", total, n_envs, horizon)
    tr_f32, curve_f32, sps_f32 = run_one("float32", total, n_envs, horizon)

    # head-to-head: bf16-trained vs f32-trained checkpoints
    from drl_tetris_tpu.env.env import EnvConfig
    from drl_tetris_tpu.runtime.evaluate import EvalAgent, play_match
    a = EvalAgent(name="bf16", params=tr_bf.state.params, net=tr_bf.net,
                  distribution="argmax", kind="macro")
    b = EvalAgent(name="f32", params=tr_f32.state.params, net=tr_f32.net,
                  distribution="argmax", kind="macro")
    w_bf, w_f32, und = play_match(EnvConfig(), (a, b), n_games=32, seed=11)
    w2_f32, w2_bf, und2 = play_match(EnvConfig(), (b, a), n_games=32, seed=12)

    print(json.dumps({
        "total_steps": total, "shape": f"{n_envs}x{horizon} mb512 lr1e-4",
        "bf16": {"curve": curve_bf, "env_steps_per_s": sps_bf},
        "f32": {"curve": curve_f32, "env_steps_per_s": sps_f32},
        "head_to_head_bf16_wins": int(w_bf + w2_bf),
        "head_to_head_f32_wins": int(w_f32 + w2_f32),
        "undecided": int(und + und2),
    }))


if __name__ == "__main__":
    main()
