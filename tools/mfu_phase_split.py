"""Split the fused training iteration's wall-clock into rollout vs update
and A/B the compute dtype — the diagnostic behind the ~43.7% MFU plateau
(docs/NOTES_ROUND5.md): past mb256 the update phase stops being
minibatch-bound, so whatever holds the plateau must be phase-level.

Usage: python tools/mfu_phase_split.py [n_envs] [horizon] [minibatch]
Prints one JSON line per (phase, dtype).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drl_tetris_tpu import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def measure(n_envs, horizon, minibatch, dtype):
    from drl_tetris_tpu.algos.ppo import PPOConfig
    from drl_tetris_tpu.models.nets import ModelConfig
    from drl_tetris_tpu.runtime.standalone import (
        StandaloneConfig, StandaloneTrainer)

    cfg = StandaloneConfig(
        n_envs=n_envs, horizon=horizon,
        model=ModelConfig(compute_dtype=dtype),
        ppo=PPOConfig(minibatch_size=minibatch))
    tr = StandaloneTrainer(cfg)
    key = jax.random.PRNGKey(0)

    def sync(x):
        return float(jnp.asarray(jax.tree.leaves(x)[0]).ravel()[0].astype(
            jnp.float32))

    # rollout phase alone
    roll = jax.jit(lambda p, st, k: tr.rollout(p, st, k))
    st, seg, v_last = roll(tr.state.params, tr.env_state, key)
    sync(seg.piece)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        st, seg, v_last = roll(tr.state.params, st,
                               jax.random.fold_in(key, i))
    sync(seg.piece)
    t_roll = (time.perf_counter() - t0) / iters

    # update phase alone (fixed batch)
    from drl_tetris_tpu.algos.ppo import segment_to_batch
    batch, _ = jax.jit(lambda s, v: segment_to_batch(cfg.ppo, s, v))(
        seg, v_last)
    state, stats = tr.update(tr.state, batch, key)
    sync(stats["losses/total_loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, stats = tr.update(state, batch, jax.random.fold_in(key, i))
    sync(stats["losses/total_loss"])
    t_upd = (time.perf_counter() - t0) / iters

    # fused iteration (reference number)
    tr.train_iteration()
    t0 = time.perf_counter()
    for _ in range(iters):
        tr.train_iteration()
    sync(tr.env_state.engine.players.piece)
    t_fused = (time.perf_counter() - t0) / iters

    sps = n_envs * horizon
    print(json.dumps({
        "dtype": dtype, "recipe": f"{n_envs}x{horizon} mb{minibatch}",
        "rollout_s": round(t_roll, 3), "update_s": round(t_upd, 3),
        "fused_s": round(t_fused, 3),
        "fused_env_steps_per_s": round(sps / t_fused, 1),
    }), flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]] or []
    n_envs = args[0] if len(args) > 0 else 1024
    horizon = args[1] if len(args) > 1 else 64
    mb = args[2] if len(args) > 2 else 256
    for dtype in ("bfloat16", "float32"):
        measure(n_envs, horizon, mb, dtype)
