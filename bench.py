"""Benchmark: env-steps/s on one chip, 4096 boards (BASELINE.json config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 5M env-steps/s target from BASELINE.md
(the reference publishes no numbers; its Python-loop vector env on the dev
box is ~1e4 steps/s per worker by construction).

The measured program is the real rollout hot path: vectorized two-player
macro-action engine steps with auto-reset, actions drawn uniformly at
random on-device (no NN, matching the 'random policy' benchmark config),
stepped under one jitted lax.scan so no host round-trips are counted.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def bench_xla(cfg, n_games, n_iters):
    """env-steps/s of the XLA scan path (env.step under one jitted scan)."""
    from drl_tetris_tpu.env.env import TetrisVectorEnv

    env = TetrisVectorEnv(cfg, n_games)
    st = env.reset(jax.random.PRNGKey(0))

    def body(carry, key):
        st = carry
        kr, kt = jax.random.split(key)
        r = jax.random.randint(kr, (n_games,), 0, 4)
        t = jax.random.randint(kt, (n_games,), 0, cfg.engine.width)
        st, _, _ = env.step(st, r, t)
        return st, ()

    @jax.jit
    def run(st, key):
        keys = jax.random.split(key, n_iters)
        st, _ = jax.lax.scan(body, st, keys)
        return st

    # compile + warmup.  NOTE: a scalar device->host readback is the sync
    # point — jax.block_until_ready over the axon TPU tunnel can return
    # before the computation finishes, silently inflating the measurement
    # ~70x; a value fetch cannot lie.
    st = run(st, jax.random.PRNGKey(1))
    sync = float(st.rounds_played.sum())
    t0 = time.perf_counter()
    st = run(st, jax.random.PRNGKey(2))
    sync = float(st.rounds_played.sum())
    dt = time.perf_counter() - t0
    assert sync > 0.0
    return n_games * n_iters / dt


def bench_pallas(cfg, n_games, n_iters, block_games=None):
    """env-steps/s of the Pallas whole-rollout kernel (state in VMEM for
    all n_iters ticks; engine/pallas_tick.py).  Bit-exactness with the XLA
    path is gated by tests/test_pallas_tick.py."""
    from drl_tetris_tpu.engine.pallas_tick import rollout_pallas
    from drl_tetris_tpu.env.env import TetrisVectorEnv

    env = TetrisVectorEnv(cfg, n_games)
    st = env.reset(jax.random.PRNGKey(0))
    bg = block_games or min(1024, n_games)

    def run(st, seed):
        return rollout_pallas(cfg, st, n_iters,
                              base_key=jax.random.key_data(
                                  jax.random.PRNGKey(seed)),
                              block_games=bg)

    st = run(st, 1)
    sync = float(st.rounds_played.sum())
    t0 = time.perf_counter()
    st = run(st, 2)
    sync = float(st.rounds_played.sum())
    dt = time.perf_counter() - t0
    assert sync > 0.0
    return n_games * n_iters / dt


def main():
    from drl_tetris_tpu import enable_compilation_cache
    enable_compilation_cache()
    # 2000 ticks per dispatch: the axon tunnel costs ~30 ms fixed latency
    # per jitted call, which at 200 ticks was 35% of the measurement; the
    # metric is sustained throughput, not tunnel round-trip.
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_games = int(args[0]) if args else 4096
    n_iters = int(args[1]) if len(args) > 1 else 2000

    from drl_tetris_tpu.env.env import EnvConfig

    cfg = EnvConfig()

    # Engine headline: best of the two equivalent rollout programs.  The
    # Pallas kernel keeps state in VMEM across ticks; the XLA scan is the
    # portable fallback.  --xla / --pallas force one path.
    xla_sps = pallas_sps = None
    if "--pallas" not in sys.argv:
        xla_sps = bench_xla(cfg, n_games, n_iters)
    if "--xla" not in sys.argv:
        try:
            pallas_sps = bench_pallas(cfg, n_games, n_iters)
        except Exception as e:
            print(f"pallas bench failed: {e}", file=sys.stderr)
    steps_per_s = max(s for s in (xla_sps, pallas_sps) if s is not None)
    baseline = 5_000_000.0

    # Secondary metric: NN-in-the-loop training throughput (standalone
    # SVENton-PPO iteration at reference model scale — policy forward every
    # tick + GAE + 4 PPO epochs), so learner-path regressions are
    # driver-visible (VERDICT r1 weak item 5; reference anecdote ~1.2k
    # samples/s learner-side, README.md:112).
    train_sps = None
    if "--no-train" not in sys.argv:
        try:
            train_sps = bench_training()
        except Exception as e:
            print(f"train bench failed: {e}", file=sys.stderr)

    out = {
        "metric": "env_steps_per_s_4096_boards",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / baseline, 4),
    }
    if xla_sps is not None:
        out["xla_env_steps_per_s"] = round(xla_sps, 1)
    if pallas_sps is not None:
        out["pallas_env_steps_per_s"] = round(pallas_sps, 1)
    if train_sps is not None:
        out["train_env_steps_per_s_512_envs"] = round(train_sps, 1)
    print(json.dumps(out))


def bench_training(n_envs: int = 512, horizon: int = 72, iters: int = 3):
    """Env-steps/s of the fused standalone PPO iteration (rollout + GAE +
    update as one dispatch) at the 10M-run shape."""
    from drl_tetris_tpu.runtime.standalone import (
        StandaloneConfig, StandaloneTrainer)

    tr = StandaloneTrainer(StandaloneConfig(n_envs=n_envs, horizon=horizon))
    tr.train_iteration()                     # compile + warmup
    float(tr.env_state.engine.players.piece.sum())   # true sync (see above)
    t0 = time.perf_counter()
    for _ in range(iters):
        tr.train_iteration()
    float(tr.env_state.engine.players.piece.sum())
    dt = time.perf_counter() - t0
    return n_envs * horizon * iters / dt


if __name__ == "__main__":
    main()
