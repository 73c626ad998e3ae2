"""Round-robin evaluation: checkpoints play each other head-to-head.

Port of scripts/eval.py:70-208: load >= 1 set of weights, pair agents,
alternate turns in the two-player env, record winners on a scoreboard,
optionally render.  Batched: every pair plays n_games vectorized matches
with seat sides split 50/50 (the reference randomizes pairing per round,
eval.py:53-68).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv
from drl_tetris_tpu.algos.rollout import make_policy_fn
from drl_tetris_tpu.utils.scoreboard import Scoreboard
from drl_tetris_tpu.utils.render import render_ansi


@dataclasses.dataclass
class EvalAgent:
    name: str
    params: object
    net: object
    distribution: str = "argmax"   # eval_distribution (presets.py:128)
    # "macro": action-head nets emitting the (r, t) macro (SVENton/QNet);
    # "world_model"/"world_model_full": value-only nets acting by one-ply
    # search over legal placements (SIXten's VNet) — stepped with
    # column-targeted placements / exact pose locks;
    # "sherlock"/"sherlock_full": delta-PPO nets acting via phi·delta
    # placement probabilities (same step interfaces).
    kind: str = "macro"
    epsilon: float = 0.05          # for epsilon-distributions (1.0 = random)


import functools


@functools.lru_cache(maxsize=32)
def _match_fns(env_cfg: EnvConfig, n_games: int, net0, dist0, kind0, eps0,
               net1, dist1, kind1, eps1):
    """Cache the jitted per-tick match function per (env, nets, dists) so a
    round-robin doesn't recompile for every pairing (flax Modules are
    hashable frozen dataclasses)."""
    env = TetrisVectorEnv(env_cfg, n_games)

    def make_pol(net, dist, kind, eps):
        if kind in ("world_model", "world_model_full"):
            from drl_tetris_tpu.algos.sixten import make_sixten_policy
            d = {"pi": "boltzmann", "argmax": "argmax",
                 "epsilon": "epsilon"}.get(dist, dist)
            space = "full" if kind == "world_model_full" else "top_drop"
            return make_sixten_policy(env, net, distribution=d, epsilon=eps,
                                      action_space=space)
        if kind in ("sherlock", "sherlock_full"):
            from drl_tetris_tpu.algos.sherlock import make_sherlock_policy
            space = "full" if kind == "sherlock_full" else "top_drop"
            return make_sherlock_policy(env, net, distribution=dist,
                                        epsilon=eps, action_space=space)
        return make_policy_fn(env, net, dist, epsilon=eps)

    p0 = make_pol(net0, dist0, kind0, eps0)
    p1 = make_pol(net1, dist1, kind1, eps1)

    def make_probe(net, kind):
        """Eval-time NN visualization (scripts/eval.py:17-28): per-tick
        policy entropy over the acting piece's (r, t) plane + its piece
        value, for the rendered game.  Probability-map heads only (PPO pi);
        value/Q agents return None and render boards without bars."""
        if kind != "macro":
            return None
        from drl_tetris_tpu.algos.rollout import policy_inputs

        @jax.jit
        def probe(params, st):
            obs = env.observe(st)
            vec, vis = policy_inputs(obs)
            out = net.apply(params, vec, vis)
            if len(out) != 2:
                return None
            pi, v = out                        # (N, 4, W, 7), (N, 7)
            piece = obs.piece[0, 0]
            ppi = pi[0, :, :, piece]
            p = ppi / jnp.maximum(ppi.sum(), 1e-8)
            ent = -jnp.sum(p * jnp.log(p + 1e-8))
            max_ent = jnp.log(jnp.float32(ppi.size))
            v_p = v[0, piece] if v.shape[-1] > 1 else v[0, 0]
            return ent, max_ent, v_p
        return probe

    probes = (make_probe(net0, kind0), make_probe(net1, kind1))
    # placement-action agents (step_place) vs exact-pose agents (step_pose)
    wm = (kind0 in ("world_model", "sherlock"),
          kind1 in ("world_model", "sherlock"))
    fp = (kind0 in ("world_model_full", "sherlock_full"),
          kind1 in ("world_model_full", "sherlock_full"))
    # every pairing of {macro, top-drop placement, full pose} dispatches
    # per game below; the pose-vs-place combo goes through
    # env.step_mixed_place_pose (r2 VERDICT item 9)

    @jax.jit
    def tick(params0, params1, st, key):
        k0, k1 = jax.random.split(key)

        def act(p, params, k, is_full):
            if is_full:
                _, _, r, c, y, *_ = p(params, st, k)
                return r, c, y
            _, _, r, t, *_ = p(params, st, k)
            return r, t, jnp.zeros_like(r)
        r0, t0, y0 = act(p0, params0, k0, fp[0])
        r1, t1, y1 = act(p1, params1, k1, fp[1])
        mine = st.current_player == 0
        r = jnp.where(mine, r0, r1)
        t = jnp.where(mine, t0, t1)
        y = jnp.where(mine, y0, y1)
        if all(fp):
            return env.step_pose(st, r, t, y)
        if any(fp) and any(wm):
            use_pose = jnp.where(mine, fp[0], fp[1])
            return env.step_mixed_place_pose(st, use_pose, r, t, y)
        if any(fp):
            use_pose = jnp.where(mine, fp[0], fp[1])
            return env.step_mixed_pose(st, use_pose, r, t, y)
        if not any(wm):
            return env.step(st, r, t)
        if all(wm):
            return env.step_place(st, r, t)
        use_place = jnp.where(mine, wm[0], wm[1])
        return env.step_mixed(st, use_place, r, t)

    @functools.partial(jax.jit, static_argnums=(4,))
    def ticks(params0, params1, st, key, n: int = 16):
        def body(c, k):
            st = c
            st, _, done = tick(params0, params1, st, k)
            return st, done
        keys = jax.random.split(key, n)
        st, dones = jax.lax.scan(body, st, keys)
        return st, dones

    return env, tick, ticks, probes


def play_match(env_cfg: EnvConfig, agents: Tuple[EvalAgent, EvalAgent],
               n_games: int = 16, max_ticks: int = 2000, seed: int = 0,
               render: bool = False, pygame: bool = False
               ) -> Tuple[int, int, int]:
    """agents[0] sits as player 0 in every game.  Returns (wins0, wins1,
    unfinished).  ``pygame=True`` additionally opens the window renderer
    with pause-on-keypress (draw_tetris.py:103-143 semantics)."""
    sig = tuple(x for a in agents
                for x in (a.net, a.distribution, a.kind, a.epsilon))
    env, tick, ticks, probes = _match_fns(env_cfg, n_games, *sig)
    pg_renderer = None
    if pygame:
        from drl_tetris_tpu.utils.render import get_pygame_renderer
        pg_renderer = get_pygame_renderer()
        render = True
    st = env.reset(jax.random.PRNGKey(seed))
    key = jax.random.PRNGKey(seed + 1)
    finished = np.zeros(n_games, bool)
    winner = np.full(n_games, -1)
    # Rendering wants tick granularity; headless runs batch 8 ticks per
    # dispatch (rounds cannot finish twice within 8 ticks, so the winner of
    # a game's first finished round is still attributed correctly).
    chunk = 1 if render else 8
    for i in range(0, max_ticks, chunk):
        key, k = jax.random.split(key)
        if chunk == 1:
            st, _, done = tick(agents[0].params, agents[1].params, st, k)
            d = np.asarray(done)
        else:
            st, dones = ticks(agents[0].params, agents[1].params, st, k, chunk)
            d = np.asarray(dones).any(axis=0)
        w = np.asarray(env.get_winner(st))
        newly = d & ~finished
        winner[newly] = w[newly]
        finished |= d
        if render:
            frame = render_ansi(env_cfg.engine, jax.tree.map(
                lambda a: a[:1], st.engine), max_games=1,
                titles=[agents[0].name, agents[1].name])
            # per-action NN visuals (scripts/eval.py:17-28): entropy bar
            # over the acting piece's (r, t) plane + piece value, one line
            # per probability-map agent, indented by seat like the
            # reference's per-player columns
            from drl_tetris_tpu.utils.render import progress_bar
            lines = []
            for seat, (agent, probe) in enumerate(zip(agents, probes)):
                if probe is None:
                    continue
                res = probe(agent.params, st)
                if res is None:
                    continue
                ent, max_ent, v_p = (float(x) for x in res)
                lines.append(" " * (30 * seat)
                             + progress_bar(ent, max_ent)
                             + f" H={ent:.2f} v={v_p:+.3f} {agent.name}")
            print("\x1b[2J\x1b[H" + frame
                  + ("\n" + "\n".join(lines) if lines else ""))
            if pg_renderer is not None:
                from drl_tetris_tpu.utils.render import field_arrays
                eng0 = jax.tree.map(lambda a: a[0], st.engine)
                arr = field_arrays(env_cfg.engine, eng0)   # (1, P, H, W)
                pg_renderer.draw_all_fields(arr, pause_on_event=True)
        if finished.all():
            break
    wins0 = int((winner == 0).sum())
    wins1 = int((winner == 1).sum())
    return wins0, wins1, int((~finished).sum())


def round_robin(env_cfg: EnvConfig, agents: Sequence[EvalAgent],
                games_per_pair: int = 16, seed: int = 0,
                render: bool = False) -> Scoreboard:
    """All-pairs tournament with seat sides swapped halfway."""
    board = Scoreboard([a.name for a in agents])
    half = max(games_per_pair // 2, 1)
    for a, b in itertools.combinations(range(len(agents)), 2):
        for (p0, p1) in ((a, b), (b, a)):
            w0, w1, undecided = play_match(
                env_cfg, (agents[p0], agents[p1]), n_games=half,
                seed=seed + 97 * p0 + p1, render=render)
            for _ in range(w0):
                board.declare_winner(agents[p0].name, agents[p1].name)
            for _ in range(w1):
                board.declare_winner(agents[p1].name, agents[p0].name)
            for _ in range(undecided):
                board.declare_draw(agents[p0].name, agents[p1].name)
    return board
