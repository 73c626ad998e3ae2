"""Vectorized two-player Tetris environment.

Replaces the reference's Python-loop vectorization
(environment/tetris_environment_vector.py:9-191 — "the throughput ceiling by
design", SURVEY.md 2.2) with one jitted, vmapped program over a
struct-of-arrays batch of games.  The API mirrors tetris_environment
(environment/tetris_environment.py):

  reset / get_observation / step (perform_action) / get_winner /
  simulate support (functional state IS the sandbox — no copy()/set()
  plumbing needed: keep the old pytree, that's your anchor)

and the worker-loop conventions of drl_tetris/worker.py:91-118
(per-game alternating current player, auto-reset of finished games,
zero-sum terminal reward, tetris_environment.py:135-149).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from drl_tetris_tpu.engine.core import EngineConfig, EngineState, N_SYM_ROT
from drl_tetris_tpu.engine import step as S
from drl_tetris_tpu.env.observations import Obs, observe as build_obs


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    engine: EngineConfig = EngineConfig()
    time_elapsed_each_action: int = 400   # presets.py:133
    # reward_fcn (tetris_environment.py:135-149): zero-sum terminal base
    # reward, optional combo shaping (extra_rewards / reward_ammount)
    extra_rewards: bool = False
    reward_base_weight: float = 1.0
    reward_combo_weight: float = 0.0

    @property
    def n_rotations(self):
        return 4

    @property
    def n_translations(self):
        return self.engine.width


@struct.dataclass
class EnvState:
    engine: EngineState        # batched: every leaf has leading dim (N,)
    current_player: jnp.ndarray  # (N,) int32 — whose turn it is NOW
    key: jnp.ndarray           # (N, 2) per-game PRNG keys (auto-reset
                               # reseeding); per-game so every leaf of this
                               # pytree shards over the games axis
    rounds_played: jnp.ndarray  # (N,) int32


def _reward(cfg: EnvConfig, eng: EngineState, player, done):
    """tetris_environment.reward_fcn: base = youdead - medead (both dead
    => -1), only at round end; optional combo-count shaping."""
    ps = eng.players
    take = lambda a, p: jnp.take_along_axis(a, p[:, None], axis=1)[:, 0]
    me_dead = take(ps.dead, player).astype(jnp.int32)
    you_dead = take(ps.dead, 1 - player).astype(jnp.int32)
    base = jnp.where(me_dead & you_dead, -1, you_dead - me_dead)
    base = jnp.where(done, base, 0).astype(jnp.float32)
    if not cfg.extra_rewards:
        return base
    combo = take(ps.combo_count, player).astype(jnp.float32)
    return cfg.reward_base_weight * base + cfg.reward_combo_weight * combo


class TetrisVectorEnv:
    """N independent two-player games stepped in lockstep under jit."""

    def __init__(self, cfg: EnvConfig, n_games: int):
        self.cfg = cfg
        self.n_games = n_games

    # -- lifecycle ---------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def reset(self, key) -> EnvState:
        kinit, kplayer, knext = jax.random.split(key, 3)
        keys = jax.random.split(kinit, self.n_games)
        eng = jax.vmap(lambda k: S.init(self.cfg.engine, k))(keys)
        # worker.py:84-87: initial current player random per game
        player = jax.random.randint(kplayer, (self.n_games,), 0, 2)
        return EnvState(engine=eng, current_player=player,
                        key=jax.random.split(knext, self.n_games),
                        rounds_played=jnp.ones((self.n_games,), jnp.int32))

    # -- core step ---------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, rotations, translations
             ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Perform the acting player's (r, t) macro in every game (null
        action for the opponent), advance time, auto-reset finished games.

        Returns (state', reward, done) where reward/done are for the acting
        player of THIS step (pre-flip), matching perform_action + reset_envs
        (worker.py:103-112).
        """
        cfg = self.cfg
        eng = state.engine
        N = self.n_games
        player = state.current_player
        use = jnp.arange(2)[None, :] == player[:, None]           # (N, 2)
        r2 = jnp.where(use, rotations[:, None], 0)
        t2 = jnp.where(use, translations[:, None], 0)
        dt = jnp.int32(cfg.time_elapsed_each_action)
        eng = jax.vmap(
            lambda e, u, rr, tt: S.step_macro(cfg.engine, e, u, rr, tt, dt)
        )(eng, use, r2, t2)
        done = eng.round_over
        reward = _reward(cfg, eng, player, done)

        # auto-reset finished games (worker.py:157-166 reset_envs)
        both = jax.vmap(lambda k: jax.random.split(k))(state.key)  # (N, 2, 2)
        key, reset_keys = both[:, 0], both[:, 1]
        eng_reset = jax.vmap(lambda e, k: S.reset(cfg.engine, e, k))(eng, reset_keys)
        eng = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((N,) + (1,) * (a.ndim - 1)), b, a),
            eng, eng_reset)
        return EnvState(
            engine=eng,
            current_player=1 - player,  # worker.py:96 alternation
            key=key,
            rounds_played=state.rounds_played + done.astype(jnp.int32),
        ), reward, done

    @partial(jax.jit, static_argnums=0)
    def step_place(self, state: EnvState, r_rel, x_target
                   ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Like step(), but with column-targeted placements (the key macro
        the reference's mask actions encode) — used by world-model agents."""
        cfg = self.cfg
        eng = state.engine
        N = self.n_games
        player = state.current_player
        use = jnp.arange(2)[None, :] == player[:, None]
        r2 = jnp.where(use, r_rel[:, None], 0)
        x2 = jnp.where(use, x_target[:, None], 0)
        dt = jnp.int32(cfg.time_elapsed_each_action)
        eng = jax.vmap(
            lambda e, u, rr, xx: S.step_place(cfg.engine, e, u, rr, xx, dt)
        )(eng, use, r2, x2)
        done = eng.round_over
        reward = _reward(cfg, eng, player, done)
        both = jax.vmap(lambda k: jax.random.split(k))(state.key)
        key, reset_keys = both[:, 0], both[:, 1]
        eng_reset = jax.vmap(lambda e, k: S.reset(cfg.engine, e, k))(eng, reset_keys)
        eng = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((N,) + (1,) * (a.ndim - 1)), b, a),
            eng, eng_reset)
        return EnvState(
            engine=eng, current_player=1 - player, key=key,
            rounds_played=state.rounds_played + done.astype(jnp.int32),
        ), reward, done

    @partial(jax.jit, static_argnums=0)
    def step_pose(self, state: EnvState, rot_abs, col, y
                  ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Like step(), but locking the acting player's piece at an exact
        pose (rot, posX+1=col, posY=y) — the execution interface for the
        full get_actions set incl. finesse rests (engine/masks.legal_rests;
        reference reaches these via key paths, TestField.cpp:113-125).
        Pass the ENUMERATED rotation row of the mask; pieces with one
        enumerated rotation (O) execute at their current rotation."""
        cfg = self.cfg
        eng = state.engine
        N = self.n_games
        player = state.current_player
        ps = eng.players
        take = lambda a: jnp.take_along_axis(a, player[:, None], axis=1)[:, 0]
        n_sym = jnp.asarray(N_SYM_ROT)[take(ps.piece)]
        rot_exec = jnp.where(n_sym == 1, take(ps.rot), rot_abs)
        use = jnp.arange(2)[None, :] == player[:, None]
        r2 = jnp.where(use, rot_exec[:, None], 0)
        c2 = jnp.where(use, col[:, None], 0)
        y2 = jnp.where(use, y[:, None], 0)
        dt = jnp.int32(cfg.time_elapsed_each_action)
        eng = jax.vmap(
            lambda e, u, rr, cc, yy: S.step_pose(
                cfg.engine, e, u, rr, cc, yy, dt)
        )(eng, use, r2, c2, y2)
        done = eng.round_over
        reward = _reward(cfg, eng, player, done)
        both = jax.vmap(lambda k: jax.random.split(k))(state.key)
        key, reset_keys = both[:, 0], both[:, 1]
        eng_reset = jax.vmap(lambda e, k: S.reset(cfg.engine, e, k))(eng, reset_keys)
        eng = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((N,) + (1,) * (a.ndim - 1)), b, a),
            eng, eng_reset)
        return EnvState(
            engine=eng, current_player=1 - player, key=key,
            rounds_played=state.rounds_played + done.astype(jnp.int32),
        ), reward, done

    @partial(jax.jit, static_argnums=0)
    def get_actions(self, state: EnvState) -> jnp.ndarray:
        """(N, 4, W, H) bool: the acting player's full legal placement set
        (top-drop ∪ finesse) — the get_actions API of the reference
        (tetris_environment.py:77-85), executable cell-by-cell via
        step_pose."""
        from drl_tetris_tpu.engine import masks as M
        ps = state.engine.players
        p = state.current_player
        take = lambda a: jnp.take_along_axis(
            a, p.reshape((-1,) + (1,) * (a.ndim - 1)), axis=1)[:, 0]
        return jax.vmap(
            lambda o, pc, rt: M.legal_rests(self.cfg.engine, o, pc, rt)
        )(take(ps.occ), take(ps.piece), take(ps.rot))

    @partial(jax.jit, static_argnums=0)
    def step_mixed(self, state: EnvState, use_place, rotations, t_or_x
                   ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Per-game action-kind dispatch: games where ``use_place`` holds
        interpret (rotations, t_or_x) as a column-targeted placement
        (step_place), the rest as the (r, t) macro (step).  Used by
        evaluation when a world-model agent (SIXten) meets a macro agent
        (SVENton) in the same vectorized match — both make-phases are
        computed and selected per game (eval-only cost)."""
        cfg = self.cfg
        eng = state.engine
        N = self.n_games
        player = state.current_player
        use = jnp.arange(2)[None, :] == player[:, None]
        r2 = jnp.where(use, rotations[:, None], 0)
        a2 = jnp.where(use, t_or_x[:, None], 0)
        dt = jnp.int32(cfg.time_elapsed_each_action)

        def one(e, u, rr, aa, pl):
            m1 = S.make_phase_macro(cfg.engine, e, u, rr, aa)
            m2 = S.make_phase_place(cfg.engine, e, u, rr, aa)
            m = jax.tree.map(lambda a, b: jnp.where(pl, b, a), m1, m2)
            new = S.finish_phase(cfg.engine, m, dt, None)
            return jax.tree.map(
                lambda a, b: S._sel(e.round_over, a, b), e, new)

        eng = jax.vmap(one)(eng, use, r2, a2, use_place)
        done = eng.round_over
        reward = _reward(cfg, eng, player, done)
        both = jax.vmap(lambda k: jax.random.split(k))(state.key)
        key, reset_keys = both[:, 0], both[:, 1]
        eng_reset = jax.vmap(lambda e, k: S.reset(cfg.engine, e, k))(eng, reset_keys)
        eng = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((N,) + (1,) * (a.ndim - 1)), b, a),
            eng, eng_reset)
        return EnvState(
            engine=eng, current_player=1 - player, key=key,
            rounds_played=state.rounds_played + done.astype(jnp.int32),
        ), reward, done

    @partial(jax.jit, static_argnums=0)
    def step_mixed_pose(self, state: EnvState, use_pose, rotations, t_or_c, y
                        ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Per-game dispatch between pose-lock actions (full get_actions
        space) and the (r, t) macro — evaluation support for matches where a
        full-action-space world-model agent meets a macro agent (the pose
        analog of step_mixed)."""
        cfg = self.cfg
        eng = state.engine
        N = self.n_games
        player = state.current_player
        ps = eng.players
        take = lambda a: jnp.take_along_axis(a, player[:, None], axis=1)[:, 0]
        n_sym = jnp.asarray(N_SYM_ROT)[take(ps.piece)]
        rot_exec = jnp.where(n_sym == 1, take(ps.rot), rotations)
        use = jnp.arange(2)[None, :] == player[:, None]
        r2m = jnp.where(use, rotations[:, None], 0)
        r2p = jnp.where(use, rot_exec[:, None], 0)
        a2 = jnp.where(use, t_or_c[:, None], 0)
        y2 = jnp.where(use, y[:, None], 0)
        dt = jnp.int32(cfg.time_elapsed_each_action)

        def one(e, u, rrm, rrp, aa, yy, pose):
            m1 = S.make_phase_macro(cfg.engine, e, u, rrm, aa)
            m2 = S.make_phase_pose(cfg.engine, e, u, rrp, aa, yy)
            m = jax.tree.map(lambda a, b: jnp.where(pose, b, a), m1, m2)
            new = S.finish_phase(cfg.engine, m, dt, None)
            return jax.tree.map(
                lambda a, b: S._sel(e.round_over, a, b), e, new)

        eng = jax.vmap(one)(eng, use, r2m, r2p, a2, y2, use_pose)
        done = eng.round_over
        reward = _reward(cfg, eng, player, done)
        both = jax.vmap(lambda k: jax.random.split(k))(state.key)
        key, reset_keys = both[:, 0], both[:, 1]
        eng_reset = jax.vmap(lambda e, k: S.reset(cfg.engine, e, k))(eng, reset_keys)
        eng = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((N,) + (1,) * (a.ndim - 1)), b, a),
            eng, eng_reset)
        return EnvState(
            engine=eng, current_player=1 - player, key=key,
            rounds_played=state.rounds_played + done.astype(jnp.int32),
        ), reward, done

    def step_mixed_place_pose(self, state: EnvState, use_pose, rotations,
                              t_or_c, y
                              ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Per-game dispatch between pose-lock actions and column-targeted
        placements — the remaining eval pairing (a full-action-space
        world-model agent vs a top-drop world-model agent; r2 VERDICT item
        9 removed the NotImplementedError here)."""
        cfg = self.cfg
        eng = state.engine
        N = self.n_games
        player = state.current_player
        ps = eng.players
        take = lambda a: jnp.take_along_axis(a, player[:, None], axis=1)[:, 0]
        n_sym = jnp.asarray(N_SYM_ROT)[take(ps.piece)]
        rot_exec = jnp.where(n_sym == 1, take(ps.rot), rotations)
        use = jnp.arange(2)[None, :] == player[:, None]
        r2r = jnp.where(use, rotations[:, None], 0)      # place: relative r
        r2p = jnp.where(use, rot_exec[:, None], 0)       # pose: enumerated r
        a2 = jnp.where(use, t_or_c[:, None], 0)
        y2 = jnp.where(use, y[:, None], 0)
        dt = jnp.int32(cfg.time_elapsed_each_action)

        def one(e, u, rrr, rrp, aa, yy, pose):
            m1 = S.make_phase_place(cfg.engine, e, u, rrr, aa)
            m2 = S.make_phase_pose(cfg.engine, e, u, rrp, aa, yy)
            m = jax.tree.map(lambda a, b: jnp.where(pose, b, a), m1, m2)
            new = S.finish_phase(cfg.engine, m, dt, None)
            return jax.tree.map(
                lambda a, b: S._sel(e.round_over, a, b), e, new)

        eng = jax.vmap(one)(eng, use, r2r, r2p, a2, y2, use_pose)
        done = eng.round_over
        reward = _reward(cfg, eng, player, done)
        both = jax.vmap(lambda k: jax.random.split(k))(state.key)
        key, reset_keys = both[:, 0], both[:, 1]
        eng_reset = jax.vmap(lambda e, k: S.reset(cfg.engine, e, k))(eng, reset_keys)
        eng = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((N,) + (1,) * (a.ndim - 1)), b, a),
            eng, eng_reset)
        return EnvState(
            engine=eng, current_player=1 - player, key=key,
            rounds_played=state.rounds_played + done.astype(jnp.int32),
        ), reward, done

    # -- observation -------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 3))
    def observe(self, state: EnvState, player=None, mirrored=False) -> Obs:
        p = state.current_player if player is None else player
        return build_obs(self.cfg.engine, state.engine, p, mirrored=mirrored)

    def get_winner(self, state: EnvState) -> jnp.ndarray:
        """last_winner of the most recently finished round per game."""
        return state.engine.last_winner
