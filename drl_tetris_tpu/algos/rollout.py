"""Jitted self-play rollout: the worker hot loop as one lax.scan.

Replaces drl_tetris/worker.py:91-118 (per-step Python loop over envs,
numpy repacking, session.run) with a single compiled program: observe ->
policy forward -> sample -> env step, unrolled over a fixed horizon T by
``lax.scan`` with auto-reset.  Thousands of boards advance in lockstep; the
policy forward is one batched conv net call per tick.

Storage is compact: boards are kept as perspective-ordered uint32 bitboards
(rebuilt into float grids inside the learner), not float images — an
~18x memory saving on the segment buffer.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from drl_tetris_tpu.env.env import EnvConfig, EnvState, TetrisVectorEnv
from drl_tetris_tpu.env.observations import Obs
from drl_tetris_tpu.algos import distributions as D


class HParams(NamedTuple):
    """Schedulable sampling hyperparameters, passed into the jitted rollout
    as dynamic scalars so the host can evaluate parameter schedules
    (config/parameter.py, tools/parameter.py:8-66) per iteration without
    recompiling.  avg_traj_len backs `adaptive_epsilon`
    (sventon_agent.py:87-89; working EMA semantics from
    sherlock_agent.py:39,173: init 12, tau_learning_rate EMA)."""
    epsilon: jnp.ndarray = 0.05        # presets.py:81
    temperature: jnp.ndarray = 1.0     # action_temperature
    avg_traj_len: jnp.ndarray = 12.0   # sherlock_agent.py:39 init


class Segment(NamedTuple):
    """A (T, N) rollout segment — the packet a worker ships to the trainer
    (the trajectory (s, a, r, d) + internals layout of trajectory.py:56-86)."""
    occ: jnp.ndarray      # (T, N, 2, H) uint32, perspective order [me, opp]
    vec: jnp.ndarray      # (T, N, 2, 12) float32
    piece: jnp.ndarray    # (T, N) int32 acting piece
    rot: jnp.ndarray      # (T, N) int32 chosen rotation
    trans: jnp.ndarray    # (T, N) int32 chosen translation
    prob: jnp.ndarray     # (T, N) float32 pi(a|s) at sample time
    v_piece: jnp.ndarray  # (T, N) float32 v(s | piece)
    v_mean: jnp.ndarray   # (T, N) float32 v(s)
    reward: jnp.ndarray   # (T, N) float32
    done: jnp.ndarray     # (T, N) bool
    player: jnp.ndarray   # (T, N) int32 acting player


def _perspective_occ(env_state: EnvState, player):
    """(N, 2, H) uint32 boards ordered [acting player, opponent]."""
    occ = env_state.engine.players.occ            # (N, P, H)
    me = player[:, None, None]
    mine = jnp.take_along_axis(occ, me, axis=1)
    theirs = jnp.take_along_axis(occ, 1 - me, axis=1)
    return jnp.concatenate([mine, theirs], axis=1)


def policy_inputs(obs: Obs):
    """Split an Obs into the per-perspective input lists the nets expect."""
    vec = [obs.vec[..., 0, :], obs.vec[..., 1, :]]
    vis = [obs.vis[..., 0, :, :, :], obs.vis[..., 1, :, :, :]]
    return vec, vis


def make_policy_fn(env: TetrisVectorEnv, net, distribution: str = "pi",
                   epsilon: float = 0.05, temperature: float = 1.0):
    """The per-tick action selection of sventon_agent.get_action
    (sventon_agent.py:56-98): net forward, per-env distribution sample over
    the acting piece's (r, t) plane, recorded internals (p(a), v(s|piece),
    v(s)).  Works for both net flavours: PPONet -> (pi, v); QNet ->
    (Q, V, A) where the action scores are Q and v comes from V."""

    def policy(params, env_state, key, hp: HParams = None):
        if hp is None:
            hp = HParams(epsilon=epsilon, temperature=temperature)
        obs = env.observe(env_state)
        vec, vis = policy_inputs(obs)
        out = net.apply(params, vec, vis)
        if len(out) == 2:
            scores, v = out                            # PPO: (N,4,W,7), (N,7)
        else:
            q, vq, _ = out                             # DQN
            scores, v = q, jnp.broadcast_to(vq, (q.shape[0], 1))
        piece = obs.piece[:, 0]
        n = scores.shape[0]
        ppi = jnp.take_along_axis(
            scores, piece[:, None, None, None], axis=3)[..., 0]  # (N, 4, W)
        if distribution == "pi":
            (r, t), _ = D.action_distribution(ppi, key)
        elif distribution == "argmax":
            (r, t), _ = D.action_argmax(ppi)
        elif distribution == "epsilon":
            (r, t), _ = D.action_epsilongreedy(ppi, key, hp.epsilon)
        elif distribution == "adaptive_epsilon":
            # epsilon(t) scaled by 1/avg-trajectory-length
            # (sventon_agent.py:87-89)
            (r, t), _ = D.action_epsilongreedy(
                ppi, key, hp.epsilon / jnp.maximum(hp.avg_traj_len, 1e-6))
        elif distribution == "pareto_distribution":
            (r, t), _ = D.action_pareto(ppi, key, hp.temperature)
        else:
            raise ValueError(distribution)
        idx = jnp.arange(n)
        prob = ppi[idx, r, t]
        v_piece = v[idx, piece] if v.shape[-1] > 1 else v[:, 0]
        v_mean = jnp.mean(v, axis=-1)                  # value_mean (sventon_utils.py:76)
        return obs, piece, r, t, prob, v_piece, v_mean

    return policy


def make_pool_rollout_fn(env: TetrisVectorEnv, net, horizon: int,
                         distribution: str = "pi", **policy_kwargs):
    """Self-play rollout against a FROZEN opponent policy (league-pool
    training): the learner acts on its parity of ticks, the opponent
    snapshot on the other, and only the learner's decisions are trained on
    (pool_segment_to_batch slices them out).

    All single-policy semantics are preserved — alternating perspective,
    negated-gamma GAE — because the opponent is simply part of the
    environment from the learner's point of view; values for GAE are the
    LEARNER's estimates at every tick (the opponent only chooses actions).
    This is beyond the reference (which always self-plays the current
    policy, a known cycling risk); the league pool is the same one the Elo
    tracker keeps (runtime/league.py).

    Returns rollout(params, opp_params, env_state, key, learner_first)
    -> (env_state', Segment, v_piece_last); horizon must be even, and
    `learner_first` (static) should alternate across iterations so the
    learner trains on both seats."""
    assert horizon % 2 == 0, horizon
    policy = make_policy_fn(env, net, distribution, **policy_kwargs)

    def learner_values(params, obs, piece):
        vec, vis = policy_inputs(obs)
        out = net.apply(params, vec, vis)
        if len(out) == 2:
            _, v = out
        else:
            _, vq, _ = out
            v = jnp.broadcast_to(vq, (vq.shape[0], 1))
        idx = jnp.arange(v.shape[0])
        v_piece = v[idx, piece] if v.shape[-1] > 1 else v[:, 0]
        return v_piece, jnp.mean(v, axis=-1)

    @partial(jax.jit, static_argnames=("learner_first",))
    def rollout(params, opp_params, env_state, key, hp: HParams = None,
                learner_first: bool = True):
        def one_tick(acting_params, value_params, env_state, k):
            player = env_state.current_player
            obs, piece, r, t, prob, vp, vm = policy(
                acting_params, env_state, k, hp)
            if acting_params is not value_params:
                # GAE consumes the LEARNER's value estimates
                vp, vm = learner_values(value_params, obs, piece)
            occ = _perspective_occ(env_state, player)
            new_state, reward, done = env.step(env_state, r, t)
            seg = Segment(occ=occ, vec=obs.vec, piece=piece, rot=r, trans=t,
                          prob=prob, v_piece=vp, v_mean=vm,
                          reward=reward, done=done, player=player)
            return new_state, seg

        def pair_step(carry, keys2):
            env_state = carry
            first = params if learner_first else opp_params
            second = opp_params if learner_first else params
            env_state, seg_a = one_tick(first, params, env_state, keys2[0])
            env_state, seg_b = one_tick(second, params, env_state, keys2[1])
            pair = jax.tree.map(lambda a, b: jnp.stack([a, b]), seg_a, seg_b)
            return env_state, pair

        keys = jax.random.split(key, horizon).reshape(horizon // 2, 2, -1)
        env_state, pairs = jax.lax.scan(pair_step, env_state, keys)
        seg = jax.tree.map(
            lambda a: a.reshape((horizon,) + a.shape[2:]), pairs)
        _, piece, _, _, _, v_piece_last, _ = policy(
            params, env_state, jax.random.fold_in(key, horizon), hp)
        return env_state, seg, v_piece_last

    return rollout


def make_rollout_fn(env: TetrisVectorEnv, net, horizon: int,
                    distribution: str = "pi", policy=None, **policy_kwargs):
    """Returns rollout(params, env_state, key) -> (env_state', Segment,
    v_piece_last) — jit-compiled, scan over `horizon` ticks."""
    if policy is None:
        policy = make_policy_fn(env, net, distribution, **policy_kwargs)

    @jax.jit
    def rollout(params, env_state, key, hp: HParams = None):
        def step_fn(carry, key):
            params, env_state = carry
            player = env_state.current_player
            obs, piece, r, t, prob, v_piece, v_mean = policy(
                params, env_state, key, hp)
            occ = _perspective_occ(env_state, player)
            new_state, reward, done = env.step(env_state, r, t)
            out = Segment(occ=occ, vec=obs.vec, piece=piece, rot=r, trans=t,
                          prob=prob, v_piece=v_piece, v_mean=v_mean,
                          reward=reward, done=done, player=player)
            return (params, new_state), out

        keys = jax.random.split(key, horizon)
        (params, env_state), seg = jax.lax.scan(
            step_fn, (params, env_state), keys)
        # bootstrap value of the final state (next acting player's view)
        _, piece, _, _, _, v_piece_last, _ = policy(
            params, env_state, jax.random.fold_in(key, horizon), hp)
        return env_state, seg, v_piece_last

    return rollout
