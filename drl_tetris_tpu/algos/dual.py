"""Dual-policy self-play: two policies trained against each other.

The reference's single_policy=False mode: each policy controls one player
and sees the other as part of the environment.  The worker stitches each
policy's experiences from alternating ticks — the current player completes
the previous player's transition with differenced rewards and OR'd dones
(worker.py:176-192 merge_from_stash):

    s'  = s_{t+2}   (the next state that policy observes)
    r'  = r_t - r_{t+1}    "good news for the opponent is bad news for me"
    d'  = d_t | d_{t+1}

Both policies live in ONE jitted program as two parameter pytrees
(policy_0 / policy_1, sventon_agent_base.py:96-111); rollouts evaluate both
and select by seat.  GAE runs per policy over its own tick subsequence with
UNSIGNED gamma (the sign flip exists only for single-policy perspective
alternation, sventon_agent_base.py:76).

The DQN flavour's win-rate gate (skip training a policy winning more than
0.5 + tolerance, sventon_agent_dqn_trainer.py:16-18) is provided as an EMA
win-rate tracker (winrate_learningrate, presets.py:179).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from drl_tetris_tpu.env.env import TetrisVectorEnv
from drl_tetris_tpu.algos.rollout import Segment, make_policy_fn, _perspective_occ
from drl_tetris_tpu.algos.ppo import PPOConfig, Batch, segment_to_batch
from drl_tetris_tpu.algos.gae import sventon_gae


def make_dual_rollout_fn(env: TetrisVectorEnv, net, horizon: int,
                         distribution: str = "pi"):
    """rollout(params_0, params_1, env_state, key, hp=None) -> (env_state',
    Segment, v_last (N,)).  The Segment's player field records which policy
    acted.  Works for both net flavours (PPONet pi-sampling or QNet
    epsilon-greedy via `distribution`)."""
    policy = make_policy_fn(env, net, distribution)

    def acting(params0, params1, env_state, key, hp):
        k0, k1 = jax.random.split(key)
        o0, pc0, r0, t0, p0, vp0, vm0 = policy(params0, env_state, k0, hp)
        o1, pc1, r1, t1, p1, vp1, vm1 = policy(params1, env_state, k1, hp)
        mine = env_state.current_player == 0
        pick = lambda a, b: jnp.where(mine, a, b)
        obs = jax.tree.map(
            lambda a, b: jnp.where(
                mine.reshape((-1,) + (1,) * (a.ndim - 1)), a, b), o0, o1)
        return (obs, pick(pc0, pc1), pick(r0, r1), pick(t0, t1),
                pick(p0, p1), pick(vp0, vp1), pick(vm0, vm1))

    @jax.jit
    def rollout(params0, params1, env_state, key, hp=None):
        def step_fn(carry, key):
            params0, params1, env_state = carry
            player = env_state.current_player
            obs, piece, r, t, prob, v_piece, v_mean = acting(
                params0, params1, env_state, key, hp)
            occ = _perspective_occ(env_state, player)
            new_state, reward, done = env.step(env_state, r, t)
            out = Segment(occ=occ, vec=obs.vec, piece=piece, rot=r, trans=t,
                          prob=prob, v_piece=v_piece, v_mean=v_mean,
                          reward=reward, done=done, player=player)
            return (params0, params1, new_state), out

        keys = jax.random.split(key, horizon)
        (params0, params1, env_state), seg = jax.lax.scan(
            step_fn, (params0, params1, env_state), keys)
        _, _, _, _, _, v_last, _ = acting(
            params0, params1, env_state, jax.random.fold_in(key, horizon), hp)
        return env_state, seg, v_last

    return rollout


def merge_dual_transitions(seg: Segment) -> Segment:
    """The stash/merge rewrite (worker.py:184-191): transition t gets
    r' = r_t - r_{t+1} ("good news for the opponent is bad news for me")
    and d' = d_t | d_{t+1}.  The segment's final tick keeps its own (r, d)."""
    r = seg.reward
    d = seg.done
    r_next = jnp.concatenate([r[1:], jnp.zeros_like(r[:1])], axis=0)
    d_next = jnp.concatenate([d[1:], jnp.zeros_like(d[:1])], axis=0)
    return seg._replace(reward=r - r_next, done=d | d_next)


def dual_policy_subsegment(merged: Segment, p: int) -> Segment:
    """Policy p's own ticks as a (T/2, N) Segment.  Players strictly
    alternate; per env the policy's ticks are the even slice if it acted at
    t=0, else the odd slice."""
    even_first = merged.player[0] == p            # (N,)

    def take(a):
        ev, od = a[0::2], a[1::2]
        m = even_first.reshape((1, -1) + (1,) * (a.ndim - 2))
        return jnp.where(m, ev, od)

    return Segment(*[take(getattr(merged, f)) for f in Segment._fields])


def split_dual_segment(cfg: PPOConfig, seg: Segment, v_last
                       ) -> Tuple[Batch, Batch, dict]:
    """Merge + split a (T, N) dual-policy segment into one training batch
    per policy.

    Merged transition t: r' = r_t - r_{t+1}, d' = d_t | d_{t+1}
    (worker.py:184-191).  The last tick of the segment has no successor; it
    keeps its own (r, d) — with done-masked GAE this perturbs at most one
    boundary sample per env per segment.  Each policy's ticks are every
    other index (players strictly alternate); per-env phase is resolved by
    selecting even or odd slices."""
    T = seg.reward.shape[0]
    assert T % 2 == 0, "dual-policy segments need an even horizon"
    merged = merge_dual_transitions(seg)

    gamma = cfg.gamma  # UNSIGNED: each policy sees only its own turns

    def policy_batch(p):
        even_first = seg.player[0] == p           # (N,)
        sub = dual_policy_subsegment(merged, p)
        v_boot = jnp.where(even_first, v_last, jnp.zeros_like(v_last))
        # (the odd-phase envs' final tick has no bootstrap view for this
        # policy — the done-masked scan treats it as truncation)
        adv, tgt, stats = sventon_gae(
            sub.reward, sub.done, sub.v_piece, sub.v_mean, v_boot,
            gamma=gamma, gae_lambda=cfg.gae_lambda, gve_lambda=cfg.gve_lambda)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        return Batch(
            occ=flat(sub.occ), vec=flat(sub.vec), piece=flat(sub.piece),
            rot=flat(sub.rot), trans=flat(sub.trans),
            old_prob=flat(sub.prob), advantage=flat(adv), target_v=flat(tgt),
        ), stats

    b0, s0 = policy_batch(0)
    b1, s1 = policy_batch(1)
    stats = {f"policy_0/{k}": v for k, v in s0.items()}
    stats.update({f"policy_1/{k}": v for k, v in s1.items()})
    return b0, b1, stats


@dataclasses.dataclass
class WinRateTracker:
    """EMA win rate per policy + the DQN training gate
    (sventon_agent_dqn_trainer.py:16-18, presets.py:179-180)."""
    lr: float = 0.02
    tolerance: float = 0.1
    rate_0: float = 0.5

    def update(self, winners) -> None:
        """winners: array of finished-round winners (0/1; -1 ignored)."""
        import numpy as np
        w = np.asarray(winners)
        w = w[w >= 0]
        for x in w:
            self.rate_0 = (1 - self.lr) * self.rate_0 + self.lr * (x == 0)

    def should_train(self, policy: int) -> bool:
        rate = self.rate_0 if policy == 0 else 1.0 - self.rate_0
        return rate <= 0.5 + self.tolerance
