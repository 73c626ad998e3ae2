"""Reward shaping.

Exact port of agents/agent_utils/reward_shapers.py:8-24: ``linear_reshaping``
smears the terminal reward backwards over the trajectory with alternating
signs for single-policy self-play (consecutive steps belong to opposite
players).  For a trajectory r_0..r_T (T = index of the terminal step):

    shaped_t = r_t + 2*amount*r_T/(T^2 - T) * t * (-1)^(t+T)   (t < T)
    shaped_T = (1 - amount) * r_T
    trajectories with fewer than 3 steps are returned unchanged (:11-12).

Segment form (fixed-horizon (T, N) with auto-reset): the per-step index
within its trajectory comes from a forward scan, the distance to the
trajectory's done and the terminal reward from backward scans, and
T = idx + steps_to_done.  (-1)^(t+T) == (-1)^steps_to_done.  Steps whose
trajectory does not finish inside the segment see r_T = 0 and are
unchanged; trajectories that began before the segment count their index
from the segment head — the one documented deviation from the
whole-trajectory reference shape (confined to at most the first
trajectory of each env's segment).

Wired from settings: ``reward_shaper: "linear_reshaping"`` +
``reward_shaper_param`` (a schedulable Parameter — the reference's
commented recipe, experiments/sventon_base.py:61-62), applied to segments
before GAE exactly where process_trajectory applies it
(trajectory.py:59).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_reshaping(amount: float, single_policy: bool = True):
    """Returns shape(rewards, dones) -> reshaped rewards over (T, N)."""

    def shape(rewards: jnp.ndarray, dones: jnp.ndarray) -> jnp.ndarray:
        f = rewards.astype(jnp.float32)
        d = dones.astype(jnp.float32)
        Tseg = f.shape[0]

        # forward: index of each step within its trajectory (resets AFTER
        # a done step)
        def fwd(idx, d_t):
            return jnp.where(d_t > 0, 0.0, idx + 1.0), idx
        _, idx = jax.lax.scan(fwd, jnp.zeros_like(f[0]), d)

        # backward: steps to the trajectory's done (0 at the done step;
        # Tseg = "no done inside the segment") and the terminal reward
        def bwd(carry, x):
            std_next, rT_next = carry
            d_t, f_t = x
            std = jnp.where(d_t > 0, 0.0, std_next + 1.0)
            rT = jnp.where(d_t > 0, f_t, rT_next)
            return (std, rT), (std, rT)
        init = (jnp.full_like(f[0], Tseg), jnp.zeros_like(f[0]))
        _, (steps_to_done, rT) = jax.lax.scan(bwd, init, (d, f),
                                              reverse=True)
        finishes = steps_to_done < Tseg          # done visible in-segment

        T_traj = idx + steps_to_done             # terminal index == T
        # (-1)^(t+T) == (-1)^(T - t) == (-1)^steps_to_done
        sign = (jnp.where(steps_to_done.astype(jnp.int32) % 2 == 0, 1.0, -1.0)
                if single_policy else jnp.float32(1.0))
        denom = jnp.maximum(T_traj * T_traj - T_traj, 1.0)
        smear = 2.0 * amount * rT / denom * idx * sign
        shaped = jnp.where(d > 0, (1.0 - amount) * f,
                           jnp.where(finishes, f + smear, f))
        # len(r) < 3  <=>  T < 2: unchanged (reward_shapers.py:11-12)
        return jnp.where(T_traj < 2.0, f, shaped)

    return shape


def no_reshaping(*args, **kwargs):
    """reward_shapers.py:26-29."""
    def f(rewards, dones):
        return rewards
    return f


def make_shaper(name, amount: float, single_policy: bool = True):
    """Settings-driven construction: name in {None, "none",
    "linear_reshaping"}."""
    if name in (None, "none", "no_reshaping"):
        return None
    if name == "linear_reshaping":
        return linear_reshaping(amount, single_policy=single_policy)
    raise ValueError(f"unknown reward_shaper {name!r}")
