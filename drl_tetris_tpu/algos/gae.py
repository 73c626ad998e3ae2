"""Generalized advantage estimation, sventon style.

Reimplements sventon_trajectory.adv_and_targets (agents/datatypes/
trajectory.py:111-141) as a reverse ``lax.scan`` over fixed-horizon
segments instead of per-round Python loops:

  td1s[i]  = r[i] + gamma * vp[i+1] * (1 - d[i]) - vp[i]
  A_i      = td1s[i] + gamma * lam * A_{i+1}
  W_i      = 1 + lam * W_{i+1}
  est[i]   = (A_i + vp[i] - vm[i]) / W_i
  adv      = est(lam = gae_lambda)
  targets  = vm + est(lam = gve_lambda)

where vp is the PIECE-conditional value and vm the piece-mean value.  Two
faithful quirks: (1) the reference calls adv_and_targets(v_piece, v_mean)
against a (v_mean, v_piece) signature (trajectory.py:72 vs :111), so the TD
errors really run on piece-conditional values and the piece adjustment is
(+vp - vm) — we reproduce the actual behavior, not the comment; (2) in
single-policy self-play gamma is NEGATED (sventon_agent_base.py:76) because
consecutive steps alternate perspective, so value signs flip each step.

Segment semantics (TPU redesign): the reference computes GAE only over
finished rounds (ready_for_new_round).  Here rollouts are fixed-horizon
segments with auto-reset; the scan resets its carry across done boundaries
(same per-round estimates), and the final step bootstraps with the value of
the T-th state instead of waiting for the round to finish.  With lam=0.7 the
weight W saturates within ~10 steps, so truncation effects are confined to
the last few indices of a segment.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _weighted_gae(td, dones, gamma, lam):
    """Reverse scan producing (A_i / W_i is NOT done here — caller divides).
    Returns (A, W) arrays of td.shape; carry resets across done steps."""

    def body(carry, x):
        A, W = carry
        td_i, d_i = x
        keep = 1.0 - d_i
        A = td_i + gamma * lam * A * keep
        W = 1.0 + lam * W * keep
        return (A, W), (A, W)

    T = td.shape[0]
    init = (jnp.zeros(td.shape[1:]), jnp.zeros(td.shape[1:]))
    (_, _), (A, W) = jax.lax.scan(body, init, (td, dones), reverse=True)
    return A, W


def sventon_gae(rewards, dones, v_piece, v_mean, v_piece_last, *,
                gamma: float, gae_lambda: float, gve_lambda: float = 0.95):
    """Compute (advantages, value_targets) over a (T, N) segment.

    rewards/dones: (T, N); v_piece/v_mean: (T, N) values of the observed
    state from the acting player's perspective; v_piece_last: (N,) bootstrap
    value of the final state.  gamma should already carry the self-play sign
    flip (negative for single-policy)."""
    f = jnp.float32
    r, d = rewards.astype(f), dones.astype(f)
    vp, vm = v_piece.astype(f), v_mean.astype(f)
    vp_next = jnp.concatenate([vp[1:], v_piece_last[None].astype(f)], axis=0)
    td = r + gamma * vp_next * (1.0 - d) - vp

    A_adv, W_adv = _weighted_gae(td, d, gamma, gae_lambda)
    advantages = (A_adv + vp - vm) / W_adv

    A_val, W_val = _weighted_gae(td, d, gamma, gve_lambda)
    value_adjustment = (A_val + vp - vm) / W_val
    targets = vm + value_adjustment

    stats = {
        "td/mean": jnp.mean(td), "td/variance": jnp.var(td),
        "advantages/mean": jnp.mean(advantages),
        "advantages/variance": jnp.var(advantages),
        "value_adjustments/mean": jnp.mean(value_adjustment),
        "value_adjustments/variance": jnp.var(value_adjustment),
    }
    return advantages, targets, stats
