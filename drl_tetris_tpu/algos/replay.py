"""On-device prioritized experience replay with k-step windows.

Replaces agents/agent_utils/experience_replay.py (host numpy ring arrays +
stride-trick k-step views + scipy rank sampling) with HBM-resident ring
buffers and fully jitted sampling:

  * k-step windows: sample i reads rows [i .. i+k] with a gather — the
    device analog of ``k_step_view`` (agents/agent_utils/fcns.py:4-10);
  * 'proportional' mode: p ~ (prio + 1e-4)^alpha (experience_replay.py:54);
  * 'rank' mode: p ~ (1/rank)^alpha over the ordinal ranking of priorities
    (experience_replay.py:47-51);
  * sampling WITHOUT replacement via the Gumbel-top-k trick (equivalent to
    np.random.choice(replace=False) with those probabilities);
  * importance weights (n*p)^-beta, max-normalized (experience_replay.py:58-59).

Segment insertion: a (T, N) rollout segment is written env-major so each
env's run is contiguous in time; the last k indices of every run get
priority 0 so no sampled window ever crosses an env boundary (the reference
avoids this because whole per-round trajectories arrive contiguously and
always end in a done).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from drl_tetris_tpu.algos.rollout import Segment

I32 = jnp.int32
F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
    capacity: int = 200_000       # experience_replay_size
    k_step: int = 5               # n_step_value_estimates (presets.py:140)
    height: int = 22
    sample_mode: str = "proportional"   # 'rank' | 'proportional'
    eps: float = 1e-4


@struct.dataclass
class ReplayState:
    occ: jnp.ndarray      # (M, 2, H) uint32
    vec: jnp.ndarray      # (M, 2, 12) f32
    piece: jnp.ndarray    # (M,) i32
    rot: jnp.ndarray      # (M,) i32
    trans: jnp.ndarray    # (M,) i32
    reward: jnp.ndarray   # (M,) f32
    done: jnp.ndarray     # (M,) i32
    prio: jnp.ndarray     # (M,) f32  (-1 == never sampled, like prios init)
    cursor: jnp.ndarray   # () i32
    size: jnp.ndarray     # () i32
    total_samples: jnp.ndarray  # () i32


def replay_init(cfg: ReplayConfig) -> ReplayState:
    M, H = cfg.capacity, cfg.height
    return ReplayState(
        occ=jnp.zeros((M, 2, H), jnp.uint32),
        vec=jnp.zeros((M, 2, 12), F32),
        piece=jnp.zeros((M,), I32), rot=jnp.zeros((M,), I32),
        trans=jnp.zeros((M,), I32),
        reward=jnp.zeros((M,), F32), done=jnp.zeros((M,), I32),
        prio=jnp.full((M,), -1.0, F32),
        cursor=I32(0), size=I32(0), total_samples=I32(0),
    )


def _flatten_env_major(seg: Segment):
    """(T, N, ...) -> (N*T, ...) with each env's T steps contiguous."""
    sw = lambda a: jnp.swapaxes(a, 0, 1).reshape((-1,) + a.shape[2:])
    return sw


@partial(jax.jit, static_argnums=(0, 3))
def replay_add_segment(cfg: ReplayConfig, st: ReplayState, seg: Segment,
                       horizon: int) -> ReplayState:
    """Insert a rollout segment.  Mirrors add_indices' ring semantics
    (experience_replay.py:130-138): if the write would cross max_size =
    M - k, wrap the cursor to 0 first."""
    sw = _flatten_env_major(seg)
    T = horizon
    N = seg.reward.shape[1]
    n = N * T
    M = cfg.capacity
    max_size = M - cfg.k_step
    assert n <= max_size, "segment larger than replay capacity"

    wrap = st.cursor + n > max_size
    start = jnp.where(wrap, 0, st.cursor)
    size0 = jnp.where(wrap, jnp.maximum(st.size, st.cursor), st.size)
    idx = start + jnp.arange(n, dtype=I32)

    # windows must not cross env runs: zero the last k_step of each run
    pos_in_run = jnp.tile(jnp.arange(T, dtype=I32), (N,))
    prio_new = jnp.where(pos_in_run >= T - cfg.k_step, 0.0, 2.0)  # prio 2 ('very large', trajectory.py:82)

    st = st.replace(
        occ=st.occ.at[idx].set(sw(seg.occ)),
        vec=st.vec.at[idx].set(sw(seg.vec)),
        piece=st.piece.at[idx].set(sw(seg.piece)),
        rot=st.rot.at[idx].set(sw(seg.rot)),
        trans=st.trans.at[idx].set(sw(seg.trans)),
        reward=st.reward.at[idx].set(sw(seg.reward)),
        done=st.done.at[idx].set(sw(seg.done).astype(I32)),
        prio=st.prio.at[idx].set(prio_new),
        cursor=start + n,
        size=jnp.maximum(size0, start + n),
        total_samples=st.total_samples + n,
    )
    return st


def _sampling_logits(cfg: ReplayConfig, st: ReplayState, alpha):
    M = cfg.capacity
    valid = jnp.arange(M) < st.size
    prio = jnp.where(valid, jnp.maximum(st.prio, 0.0), 0.0)
    if cfg.sample_mode == "proportional":
        p_un = (prio + cfg.eps) ** alpha
    else:  # rank-based: 1-indexed ordinal rank of descending priority
        order = jnp.argsort(-st.prio)          # invalid (-1) sort last
        rank = jnp.empty((M,), I32).at[order].set(jnp.arange(M, dtype=I32) + 1)
        p_un = (1.0 / rank.astype(F32)) ** alpha
    p_un = jnp.where(valid, p_un, 0.0)
    p = p_un / jnp.sum(p_un)
    return p


@partial(jax.jit, static_argnums=(0, 3))
def replay_sample(cfg: ReplayConfig, st: ReplayState, key, n_samples: int,
                  alpha, beta):
    """Prioritized sample of n indices (without replacement) + IS weights.
    Returns (idx (n,), is_weights (n,))."""
    p = _sampling_logits(cfg, st, alpha)
    g = jax.random.gumbel(key, p.shape)
    scores = jnp.where(p > 0, jnp.log(p) + g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, n_samples)
    n_eff = jnp.maximum(st.size, 1).astype(F32)
    iw_all = (n_eff * jnp.maximum(p, 1e-30)) ** (-beta)
    iw_all = jnp.where(p > 0, iw_all, 0.0)
    iw = iw_all[idx]
    iw = iw / jnp.maximum(jnp.max(iw_all), 1e-30)
    return idx, iw


@partial(jax.jit, static_argnums=0)
def replay_gather_windows(cfg: ReplayConfig, st: ReplayState, idx):
    """Gather k-step windows [i .. i+k] for the sampled indices.
    Returns a dict of arrays with a window axis where relevant."""
    k = cfg.k_step
    win = idx[:, None] + jnp.arange(k + 1, dtype=I32)[None, :]
    win = jnp.clip(win, 0, cfg.capacity - 1)
    return dict(
        occ=st.occ[win],        # (n, k+1, 2, H)
        vec=st.vec[win],        # (n, k+1, 2, 12)
        piece=st.piece[idx],    # (n,)
        rot=st.rot[idx],
        trans=st.trans[idx],
        reward=st.reward[win],  # (n, k+1)
        done=st.done[win],      # (n, k+1)
    )


def replay_update_prios(st: ReplayState, idx, new_prios) -> ReplayState:
    return st.replace(prio=st.prio.at[idx].set(new_prios))
