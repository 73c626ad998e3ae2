"""Observation builder: engine state -> network inputs.

Replicates the reference pipeline
  state_dict        environment/env_utils/state_processors.py:23-54
  unpacker          agents/agent_utils/state_unpack.py (observation_mode=
                    'separate', player_mode='separate', separate_piece=True —
                    the configuration sventon uses, sventon_agent_base.py:52-59)

Notes on codings (state_processors.py:24): the backend's 4x4 piece-grid
holds legacy tile values which ``col_code`` maps back to piece ids — the
composition is the identity on our internal ids, so ``piece`` one-hots the
internal id directly, as does ``nextpiece``.

Per player the vector observation is, in order (collect_separate_data,
state_unpack.py:88-105):
  [x, y, incoming_lines, combo_time, combo_count, nextpiece(7)]  -> 12 dims
(the current piece is delivered separately as an index; the field is the
visual input).  ``x``/``y`` are uint8 casts of int8 positions — posX=-1 shows
up as 255, faithfully (state_processors.py:35-36).

The perspective stack for player p is [p, 1-p] (states_from_perspective,
state_unpack.py:35-37); the mirrored variant flips the field horizontally
and swaps L/J and S/Z piece ids (piece_swap, trajectory.py:89).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from drl_tetris_tpu.engine.core import EngineConfig, EngineState

import numpy as _np

# L<->J, S<->Z under horizontal reflection (trajectory.py:89)
PIECE_SWAP_NP = _np.asarray([1, 0, 3, 2, 4, 5, 6], dtype=_np.int32)


class Obs(NamedTuple):
    """Network inputs from one player's perspective ([me, opponent])."""
    vec: jnp.ndarray    # (..., 2, 12) float32
    vis: jnp.ndarray    # (..., 2, H, W, 1) float32
    piece: jnp.ndarray  # (..., 2) int32


def field_grid(cfg: EngineConfig, occ: jnp.ndarray) -> jnp.ndarray:
    """(..., H) uint32 bitboard -> (..., H, W) float32 binary grid."""
    bits = (occ[..., None] >> jnp.arange(cfg.width, dtype=jnp.uint32)) & 1
    return bits.astype(jnp.float32)


def player_vector(cfg: EngineConfig, state: EngineState, p, mirrored=False) -> jnp.ndarray:
    """The 12-dim scalar observation of player index array p (state_dict
    fields minus field/piece).  Supports batched leading dims on state."""
    ps = state.players
    take = lambda a: jnp.take_along_axis(a, p[..., None], axis=-1)[..., 0]
    px = take(ps.px)
    if mirrored:
        # horizontal flip: a cell at x maps to W-1-x; the 4x4 box pivot is
        # not observable in the vector (only x), we mirror the raw coordinate
        # the way the reference mirrors fields (field[:, ::-1]).  The
        # reference does NOT mirror x/y in aug (state_processors.py:44-53) —
        # faithful: keep unmirrored x.
        pass
    x = (px & 0xFF).astype(jnp.float32)
    y = (take(ps.py) & 0xFF).astype(jnp.float32)
    inc = take(ps.incoming_count).astype(jnp.float32)
    ct = (jnp.minimum(25000, take(ps.combo_remaining) + 50) // 100).astype(jnp.float32)
    cc = take(ps.combo_count).astype(jnp.float32)
    nxt = take(ps.nextpiece)
    if mirrored:
        nxt = jnp.asarray(PIECE_SWAP_NP)[nxt]
    nxt1h = (nxt[..., None] == jnp.arange(7)).astype(jnp.float32)
    return jnp.concatenate(
        [x[..., None], y[..., None], inc[..., None], ct[..., None],
         cc[..., None], nxt1h], axis=-1)


def observe(cfg: EngineConfig, state: EngineState, player, mirrored=False) -> Obs:
    """Build the two-perspective observation for ``player`` (int array,
    batched like state).  Equivalent to unpacker(states, player)."""
    ps = state.players
    player = jnp.asarray(player, jnp.int32)
    me = player[..., None]                      # (..., 1)
    opp = 1 - me
    order = jnp.concatenate([me, opp], axis=-1)  # (..., 2)

    vecs = jnp.stack(
        [player_vector(cfg, state, order[..., i], mirrored=mirrored)
         for i in range(2)], axis=-2)           # (..., 2, 12)

    grids = field_grid(cfg, ps.occ)             # (..., P, H, W)
    if mirrored:
        grids = grids[..., ::-1]
    take_g = lambda i: jnp.take_along_axis(
        grids, order[..., i, None, None, None], axis=-3)[..., 0, :, :]
    vis = jnp.stack([take_g(0), take_g(1)], axis=-3)[..., None]  # (...,2,H,W,1)

    pc = ps.piece
    if mirrored:
        pc = jnp.asarray(PIECE_SWAP_NP)[pc]
    take_p = lambda i: jnp.take_along_axis(pc, order[..., i, None], axis=-1)[..., 0]
    piece = jnp.stack([take_p(0), take_p(1)], axis=-1)           # (..., 2)
    return Obs(vec=vecs, vis=vis, piece=piece)
