"""Legal-placement enumeration: the ``place_block`` action space.

TPU-native replacement for TestField (TestField.cpp), the reference's
action-mask generator.  The reference enumerates, per piece:

  * top-drop placements: every (rotation, spawn column) where the piece fits
    at the spawn row, symmetry-aware (O: 1 rotation, S/Z/I: 2, else 4;
    TestField.cpp:64-111), each emitted as a key-sequence macro
    [rotations, far-left, rights, hard drop];
  * "finesse" placements: tucks/slides/kick-reachable rests found by a
    recursive backtracking search (TestField.cpp:174-410).

Here the same sets are computed with fixed shapes, vectorized over the
(rotation x column) grid:

  top_drop(cfg, occ, piece, rot) ->
      mask:   (4, W) bool   — spawn-legal placements (the SVENton (r, t)
                              action grid; column c == posX c-1)
      rest_y: (4, W) int32  — resting posY of each placement
  placement_boards(...) -> resulting occupancy per placement (world-model
      support: the fixed-shape analog of simulate_all_actions,
      tetris_environment.py:87-100, used by the Sherlock delta machinery)
  reachable(...) -> (4, W, H) bool reachability of every rest position via
      BFS over (rot, x, y) with the engine's exact move/kick set — a
      complete superset of the reference's heuristic finesse search.
      NOTE: bit-exact parity with TestField's *finesse* subset (its search
      is deliberately incomplete) is tracked as follow-up work; the
      top-drop set is exact today and covered by parity tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from drl_tetris_tpu.engine.core import EngineConfig, N_SYM_ROT
from drl_tetris_tpu.engine import kernels as K

I32 = jnp.int32


def _grid_coords(cfg: EngineConfig):
    """The (rot, column) enumeration grid: column c corresponds to spawn
    posX = c - 1 (TestField.cpp:72 loops x from -1 to W-2; current_column =
    posX + 1, TestField.cpp:122)."""
    rots = jnp.arange(4, dtype=I32)[:, None]                    # (4, 1)
    xs = jnp.arange(cfg.width, dtype=I32)[None, :] - 1          # (1, W)
    return jnp.broadcast_to(rots, (4, cfg.width)), jnp.broadcast_to(
        xs, (4, cfg.width))


@partial(jax.jit, static_argnums=0)
def top_drop(cfg: EngineConfig, occ, piece, cur_rot):
    """Spawn-row placement mask + resting rows for one player's board.

    occ: (H,) uint32; piece: () int32; cur_rot: () int32 (the O piece keeps
    whatever rotation it is in — the reference never rotates it,
    TestField.cpp:71-79).
    Returns (mask (4, W) bool, rest_y (4, W) int32)."""
    ext = K.ext_board(cfg, occ)
    rots, xs = _grid_coords(cfg)
    n_sym = jnp.asarray(N_SYM_ROT)[piece]
    # pieces with 1 enumerated rotation keep their current rotation; others
    # enumerate absolute rotations 0..n_sym-1
    eff_rot = jnp.where(n_sym == 1, cur_rot, rots)
    enum_ok = rots < n_sym

    def one(r, x):
        rows = K.lookup_rows(piece, r)
        ok = K.possible(cfg, ext, rows, x, I32(0))
        d = K.drop_distance(cfg, ext, rows, x, I32(0))
        return ok, d

    ok, d = jax.vmap(jax.vmap(one))(eff_rot, xs)
    mask = ok & enum_ok
    return mask, jnp.where(mask, d, -1)


@partial(jax.jit, static_argnums=0)
def placement_boards(cfg: EngineConfig, occ, garb, piece, cur_rot):
    """For every top-drop placement, the board after the piece locks and
    lines clear: (mask (4, W), occ_after (4, W, H) uint32, cleared (4, W)).
    This is the world-model query agents like Sherlock/SIXten make per move
    (simulate_all_actions); one fused call instead of N backend copy/set/step
    round-trips (tetris_environment.py:87-100)."""
    mask, rest = top_drop(cfg, occ, piece, cur_rot)
    rots, xs = _grid_coords(cfg)
    n_sym = jnp.asarray(N_SYM_ROT)[piece]
    eff_rot = jnp.where(n_sym == 1, cur_rot, rots)

    def one(r, x, d, m):
        py = jnp.maximum(d, 0)
        rows = K.lookup_rows(piece, r)
        o2 = K.add_piece(cfg, occ, rows, x, py)
        o3, g3, n_cl, _ = K.clear_lines(cfg, o2, garb, py)
        keep = m
        return (jnp.where(keep, o3, occ),
                jnp.where(keep, n_cl, 0))

    occ_after, cleared = jax.vmap(jax.vmap(one))(eff_rot, xs, rest, mask)
    return mask, occ_after, cleared


@partial(jax.jit, static_argnums=(0, 5))
def reachable(cfg: EngineConfig, occ, piece, cur_rot, start, max_iters: int = 0):
    """Full reachability of (rot, x, y) piece states from the spawn pose via
    {left, right, down, cw, ccw, 180 w/ kicks}: BFS as iterated relaxation
    over a dense (4, W+4, H+4) state grid.  A placement is a legal *rest*
    if reachable and it cannot move down.  Returns (rest (4, W, H) bool
    indexed [rot, posX+1, posY]).

    start: (rot0, x0, y0) spawn pose.  Superset of the reference's finesse
    set (see module docstring)."""
    H, W = cfg.height, cfg.width
    ext = K.ext_board(cfg, occ)
    XOFF, YOFF = 2, 1   # grid origin: posX = ix - XOFF in [-2, W+1], posY = iy - YOFF
    NX, NY = W + 4, H + 4
    rots = jnp.arange(4, dtype=I32)
    ixs = jnp.arange(NX, dtype=I32)
    iys = jnp.arange(NY, dtype=I32)

    def pose_ok(r, ix, iy):
        return K.possible(cfg, ext, K.lookup_rows(piece, r),
                          ix - XOFF, iy - YOFF)

    ok = jax.vmap(lambda r: jax.vmap(lambda ix: jax.vmap(
        lambda iy: pose_ok(r, ix, iy))(iys))(ixs))(rots)      # (4, NX, NY)

    # rotation transition table: for each pose, where does rot+turns land?
    def rot_target(r, ix, iy, turns):
        _, r2, x2, y2, _rows = K.try_rotate(
            cfg, ext, piece, r, ix - XOFF, iy - YOFF, turns)
        return r2, x2 + XOFF, y2 + YOFF

    def all_rot_targets(turns):
        return jax.vmap(lambda r: jax.vmap(lambda ix: jax.vmap(
            lambda iy: rot_target(r, ix, iy, turns))(iys))(ixs))(rots)

    rt = [all_rot_targets(t) for t in (1, 3, 2)]              # cw, ccw, 180

    r0, x0, y0 = start
    seed = jnp.zeros((4, NX, NY), bool).at[r0, x0 + XOFF, y0 + YOFF].set(True)
    seed = seed & ok

    def shift(a, dx, dy):
        return jnp.roll(a, (dx, dy), axis=(1, 2))

    def body(_, reach):
        new = reach
        # moves: left/right/down (single steps; BFS closure covers runs)
        new = new | (shift(reach, -1, 0) & ok)
        new = new | (shift(reach, 1, 0) & ok)
        new = new | (shift(reach, 0, 1) & ok)
        # rotations with kicks: scatter reach through the rotation map
        for (r2, x2, y2) in rt:
            scat = jnp.zeros_like(reach).at[
                r2.reshape(-1), x2.reshape(-1), y2.reshape(-1)
            ].max(reach.reshape(-1), mode="drop")
            new = new | (scat & ok)
        return new

    iters = max_iters or (NX + NY + 8)
    reach = jax.lax.fori_loop(0, iters, body, seed)

    # rest = reachable and cannot move down
    below_free = jnp.roll(ok, -1, axis=2)
    rest = reach & ~below_free
    # map back to [rot, posX+1 (0..W-1), posY (0..H-1)]
    return rest[:, XOFF - 1:XOFF - 1 + W, YOFF:YOFF + H]
