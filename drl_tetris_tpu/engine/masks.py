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
  finesse_rests(...) -> the bug-compatible replica of TestField's
      *finesse* subset (its search is deliberately incomplete) —
      emission-set-equal with the oracle every tick
      (tests/test_finesse.py::test_finesse_parity_random_play).
  reachable_paths(...) / placement_keys(...) -> parent-chain BFS
      reconstructing an executable key macro for any legal rest
      (TestField::findNextMove path reconstruction, TestField.cpp:113-125).
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


# ---------------------------------------------------------------------------
# Exact finesse-set parity with TestField's heuristic search
# (TestField.cpp:174-410).  The reference search is deliberately incomplete
# and has bug-compatible quirks (documented inline); this reproduces its
# EMISSION DECISIONS — the set of rest poses useFinesseMove fires for — not
# its key paths.  Validated entry-for-entry against the oracle's
# oracle_get_finesse_rests (tests/test_finesse.py).
# ---------------------------------------------------------------------------

# doWallKick's reverse probe sequence (TestField.cpp:304-309), in order.
_REV_PROBES = ((0, -1), (-1, 0), (1, 0), (-1, -1), (1, -1), (-2, 0), (2, 0))

I32_BIG = jnp.int32(1 << 20)


def _climb_to(cfg, ext, rows, px, py):
    """moveUp's climb (TestField.cpp:392-410): move up while possible,
    contiguously; returns the final posY."""
    H = cfg.height
    ys = jnp.arange(H, dtype=I32)
    first_block = I32_BIG
    for i in range(4):
        sh = rows[i] << (px + 4).astype(jnp.uint32)
        hit = (ext & sh) != 0                               # (H,)
        base = py + i
        # nearest occupied row strictly above piece row i
        maxhit = jnp.max(jnp.where(hit & (ys <= base - 1), ys, -I32_BIG))
        u_i = jnp.minimum(base - maxhit, base + 1)          # +1: top bound
        first_block = jnp.minimum(first_block,
                                  jnp.where(rows[i] == 0, I32_BIG, u_i))
    return py - jnp.maximum(first_block - 1, 0)


def _walk(cfg, ext, rows, px, py, direction: int, active=None):
    """tryLeft/tryRight (TestField.cpp:202-238): step sideways, climb after
    every successful step, succeed when posY reaches 0.  Returns
    (px', py', success) — the final pose is where the walk stopped (the
    reference does NOT restore it; callers exploit that, see
    _walk_continuous)."""
    W = cfg.width
    if active is None:
        active = jnp.bool_(True)

    def body(_, c):
        px, py, success, active = c
        ok = active & K.possible(cfg, ext, rows, px + direction, py)
        px2 = px + direction
        py2 = _climb_to(cfg, ext, rows, px2, py)
        px = jnp.where(ok, px2, px)
        py = jnp.where(ok, py2, py)
        success = success | (ok & (py == 0))
        return px, py, success, ok & ~success

    px, py, success, _ = jax.lax.fori_loop(
        0, W + 4, body, (px, py, jnp.bool_(False), active))
    return px, py, success


def _walk_continuous(cfg, ext, rows, px, py):
    """finesseIsPossible's B-then-C (TestField.cpp:195-199) and tryUp's
    fallback (TestField.cpp:252-258): tryRight is evaluated from wherever
    tryLeft LEFT the piece (no restore — bug-compatible)."""
    lx, ly, ls = _walk(cfg, ext, rows, px, py, -1)
    _, _, rs = _walk(cfg, ext, rows, lx, ly, +1)
    return ls | rs


def _try_up(cfg, ext, rows, px, py):
    """tryUp (TestField.cpp:240-258) minus the path bookkeeping: climb, done
    if posY==0, else the continuous left-then-right walk."""
    py1 = _climb_to(cfg, ext, rows, px, py)
    return (py1 == 0) | _walk_continuous(cfg, ext, rows, px, py1)


def _do_wallkick(cfg, ext, piece, rot0, px, py):
    """doWallKick (TestField.cpp:280-356) as a select chain.

    Scans rotations r2 = 0..3 (skipping rot0) in order; the FIRST r2 that is
    possible at the same position (terminal: only tryUp decides) or at one
    of the 7 reverse probes (break: verify the forward rotation lands back
    at (px, py), then tryUp / tryLeft / tryRight) decides the outcome."""
    taken = jnp.bool_(False)
    s_is_same = jnp.bool_(False)
    s_rows = jnp.zeros((4,), jnp.uint32)
    s_r2 = I32(0)
    s_dx = I32(0)
    s_dy = I32(0)
    for r2 in range(4):
        rows2 = K.lookup_rows(piece, jnp.int32(r2))
        skip = rot0 == r2
        same_ok = K.possible(cfg, ext, rows2, px, py)
        dfound = jnp.bool_(False)
        ddx = I32(0)
        ddy = I32(0)
        for (dx, dy) in _REV_PROBES:
            ok = K.possible(cfg, ext, rows2, px + dx, py + dy)
            hit = ok & ~dfound
            ddx = jnp.where(hit, dx, ddx)
            ddy = jnp.where(hit, dy, ddy)
            dfound = dfound | ok
        cand = (~skip) & (same_ok | dfound)
        take = cand & ~taken
        s_is_same = jnp.where(take, same_ok, s_is_same)
        s_rows = jnp.where(take, rows2, s_rows)
        s_r2 = jnp.where(take, r2, s_r2)
        s_dx = jnp.where(take, ddx, s_dx)
        s_dy = jnp.where(take, ddy, s_dy)
        taken = taken | cand

    # same-position branch (TestField.cpp:294-302): tryUp only
    same_res = _try_up(cfg, ext, s_rows, px, py)

    # displaced branch (TestField.cpp:317-353)
    turn = jnp.mod(rot0 - s_r2, 4)
    dpx, dpy = px + s_dx, py + s_dy
    _, _, fx, fy, _ = K.try_rotate(cfg, ext, piece, s_r2, dpx, dpy, turn)
    valid = (fx == px) & (fy == py)     # round-trip position check (:332)
    a = _try_up(cfg, ext, s_rows, dpx, dpy)
    _, _, b = _walk(cfg, ext, s_rows, dpx, dpy, -1)
    _, _, c = _walk(cfg, ext, s_rows, dpx, dpy, +1)  # restored start (:346)
    disp_res = valid & (a | b | c)

    return taken & jnp.where(s_is_same, same_res, disp_res)


def _reverse_wallkick(cfg, ext, piece, rot0, px, py):
    """reverseWallkick (TestField.cpp:261-278).  Caller guarantees the piece
    is horizontally locked.  Pieces S/Z/I (2/3/4) get a second chance after
    r180KeepPos' raw flip with position compensation (:358-390)."""
    s1 = _do_wallkick(cfg, ext, piece, rot0, px, py)
    rot2 = jnp.mod(rot0 + 2, 4)
    # compensation deltas by post-flip rotation: I(4)/Z(3): (+x,+y,-x,-y);
    # S(2): the opposite signs
    dx34 = jnp.where(rot2 == 0, 1, jnp.where(rot2 == 2, -1, 0))
    dy34 = jnp.where(rot2 == 1, 1, jnp.where(rot2 == 3, -1, 0))
    is2 = piece == 2
    dx = jnp.where(is2, -dx34, dx34)
    dy = jnp.where(is2, -dy34, dy34)
    s2 = _do_wallkick(cfg, ext, piece, rot2, px + dx, py + dy)
    eligible2 = (piece == 2) | (piece == 3) | (piece == 4)
    return jnp.where(piece == 6, False, s1 | (eligible2 & s2))


def _finesse_possible(cfg, ext, piece, rot, px, py):
    """finesseIsPossible (TestField.cpp:189-200) for one rest pose."""
    rows = K.lookup_rows(piece, rot)
    can_l = K.possible(cfg, ext, rows, px - 1, py)
    can_r = K.possible(cfg, ext, rows, px + 1, py)
    h_locked = (~can_l) & (~can_r)
    wk = _reverse_wallkick(cfg, ext, piece, rot, px, py)
    walk = _walk_continuous(cfg, ext, rows, px, py)
    return jnp.where(h_locked, wk, walk)


@partial(jax.jit, static_argnums=0)
def finesse_rests(cfg: EngineConfig, occ, piece, cur_rot):
    """The exact set of finesse emission rests of TestField's search:
    (4, W, H) bool indexed [rot, posX+1, posY].  For each enumerated
    top-drop candidate (rot, x): every free pose at y in
    [top_rest+2, H-2] is dropped to its rest and tested with
    finesseIsPossible (tryAllFinesseMoves, TestField.cpp:174-187).

    Not a hot-path kernel: used by the action-list API and parity tests
    (the training agents act on the top-drop grid)."""
    H, W = cfg.height, cfg.width
    ext = K.ext_board(cfg, occ)
    mask_td, rest_td = top_drop(cfg, occ, piece, cur_rot)
    rots, xs = _grid_coords(cfg)
    n_sym = jnp.asarray(N_SYM_ROT)[piece]
    eff_rot = jnp.where(n_sym == 1, cur_rot, rots)
    enum_ok = rots < n_sym

    def per_cell(r, x, td_ok, r0):
        rows = K.lookup_rows(piece, r)

        def per_y(y0):
            free = K.possible(cfg, ext, rows, x, y0)
            d = K.drop_distance(cfg, ext, rows, x, y0)
            yr = y0 + d
            cand = td_ok & free & (y0 >= r0 + 2) & (y0 <= H - 2)
            ok = cand & _finesse_possible(cfg, ext, piece, r, x, yr)
            return ok, yr

        oks, yrs = jax.vmap(per_y)(jnp.arange(H, dtype=I32))
        return jnp.any(oks[None, :] & (yrs[None, :] ==
                                       jnp.arange(H, dtype=I32)[:, None]),
                       axis=1)                                # (H,)

    rest = jax.vmap(jax.vmap(per_cell))(eff_rot, xs, mask_td, rest_td)
    return rest & (enum_ok & mask_td)[:, :, None]


@partial(jax.jit, static_argnums=0)
def legal_rests(cfg: EngineConfig, occ, piece, cur_rot):
    """The FULL legal placement set the reference's get_actions returns to
    agents (tetris_environment.py:77-85: TestField's top-drop masks plus
    finesse emissions): (4, W, H) bool indexed [rot, posX+1, posY].  rot is
    the enumerated row — pieces with one enumerated rotation (O) execute at
    their current rotation; execute a cell via env.step_pose."""
    H = cfg.height
    mask_td, rest_td = top_drop(cfg, occ, piece, cur_rot)
    td = (jnp.arange(H, dtype=I32)[None, None, :] == rest_td[:, :, None]) \
        & mask_td[:, :, None]
    return td | finesse_rests(cfg, occ, piece, cur_rot)


@partial(jax.jit, static_argnums=0)
def pose_boards(cfg: EngineConfig, occ, garb, piece, cur_rot):
    """World-model successors over the FULL legal set (top-drop ∪ finesse):
    (rest (4, W, H), occ_after (4, W, H, H), cleared (4, W, H)) — the
    fixed-shape analog of simulate_all_actions over get_actions
    (tetris_environment.py:77-100) that lets SIXten/Sherlock-style agents
    act on tucks/slides/kick-rests, not just the top-drop grid."""
    H = cfg.height
    rest = legal_rests(cfg, occ, piece, cur_rot)
    rots, xs = _grid_coords(cfg)
    n_sym = jnp.asarray(N_SYM_ROT)[piece]
    eff_rot = jnp.where(n_sym == 1, cur_rot, rots)

    def one(r, x, m_y):
        rows = K.lookup_rows(piece, r)

        def at_y(y, m):
            o2 = K.add_piece(cfg, occ, rows, x, y)
            o3, g3, n_cl, _ = K.clear_lines(cfg, o2, garb, y)
            return jnp.where(m, o3, occ), jnp.where(m, n_cl, 0)

        return jax.vmap(at_y)(jnp.arange(H, dtype=I32), m_y)

    occ_after, cleared = jax.vmap(jax.vmap(one))(eff_rot, xs, rest)
    return rest, occ_after, cleared


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


# ---------------------------------------------------------------------------
# Key-sequence reconstruction: an executable key macro per finesse rest.
#
# The reference emits a key-press macro for EVERY placement — top-drop
# macros from makeStartSequence (TestField.cpp:44-49, 113-125) and finesse
# macros recorded by its backtracking search.  The engine executes finesse
# rests as direct pose-locks (step.apply_pose) on the hot path; this module
# recovers an equivalent macro from the reachability BFS's parent chain so
# `step_keys` can replay any legal placement end-to-end (r3 VERDICT
# missing item 1).  Key codes are the engine's own (PythonHandle.h:20-31):
# 1 left, 3 right, 5 down, 8 cw, 9 ccw, 10 flip, 7 hard drop; 0 pads as a
# no-op.  The BFS moves are exactly apply_key's transitions (single-step
# try_move / try_rotate with kicks), so replaying the chain through
# step_keys reproduces the pose bit-exactly.
# ---------------------------------------------------------------------------

_KEY_HARD_DROP = 7


@partial(jax.jit, static_argnums=(0, 5))
def reachable_paths(cfg: EngineConfig, occ, piece, cur_rot, start,
                    max_iters: int = 0):
    """`reachable` with parent/move recovery.

    Returns (rest (4, W, H) bool, parent (S,) int32, move (S,) int32)
    where S = 4*(W+4)*(H+4) flat pose states enc = (r*(W+4)+ix)*(H+4)+iy,
    ix = posX+2, iy = posY+1.  parent[s] = -1 for the spawn pose and
    unreached states; move[s] is the key code that enters s from
    parent[s]."""
    H, W = cfg.height, cfg.width
    ext = K.ext_board(cfg, occ)
    XOFF, YOFF = 2, 1
    NX, NY = W + 4, H + 4
    rots = jnp.arange(4, dtype=I32)
    ixs = jnp.arange(NX, dtype=I32)
    iys = jnp.arange(NY, dtype=I32)

    def pose_ok(r, ix, iy):
        return K.possible(cfg, ext, K.lookup_rows(piece, r),
                          ix - XOFF, iy - YOFF)

    ok = jax.vmap(lambda r: jax.vmap(lambda ix: jax.vmap(
        lambda iy: pose_ok(r, ix, iy))(iys))(ixs))(rots)      # (4, NX, NY)

    def rot_target(r, ix, iy, turns):
        _, r2, x2, y2, _rows = K.try_rotate(
            cfg, ext, piece, r, ix - XOFF, iy - YOFF, turns)
        return r2, x2 + XOFF, y2 + YOFF

    def all_rot_targets(turns):
        return jax.vmap(lambda r: jax.vmap(lambda ix: jax.vmap(
            lambda iy: rot_target(r, ix, iy, turns))(iys))(ixs))(rots)

    # (cw, ccw, flip) with their key codes
    rot_moves = [(all_rot_targets(t), k)
                 for t, k in ((1, 8), (3, 9), (2, 10))]

    enc3 = ((jnp.arange(4, dtype=I32)[:, None, None] * NX
             + jnp.arange(NX, dtype=I32)[None, :, None]) * NY
            + jnp.arange(NY, dtype=I32)[None, None, :])        # (4, NX, NY)

    r0, x0, y0 = start
    seed = jnp.zeros((4, NX, NY), bool).at[r0, x0 + XOFF, y0 + YOFF].set(True)
    seed = seed & ok

    def shift(a, dx, dy):
        return jnp.roll(a, (dx, dy), axis=(1, 2))

    # sources at the wrapped borders (posX in {-2, W+1}, posY = H+3) are
    # never `ok` (a piece always has a filled cell on the board), so
    # roll's wraparound cannot fabricate reachability or parents.
    shift_moves = ((-1, 0, 1), (1, 0, 3), (0, 1, 5))   # (dx, dy, key)

    def body(_, carry):
        reach, parent, move = carry
        cand_p = jnp.full_like(enc3, -1)
        cand_m = jnp.full_like(enc3, -1)
        for dx, dy, keycode in shift_moves:
            c = shift(reach, dx, dy) & ok & ~reach
            src = shift(enc3, dx, dy)              # enc of (r, ix-dx, iy-dy)
            take = c & (cand_p < 0)
            cand_p = jnp.where(take, src, cand_p)
            cand_m = jnp.where(take, keycode, cand_m)
        for (r2, x2, y2), keycode in rot_moves:
            scat = jnp.full_like(enc3, -1).at[
                r2.reshape(-1), x2.reshape(-1), y2.reshape(-1)
            ].max(jnp.where(reach, enc3, -1).reshape(-1), mode="drop")
            c = (scat >= 0) & ok & ~reach
            take = c & (cand_p < 0)
            cand_p = jnp.where(take, scat, cand_p)
            cand_m = jnp.where(take, keycode, cand_m)
        newly = cand_p >= 0
        parent = jnp.where(newly, cand_p, parent)
        move = jnp.where(newly, cand_m, move)
        return reach | newly, parent, move

    iters = max_iters or 2 * (NX + NY)
    reach, parent, move = jax.lax.fori_loop(
        0, iters, body, (seed, jnp.full_like(enc3, -1),
                         jnp.full_like(enc3, -1)))

    below_free = jnp.roll(ok, -1, axis=2)
    rest = (reach & ~below_free)[:, XOFF - 1:XOFF - 1 + W, YOFF:YOFF + H]
    return rest, parent.reshape(-1), move.reshape(-1)


@partial(jax.jit, static_argnums=(0,))
def placement_keys(cfg: EngineConfig, occ, piece, cur_rot, start,
                   rot_abs, col, y):
    """The executable key macro reaching rest pose (rot_abs, posX = col-1,
    posY = y) from the spawn pose `start` = (rot0, px0, py0): a 0-padded
    (2*(W+H)+9,) int32 key vector ending in hard drop, and an `ok` flag
    (False when the pose is unreachable by key presses — the caller falls
    back to apply_pose).  The macro replays bit-exactly through
    `step.step_keys` (tests/test_finesse.py macro-lock parity)."""
    H, W = cfg.height, cfg.width
    XOFF, YOFF = 2, 1
    NX, NY = W + 4, H + 4
    L = 2 * (NX + NY)
    rest, parent, move = reachable_paths(cfg, occ, piece, cur_rot, start)
    t_enc = ((jnp.clip(rot_abs, 0, 3) * NX + (col - 1) + XOFF) * NY
             + y + YOFF)
    in_range = (col - 1 >= -XOFF) & (col - 1 < W + 2) & \
        (y >= -YOFF) & (y < H + 3)
    t_enc = jnp.where(in_range, t_enc, 0)
    # target must be reachable (parent >= 0, or it IS the spawn pose)
    r0, x0, y0 = start
    spawn_enc = ((r0 * NX + x0 + XOFF) * NY + y0 + YOFF)
    ok = in_range & ((parent[t_enc] >= 0) | (t_enc == spawn_enc))

    def step(t, _):
        mv = jnp.where(t >= 0, move[jnp.maximum(t, 0)], -1)
        nxt = jnp.where(t >= 0, parent[jnp.maximum(t, 0)], -1)
        return nxt, mv

    _, mvs = jax.lax.scan(step, jnp.where(ok, t_enc, -1), None, length=L)
    # mvs runs target -> spawn; forward order is the reverse, with the
    # chain's -1 tail becoming leading no-op padding (key 0)
    fwd = jnp.maximum(mvs[::-1], 0).astype(I32)
    keys = jnp.concatenate([fwd, jnp.where(ok, _KEY_HARD_DROP, 0)[None]])
    return keys, ok
