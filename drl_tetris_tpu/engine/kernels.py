"""Bitboard primitives: collision, movement, rotation kicks, line clear.

These are the TPU-native replacements for BasicField (gameField.cpp).  Every
function operates on ONE player's board — an (H,) uint32 array where bit x of
row y is cell (y, x) — plus scalar piece state, and is written to be
``vmap``-ed over (players, games).

Second-generation kernels: NO gathers, NO scatters, NO lax loops on the hot
path.  Dynamic row addressing (ext[py+i] in the C++) is reformulated as
masked whole-column operations (`ys == py+i` selects over the H axis), the
line-clear compaction as an (H, H) one-hot permutation, and piece-table
lookups as unrolled selects — everything lowers to fused VPU elementwise
work across the game batch, which is where a 4096-game step must live.

The current piece's 4 row masks are CACHED in PlayerState.cur_rows
(maintained by spawn/rotation in step.py) so collision tests don't re-read
the shape table.

Semantics references:
  possible()        gameField.cpp:10-20
  mLeft/mRight/mDown/hd  gameField.cpp:22-53
  rcw/rccw/r180 + kickTest  gameField.cpp:55-103
  addPiece          gameField.cpp:105-110
  clearlines/removeline  gameField.cpp:112-145
  addGarbageLine    gamePlay.cpp:199-204
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from drl_tetris_tpu.engine.core import EngineConfig, ROW_MASKS
from drl_tetris_tpu.engine import shifts

_U32_ONES = jnp.uint32(0xFFFFFFFF)
_ROW_MASKS_NP = np.asarray(ROW_MASKS)  # (7, 4, 4) static host copy


def ext_board(cfg: EngineConfig, occ: jnp.ndarray) -> jnp.ndarray:
    """Extended rows: playfield shifted left 4 bits, walls solid.

    Bit layout: bits 0..3 = left wall, bits 4..W+3 = playfield columns,
    bits >= W+4 = right wall.  A piece row mask shifted by (posX + 4) tests
    against this with a single AND — all of BasicField::possible
    (gameField.cpp:10-20) except the floor, handled by row masking."""
    return (occ << 4) | jnp.uint32(cfg.wall_mask)


def lookup_rows(piece, rot) -> jnp.ndarray:
    """(4,) uint32 grid-row masks for (piece, rot) — unrolled selects
    instead of a gather (piece/rot are per-game traced scalars).  Built
    per scalar element from static ints (zero masks skipped): no baked
    array constants, which Pallas kernels may not capture."""
    idx = piece * 4 + rot
    vals = []
    for i in range(4):
        v = jnp.zeros_like(idx).astype(jnp.uint32)
        for p in range(7):
            for r in range(4):
                m = int(_ROW_MASKS_NP[p, r, i])
                if m:
                    v = jnp.where(idx == p * 4 + r, jnp.uint32(m), v)
        vals.append(v)
    return jnp.stack(vals)


def lookup_rows_all(piece) -> jnp.ndarray:
    """(4, 4) uint32 row masks of ALL rotations of ``piece``.  Callers
    doing several rotations of one piece (apply_macro's unrolled rotation
    chain) look this up once and pick rotations with ``select_rot``.
    Scalar-select construction for Pallas (no captured array constants)."""
    rows = []
    for r in range(4):
        vals = []
        for i in range(4):
            v = jnp.zeros_like(piece).astype(jnp.uint32)
            for p in range(7):
                m = int(_ROW_MASKS_NP[p, r, i])
                if m:
                    v = jnp.where(piece == p, jnp.uint32(m), v)
            vals.append(v)
        rows.append(jnp.stack(vals))
    return jnp.stack(rows)


def select_rot(all_rows, rot) -> jnp.ndarray:
    """(4,) row masks for rotation ``rot`` out of a lookup_rows_all table."""
    out = all_rows[0]
    for r in range(1, 4):
        out = jnp.where(rot == r, all_rows[r], out)
    return out


def _piece_column(cfg: EngineConfig, rows4, py):
    """Paint the 4 grid-row masks into an (H,) column at rows py..py+3
    (unshifted bit space) + an out-of-bounds flag for occupied rows that
    fall outside [0, H-1]."""
    H = cfg.height
    ys = jnp.arange(H, dtype=jnp.int32)
    col = jnp.zeros((H,), jnp.uint32)
    oob = jnp.bool_(False)
    for i in range(4):
        yi = py + i
        col = col | jnp.where(ys == yi, rows4[i], jnp.uint32(0))
        oob = oob | ((rows4[i] != 0) & ((yi < 0) | (yi > H - 1)))
    return col, oob


def possible(cfg: EngineConfig, ext: jnp.ndarray, rows4, px, py) -> jnp.ndarray:
    """BasicField::possible.  ext is ext_board(occ); rows4 the piece's grid
    row masks."""
    col, oob = _piece_column(cfg, rows4, py)
    sh = col << (px + 4).astype(jnp.uint32)
    return (~oob) & ~jnp.any((ext & sh) != 0)


def drop_distance(cfg: EngineConfig, ext: jnp.ndarray, rows4, px, py) -> jnp.ndarray:
    """Max d such that the piece can move down d rows from (px, py) without
    collision (the loop in BasicField::hd, gameField.cpp:49-53) as a
    column-parallel first-hit computation."""
    H = cfg.height
    ys = jnp.arange(H, dtype=jnp.int32)
    big = jnp.int32(1 << 20)
    first_block = big
    for i in range(4):
        sh = rows4[i] << (px + 4).astype(jnp.uint32)
        hit = (ext & sh) != 0                      # (H,)
        base = py + i
        d_hit = jnp.min(jnp.where(hit & (ys >= base + 1), ys - base, big))
        d_i = jnp.minimum(d_hit, H - base)         # floor
        first_block = jnp.minimum(first_block,
                                  jnp.where(rows4[i] == 0, big, d_i))
    return jnp.maximum(first_block - 1, 0)


def slide_distance(cfg: EngineConfig, ext: jnp.ndarray, rows4, px, py,
                   direction: int) -> jnp.ndarray:
    """Max 1-cell steps left (direction=-1) or right (+1) before the first
    obstruction — equals the reference's step-by-step while(mLeft()) /
    repeated mRight() loops (movement cannot tunnel)."""
    W = cfg.width
    col, _ = _piece_column(cfg, rows4, py)        # (H,) unshifted
    big = jnp.int32(1 << 20)
    first_block = big
    for s in range(1, W + 4):
        shift = (px + 4) + direction * s
        bad_shift = (shift < 0) | (shift > 27)
        sh = col << jnp.clip(shift, 0, 27).astype(jnp.uint32)
        coll = bad_shift | jnp.any((ext & sh) != 0)
        first_block = jnp.minimum(first_block,
                                  jnp.where(coll, jnp.int32(s), big))
    return first_block - 1


def try_move(cfg: EngineConfig, ext, rows4, px, py, dx: int, dy: int):
    """mLeft/mRight/mDown: returns (moved?, new px, new py)."""
    nx, ny = px + dx, py + dy
    ok = possible(cfg, ext, rows4, nx, ny)
    return ok, jnp.where(ok, nx, px), jnp.where(ok, ny, py)


# Rotation kick candidates, in exact probe order: the plain rotation
# (gameField.cpp:55-65) then the 7 kickTest probes (gameField.cpp:93-103).
_KICKS = ((0, 0), (0, 1), (-1, 0), (1, 0), (-1, 1), (1, 1), (-2, 0), (2, 0))


def try_rotate(cfg: EngineConfig, ext, piece, rot, px, py, turns: int,
               cur_rows=None, all_rows=None):
    """rcw (turns=1) / rccw (turns=3) / r180 (turns=2) with the kick probe
    sequence.  Returns (rotated?, rot', px', py', rows4') where rows4' is
    the piece's (possibly new) cached row masks.

    The 8 probes only ever test dy in {0, 1}, so the piece column is
    painted twice and each probe is a single shifted AND (vs 8 full
    possible() calls).  ``all_rows``: optional lookup_rows_all table when
    the caller rotates the same piece repeatedly."""
    new_rot = jnp.mod(rot + turns, 4)
    new_rows = (select_rot(all_rows, new_rot) if all_rows is not None
                else lookup_rows(piece, new_rot))
    col0, oob0 = _piece_column(cfg, new_rows, py)
    col1, oob1 = _piece_column(cfg, new_rows, py + 1)
    found = jnp.bool_(False)
    bx, by = px, py
    for (dx, dy) in _KICKS:
        col, oob = (col1, oob1) if dy else (col0, oob0)
        sh = col << (px + dx + 4).astype(jnp.uint32)
        ok = (~oob) & ~jnp.any((ext & sh) != 0)
        take = ok & ~found
        bx = jnp.where(take, px + dx, bx)
        by = jnp.where(take, py + dy, by)
        found = found | ok
    if cur_rows is None:
        cur_rows = (select_rot(all_rows, rot) if all_rows is not None
                    else lookup_rows(piece, rot))
    return (found,
            jnp.where(found, new_rot, rot),
            jnp.where(found, bx, px),
            jnp.where(found, by, py),
            jnp.where(found, new_rows, cur_rows))


def add_piece(cfg: EngineConfig, occ: jnp.ndarray, rows4, px, py) -> jnp.ndarray:
    """BasicField::addPiece: OR the 4 grid rows into the board (plain bit
    space).  Positions are guaranteed in-bounds by possible()."""
    col, _ = _piece_column(cfg, rows4, py)
    sh = jnp.where(px >= 0, col << px.astype(jnp.uint32),
                   col >> (-px).astype(jnp.uint32))
    return occ | sh


def clear_lines(cfg: EngineConfig, occ, garb, py):
    """BasicField::clearlines (gameField.cpp:120-145), scatter-free.

    Scans only rows r in [py, py+H-1] clipped to the field (with negative py
    the bottom |py| rows are NOT scanned — a faithful quirk).  Kept rows
    move down by the number of full rows below them.

    A single lock can complete at most 4 rows (the piece touches 4 rows and
    every previously-completed row was cleared inside its own lock's scan
    window — newly full rows always lie in [py, py+3] ⊆ scan), so the
    per-row drop distance is <= 4 and the compaction is 5 masked
    shift-accumulates instead of an (H, H) one-hot select (~5x fewer lane
    ops on the hottest kernel in the tick).
    Returns (occ', garb', n_cleared, n_garbage_rows)."""
    H = cfg.height
    rs = jnp.arange(H, dtype=jnp.int32)
    in_scan = (rs >= py) & (rs <= py + H - 1)
    full = (occ == jnp.uint32(cfg.full_row)) & in_scan
    n_cleared = jnp.sum(full).astype(jnp.int32)
    n_garb = jnp.sum(full & (garb != 0)).astype(jnp.int32)
    # suffix count of full rows strictly below each row (jnp.cumsum/flip
    # have no Mosaic lowering; engine/shifts.py picks log2(H) shift-adds
    # under XLA, one MXU matmul inside the Pallas whole-rollout kernel)
    fi = full.astype(jnp.int32)
    full_below = shifts.suffix_sum(fi) - fi
    occ2 = jnp.zeros_like(occ)
    garb2 = jnp.zeros_like(garb)
    for k in range(5):
        m = (~full) & (full_below == k)          # rows dropping exactly k
        ok = shifts.shift_down(jnp.where(m, occ, 0), k)
        gk = shifts.shift_down(jnp.where(m, garb, 0), k)
        occ2 = occ2 | ok                          # destinations are disjoint
        garb2 = garb2 | gk
    return occ2, garb2, n_cleared, n_garb


def add_garbage_line(cfg: EngineConfig, occ, garb, hole):
    """gamePlay.cpp:199-204: shift the field up one row; the new bottom row
    is all garbage (tile 8) with a single hole.  The hole bit select is
    unrolled over columns (hole is a traced per-game scalar)."""
    # full width-row minus the hole bit — no reduction (Mosaic has no
    # unsigned-reduce lowering, and the closed form is cheaper anyway)
    row = (jnp.uint32((1 << cfg.width) - 1)
           & ~(jnp.uint32(1) << hole.astype(jnp.uint32)))
    # shift + masked bottom-row write instead of a 21+1 concat: Mosaic
    # rejected exactly that tpu.concatenate under the games-minor layout
    # (BENCH_r02 'offset mismatch on non-concat dimension').  The mask is
    # arithmetic 0/1 uint32 — an unbatched CONSTANT bool mask would need an
    # i1 minor-dim broadcast, which Mosaic cannot lower (see step._put).
    m = (jnp.arange(cfg.height) == cfg.height - 1).astype(jnp.uint32)
    occ2 = shifts.shift_up(occ, 1) * (jnp.uint32(1) - m) | row * m
    garb2 = shifts.shift_up(garb, 1) * (jnp.uint32(1) - m) | row * m
    return occ2, garb2
