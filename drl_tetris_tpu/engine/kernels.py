"""Bitboard primitives: collision, movement, rotation kicks, line clear.

These are the TPU-native replacements for BasicField (gameField.cpp).  Every
function operates on ONE player's board — an (H,) uint32 array where bit x of
row y is cell (y, x) — plus scalar piece coordinates, and is written to be
``vmap``-ed over (players, games).  The sequential C++ loops (slide-until-
blocked, drop-until-blocked) are reformulated as data-parallel first-hit
scans so a step over 4096 games is a few fused elementwise passes instead of
a Python/C++ loop per game.

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

from drl_tetris_tpu.engine.core import EngineConfig, ROW_MASKS

_U32_ONES = jnp.uint32(0xFFFFFFFF)


def ext_board(cfg: EngineConfig, occ: jnp.ndarray) -> jnp.ndarray:
    """Extended rows: playfield shifted left 4 bits, walls/out-of-field solid.

    Bit layout: bits 0..3 = left wall, bits 4..W+3 = playfield columns,
    bits >= W+4 = right wall.  A piece row mask shifted by (posX + 4) can then
    be tested against this with a single AND (bounds checks included), which
    is the whole of BasicField::possible (gameField.cpp:10-20).
    """
    return (occ << 4) | jnp.uint32(cfg.wall_mask)


def ext_board_padded(cfg: EngineConfig, occ: jnp.ndarray) -> jnp.ndarray:
    """ext_board with 4 extra all-solid rows below (floor) for safe gathers."""
    ext = ext_board(cfg, occ)
    return jnp.concatenate([ext, jnp.full((4,), _U32_ONES, jnp.uint32)])


def piece_rows(piece: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """(4,) uint32 grid-row masks for (piece, rot)."""
    return ROW_MASKS[piece, rot]


def shift_rows(masks: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Shift 4-bit grid masks into extended-row coordinates (posX + 4 >= 1)."""
    return masks << (px + 4).astype(jnp.uint32)


def possible(cfg: EngineConfig, ext_pad: jnp.ndarray, piece, rot, px, py) -> jnp.ndarray:
    """BasicField::possible.  ext_pad is ext_board_padded(occ)."""
    masks = piece_rows(piece, rot)                      # (4,)
    ys = py + jnp.arange(4, dtype=jnp.int32)            # (4,)
    # Rows above the field are out-of-bounds (solid); below is covered by the
    # padded floor rows.  Clamp the gather and patch y<0 with all-ones.
    rows = ext_pad[jnp.clip(ys, 0, cfg.height + 3)]
    rows = jnp.where(ys < 0, _U32_ONES, rows)
    hit = rows & shift_rows(masks, px)
    return jnp.all((masks == 0) | (hit == 0))


def drop_distance(cfg: EngineConfig, ext_pad: jnp.ndarray, piece, rot, px, py) -> jnp.ndarray:
    """Max d such that the piece can move down d rows from (px, py) without
    collision (the loop in BasicField::hd, gameField.cpp:49-53), computed as
    a data-parallel first-hit scan over rows."""
    H = cfg.height
    masks = piece_rows(piece, rot)                          # (4,)
    sh = shift_rows(masks, px)                              # (4,)
    ys = jnp.arange(H + 4, dtype=jnp.int32)                 # (H+4,)
    # hits[i, y] : piece grid-row i collides when placed so that grid row i
    # sits at board row y.
    hits = (ext_pad[None, :] & sh[:, None]) != 0            # (4, H+4)
    rel = ys[None, :] - (py + jnp.arange(4, dtype=jnp.int32))[:, None]  # depth d
    cand = hits & (rel >= 1) & (masks[:, None] != 0)
    big = jnp.int32(1 << 20)
    first = jnp.min(jnp.where(cand, rel, big), axis=1)      # (4,) first bad d
    first = jnp.where(masks == 0, big, first)
    return jnp.maximum(jnp.min(first) - 1, 0)


def slide_distance(cfg: EngineConfig, ext_pad: jnp.ndarray, piece, rot, px, py,
                   direction: int) -> jnp.ndarray:
    """Max number of 1-cell steps left (direction=-1) or right (+1) before the
    first obstruction — step-by-step movement cannot tunnel past a blocked
    intermediate position, so this equals the reference's while(mLeft()) /
    repeated mRight loops."""
    W = cfg.width
    masks = piece_rows(piece, rot)                          # (4,)
    ys = py + jnp.arange(4, dtype=jnp.int32)
    rows = ext_pad[jnp.clip(ys, 0, cfg.height + 3)]
    rows = jnp.where(ys < 0, _U32_ONES, rows)               # (4,)
    steps = jnp.arange(1, W + 4, dtype=jnp.int32)           # (S,)
    shift = (px + 4) + direction * steps                    # (S,)
    ok_shift = (shift >= 0) & (shift <= 27)
    sh = masks[None, :] << jnp.clip(shift, 0, 27)[:, None].astype(jnp.uint32)  # (S, 4)
    coll = jnp.any((rows[None, :] & sh) != 0, axis=1) | ~ok_shift
    big = jnp.int32(1 << 20)
    first_block = jnp.min(jnp.where(coll, steps, big))
    return first_block - 1


def try_move(cfg: EngineConfig, ext_pad, piece, rot, px, py, dx: int, dy: int):
    """mLeft/mRight/mDown: returns (moved?, new px, new py)."""
    nx, ny = px + dx, py + dy
    ok = possible(cfg, ext_pad, piece, rot, nx, ny)
    return ok, jnp.where(ok, nx, px), jnp.where(ok, ny, py)


# Rotation kick candidates, in exact probe order: the plain rotation
# (gameField.cpp:55-65) then the 7 kickTest probes (gameField.cpp:93-103):
# (0,+1), (-1,0), (+1,0), (-1,+1), (+1,+1), (-2,0), (+2,0).  dy positive = down.
_KICKS = jnp.array(
    [(0, 0), (0, 1), (-1, 0), (1, 0), (-1, 1), (1, 1), (-2, 0), (2, 0)],
    dtype=jnp.int32,
)


def try_rotate(cfg: EngineConfig, ext_pad, piece, rot, px, py, turns: int):
    """rcw (turns=1) / rccw (turns=3) / r180 (turns=2) with the kick sequence.
    Returns (rotated?, rot', px', py').  On failure the piece is unchanged
    (the C++ pos fiddling nets out to a restore, gameField.cpp:55-91)."""
    new_rot = jnp.mod(rot + turns, 4)
    cx = px + _KICKS[:, 0]
    cy = py + _KICKS[:, 1]
    ok = jax.vmap(lambda x, y: possible(cfg, ext_pad, piece, new_rot, x, y))(cx, cy)
    any_ok = jnp.any(ok)
    idx = jnp.argmax(ok)  # first True
    return (
        any_ok,
        jnp.where(any_ok, new_rot, rot),
        jnp.where(any_ok, cx[idx], px),
        jnp.where(any_ok, cy[idx], py),
    )


def add_piece(cfg: EngineConfig, occ: jnp.ndarray, piece, rot, px, py) -> jnp.ndarray:
    """BasicField::addPiece: OR the 4 grid rows into the board (plain, un-
    shifted bit space).  Positions are guaranteed in-bounds by possible()."""
    masks = piece_rows(piece, rot)
    sh = jnp.where(px >= 0, masks << px.astype(jnp.uint32),
                   masks >> (-px).astype(jnp.uint32))
    ys = py + jnp.arange(4, dtype=jnp.int32)
    ys = jnp.where(masks == 0, cfg.height + 8, ys)  # out-of-range => dropped
    return occ.at[ys].set(occ[jnp.clip(ys, 0, cfg.height - 1)] | sh, mode="drop")


def clear_lines(cfg: EngineConfig, occ, garb, py):
    """BasicField::clearlines (gameField.cpp:120-145).

    Scans only rows r = py + y for y in [0, H-1] (clipped) — i.e. rows from
    the piece's top downward; with negative py the bottom |py| rows are NOT
    scanned (a faithful quirk).  Returns (occ', garb', n_cleared, n_garbage_rows).
    """
    H = cfg.height
    rs = jnp.arange(H, dtype=jnp.int32)
    in_scan = (rs >= py) & (rs <= py + H - 1)
    full = (occ == jnp.uint32(cfg.full_row)) & in_scan
    n_cleared = jnp.sum(full).astype(jnp.int32)
    n_garb = jnp.sum(full & (garb != 0)).astype(jnp.int32)
    # removeline shifts rows above the removed row down by one: each kept row
    # moves down by the number of full rows BELOW it (larger index).
    full_below = jnp.cumsum(full[::-1])[::-1] - full.astype(jnp.int32)
    dst = jnp.where(full, H + 8, rs + full_below)  # out-of-range => dropped
    occ2 = jnp.zeros_like(occ).at[dst].set(occ, mode="drop")
    garb2 = jnp.zeros_like(garb).at[dst].set(garb, mode="drop")
    return occ2, garb2, n_cleared, n_garb


def add_garbage_line(cfg: EngineConfig, occ, garb, hole):
    """gamePlay.cpp:199-204: shift the field up one row; the new bottom row is
    all garbage (tile 8) with a single hole."""
    row = jnp.uint32(cfg.full_row) & ~(jnp.uint32(1) << hole.astype(jnp.uint32))
    occ2 = jnp.concatenate([occ[1:], row[None]])
    garb2 = jnp.concatenate([garb[1:], row[None]])
    return occ2, garb2
