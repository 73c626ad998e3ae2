"""Board rendering.

The reference renders through a pygame singleton
(environment/env_utils/draw_tetris.py:8-143) that draws arbitrary grids of
fields with auto-rescaling and a color theme.  This environment is headless-
first: the primary renderer emits ANSI terminal frames (same grid-of-fields
layout, 256-color theme); a pygame window is used only if pygame imports
and the caller asks for it.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from drl_tetris_tpu.engine.core import EngineConfig, EngineState, GRIDS

# Default color theme, one entry per tile value 1..8 (presets.py:164-174's
# hex theme, mapped to xterm-256 approximations).
_TILE_COLORS = [129, 208, 93, 199, 201, 202, 57, 240]
_RESET = "\x1b[0m"


def progress_bar(current, total, length: int = 30, start: str = "[",
                 stop: str = "]", done: str = "|", remaining: str = "-"
                 ) -> str:
    """The reference's textual bar (tools/utils.py:103-107), used by the
    eval-time NN entropy visualization (scripts/eval.py:17-28)."""
    progress = 0.0 if total <= 0 else min(max(current / total, 0.0), 1.0)
    done_ticks = round(progress * length)
    return start + done * done_ticks + remaining * (length - done_ticks) + stop


def field_arrays(cfg: EngineConfig, state: EngineState,
                 with_piece: bool = True) -> np.ndarray:
    """(N, P, H, W) uint8 tile arrays from a batched engine state: 1 for
    stack cells, 8 for garbage cells, piece tile for the falling piece."""
    ps = state.players
    occ = np.asarray(ps.occ)
    garb = np.asarray(ps.garb)
    if occ.ndim == 2:  # single game
        occ, garb = occ[None], garb[None]
        piece = np.asarray(ps.piece)[None]
        rot = np.asarray(ps.rot)[None]
        px = np.asarray(ps.px)[None]
        py = np.asarray(ps.py)[None]
        tile_of = None
    else:
        piece, rot = np.asarray(ps.piece), np.asarray(ps.rot)
        px, py = np.asarray(ps.px), np.asarray(ps.py)
    N, P = occ.shape[:2]
    H, W = cfg.height, cfg.width
    bits = (occ[..., None] >> np.arange(W, dtype=np.uint32)) & 1
    gbits = (garb[..., None] >> np.arange(W, dtype=np.uint32)) & 1
    out = bits.astype(np.uint8)
    out[gbits.astype(bool)] = 8
    if with_piece:
        grids = GRIDS  # (7, 4, 4, 4) numpy
        for n in range(N):
            for p in range(P):
                g = grids[piece[n, p], rot[n, p]]
                for yy in range(4):
                    for xx in range(4):
                        if g[yy, xx]:
                            y, x = py[n, p] + yy, px[n, p] + xx
                            if 0 <= y < H and 0 <= x < W:
                                out[n, p, y, x] = piece[n, p] + 1
    return out


def ansi_field(field: np.ndarray) -> List[str]:
    """One field -> list of text rows using colored half-blocks."""
    H, W = field.shape
    rows = []
    for y in range(H):
        row = "|"
        for x in range(W):
            v = int(field[y, x])
            if v == 0:
                row += "  "
            else:
                c = _TILE_COLORS[min(v, 8) - 1]
                row += f"\x1b[48;5;{c}m  {_RESET}"
        rows.append(row + "|")
    rows.append("+" + "--" * W + "+")
    return rows


def render_ansi(cfg: EngineConfig, state: EngineState, max_games: int = 4,
                titles: Optional[Sequence[str]] = None) -> str:
    """Grid layout like drawAllFields (draw_tetris.py:103-143): one row per
    game, players side by side."""
    fields = field_arrays(cfg, state)
    N = min(fields.shape[0], max_games)
    blocks = []
    for n in range(N):
        cols = [ansi_field(fields[n, p]) for p in range(fields.shape[1])]
        header = ""
        if titles:
            header = "   ".join(t.ljust(2 * cfg.width + 2) for t in titles) + "\n"
        rows = ["   ".join(col[i] for col in cols)
                for i in range(len(cols[0]))]
        blocks.append(header + "\n".join(rows))
    return "\n\n".join(blocks)


def get_pygame_renderer(*args, **kwargs):
    """Optional pygame window (the reference's draw_tetris singleton).
    Returns None when pygame is unavailable (headless images)."""
    try:
        import pygame  # noqa: F401
    except Exception:
        return None
    from drl_tetris_tpu.utils import render_pygame
    return render_pygame.Renderer(*args, **kwargs)
