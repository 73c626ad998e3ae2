"""Engine configuration and functional game state.

The reference engine keeps per-player state scattered across mutable C++
objects with process-global board dimensions (gameField.cpp:7-8) and
wall-clock seeding (PythonHandle.cpp:68-71).  Here the whole game is one
immutable pytree of arrays:

  * board occupancy is a bitboard: one uint32 per row, bit x == column x
    (collision/movement become a handful of integer lane ops — VPU-friendly
    and trivially vmappable over thousands of games);
  * all timers/counters are int32 scalars per player;
  * the garbage queue (std::vector<Garbage> in Garbage.h) is a fixed-capacity
    ring buffer;
  * RNG is explicit: per-player (key, draw-counter) pairs; parity tests can
    instead inject precomputed uniform streams (see step.py).

Board-size/piece-set are static config (compiled in), fixing the
single-config-per-process limitation the reference README lists as a known
issue (README.md:111).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from drl_tetris_tpu.engine import pieces as P


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static (hashable) engine configuration.

    Mirrors the knobs of the reference backend: board size
    (PythonHandle.cpp:5-8), the piece filter map set via ``set_pieces``
    (PythonHandle.h:116-121), and the timing constants
    (Garbage.cpp:4-7, Combo.cpp:4-5, DropDelay.cpp:28-35).
    """
    height: int = 22
    width: int = 10
    n_players: int = 2
    # randomizer_map: getPiece() output is mapped through this table
    # (gamePlay.cpp:74).  Built from settings["pieces"] as (pieces*7)[:7]
    # (tetris_environment.py:191-193).
    piece_map: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6)
    garbage_cap: int = 32          # ring capacity for pending garbage entries
    # Timing constants (documented in the respective subsystem fns)
    garbage_initial_delay: int = 1000
    garbage_add_delay: int = 450
    garbage_freeze_delay: int = 450
    combo_line_mult: int = 1000
    combo_static_mult: int = 800
    lockdown_ms: int = 400
    # Bound for the S/Z reroll loop (gamePlay.cpp:223-228).  P(k rerolls) ~
    # (2/7)^k: at 12 the truncation probability is ~3e-7 per round, and the
    # consequence is only an S/Z opening piece.  Parity tests may raise it.
    max_seed_rerolls: int = 12

    def __post_init__(self):
        assert 4 <= self.width <= 25, "bitboard layout supports width 4..25"
        assert self.height >= 4
        assert self.n_players >= 1
        assert len(self.piece_map) == 7

    @property
    def only_zs(self) -> bool:
        # PythonHandle.h set_pieces: only_zs = all mapped pieces are S/Z (2/3)
        return all(v in (2, 3) for v in self.piece_map)

    @property
    def full_row(self) -> int:
        return (1 << self.width) - 1

    @property
    def wall_mask(self) -> int:
        """Bits outside the playfield in the 4-bit-left-shifted 'extended'
        row representation: bits 0..3 (left wall) and >= width+4 (right)."""
        low = 0xF
        high = (0xFFFFFFFF << (self.width + 4)) & 0xFFFFFFFF
        return low | high


# getPiece's initial bag weights: cogP[i] = 1000/7 — INTEGER division in the
# reference (randomizer.cpp:58), so 142.0, not 142.857; the bag total is 994.
_COGP_INIT = np.float32(1000 // 7)


@struct.dataclass
class PlayerState:
    """Per-player state; every field has leading dim (n_players,)."""
    # Board: bit x of occ[y] == cell (y, x) occupied; garb marks tile==8 cells
    # (garbage rows, gamePlay.cpp:199-204) for the line-clear stats.
    occ: jnp.ndarray        # (P, H) uint32
    garb: jnp.ndarray       # (P, H) uint32
    # Falling piece (BasicField::piece, pieces.h:7-26)
    piece: jnp.ndarray      # (P,) int32  0..6
    rot: jnp.ndarray        # (P,) int32  absolute rotation (current_rotation)
    px: jnp.ndarray         # (P,) int32  posX
    py: jnp.ndarray         # (P,) int32  posY
    cur_rows: jnp.ndarray   # (P, 4) uint32 cached ROW_MASKS[piece, rot]
    nextpiece: jnp.ndarray  # (P,) int32
    # Time & gravity (DropDelay.h)
    time_ms: jnp.ndarray            # (P,) int32
    drop_delay: jnp.ndarray         # (P,) int32
    drop_delay_time: jnp.ndarray    # (P,) int32
    incr_dd_time: jnp.ndarray       # (P,) int32
    lockdown: jnp.ndarray           # (P,) bool
    lockdown_time: jnp.ndarray      # (P,) int32
    # Combo (Combo.h)
    combo_start: jnp.ndarray        # (P,) int32
    combo_time: jnp.ndarray         # (P,) int32
    combo_count: jnp.ndarray        # (P,) int32
    combo_line_count: jnp.ndarray   # (P,) int32
    combo_remaining: jnp.ndarray    # (P,) int32 (uint16 'remaining' in ref)
    # Garbage FIFO (Garbage.h std::vector<Garbage>): the front entry always
    # lives at slot 0 (pops shift left) so front accesses are static indexes
    g_count: jnp.ndarray    # (P, CAP) int32
    g_delay: jnp.ndarray    # (P, CAP) int32
    g_size: jnp.ndarray     # (P,) int32
    g_min_remaining: jnp.ndarray  # (P,) int32
    # Inter-player line transfer (gamePlay.h: incoming_lines float)
    incoming_lines: jnp.ndarray   # (P,) float32
    incoming_count: jnp.ndarray   # (P,) int32 (garbage.count() snapshot)
    # Stats (GameplayData, gamePlay.h)
    lines_sent: jnp.ndarray       # (P,) int32
    lines_recv: jnp.ndarray       # (P,) int32
    garbage_cleared: jnp.ndarray  # (P,) int32
    lines_cleared: jnp.ndarray    # (P,) int32 (data.linesCleared)
    lines_blocked: jnp.ndarray    # (P,) int32
    max_combo: jnp.ndarray        # (P,) int32
    # Reward bookkeeping (PythonHandle.cpp:176-177)
    lines_cleared_snap: jnp.ndarray  # (P,) int32 (GamePlay::linesCleared)
    reward: jnp.ndarray              # (P,) int32
    dead: jnp.ndarray                # (P,) bool
    # RNG: adaptive piece bag (randomizer.cpp:10-32) + hole stream
    cogp: jnp.ndarray         # (P, 7) float32
    lasthole: jnp.ndarray     # (P,) int32
    piece_key: jnp.ndarray    # (P, 2) uint32 jax PRNG key data
    hole_key: jnp.ndarray     # (P, 2) uint32
    piece_draws: jnp.ndarray  # (P,) int32 draw counters (parity injection)
    hole_draws: jnp.ndarray   # (P,) int32


@struct.dataclass
class EngineState:
    players: PlayerState
    round_over: jnp.ndarray   # () bool
    last_winner: jnp.ndarray  # () int32 (-1 = none / draw)


def zeros_player_state(cfg: EngineConfig) -> PlayerState:
    Pn, H, CAP = cfg.n_players, cfg.height, cfg.garbage_cap
    i32 = lambda *s: jnp.zeros(s, jnp.int32)
    return PlayerState(
        occ=jnp.zeros((Pn, H), jnp.uint32),
        garb=jnp.zeros((Pn, H), jnp.uint32),
        piece=i32(Pn), rot=i32(Pn), px=i32(Pn), py=i32(Pn),
        cur_rows=jnp.zeros((Pn, 4), jnp.uint32),
        nextpiece=i32(Pn),
        time_ms=i32(Pn),
        drop_delay=jnp.full((Pn,), 1000, jnp.int32),
        drop_delay_time=i32(Pn),
        incr_dd_time=i32(Pn),
        lockdown=jnp.zeros((Pn,), bool),
        lockdown_time=i32(Pn),
        combo_start=i32(Pn), combo_time=i32(Pn), combo_count=i32(Pn),
        combo_line_count=i32(Pn), combo_remaining=i32(Pn),
        g_count=i32(Pn, CAP), g_delay=i32(Pn, CAP),
        g_size=i32(Pn),
        g_min_remaining=jnp.full((Pn,), cfg.garbage_initial_delay, jnp.int32),
        incoming_lines=jnp.zeros((Pn,), jnp.float32),
        incoming_count=i32(Pn),
        lines_sent=i32(Pn), lines_recv=i32(Pn), garbage_cleared=i32(Pn),
        lines_cleared=i32(Pn), lines_blocked=i32(Pn), max_combo=i32(Pn),
        lines_cleared_snap=i32(Pn), reward=i32(Pn),
        dead=jnp.zeros((Pn,), bool),
        cogp=jnp.full((Pn, 7), _COGP_INIT, jnp.float32),
        lasthole=jnp.full((Pn,), 20, jnp.int32),
        piece_key=jnp.zeros((Pn, 2), jnp.uint32),
        hole_key=jnp.zeros((Pn, 2), jnp.uint32),
        piece_draws=i32(Pn), hole_draws=i32(Pn),
    )


# Static piece tables.  Kept as NUMPY so importing this module never touches
# a device (the axon TPU tunnel takes ~30 s to initialize); inside jit they
# are free constants.  Wrap with jnp.asarray before indexing with tracers.
ROW_MASKS = P.ROW_MASKS        # (7, 4, 4) uint32
SPAWN_ROT = P.SPAWN_ROT        # (7,) int32
N_SYM_ROT = P.N_SYM_ROT        # (7,) int32
TILE = P.TILE                  # (7,) int32
GRIDS = P.GRIDS                # (7, 4, 4, 4) uint8
