"""ctypes driver for the C++ reference oracle (see oracle/wrapper.cpp)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB = "/tmp/drl_tetris_oracle/liboracle.so"

N_SCALARS = 24
N_FLOATS = 9

SCALAR_NAMES = [
    "piece", "rot", "px", "py", "nextpiece", "time_ms", "dead", "reward",
    "lines_cleared", "lines_sent", "garbage_cleared", "lines_blocked",
    "max_combo", "incoming_count", "combo_count", "combo_remaining",
    "g_entries", "g_total", "g_min_remaining", "drop_delay",
    "drop_delay_time", "lockdown", "lockdown_time", "lines_cleared_snap",
]


def _load():
    if not os.path.exists(_LIB):
        subprocess.run([os.path.join(_REPO, "oracle", "build.sh")], check=True)
    lib = ctypes.CDLL(_LIB)
    lib.oracle_step.restype = ctypes.c_int
    lib.oracle_get_actions.restype = ctypes.c_int
    lib.oracle_get_finesse_rests.restype = ctypes.c_int
    lib.oracle_last_winner.restype = ctypes.c_int
    lib.oracle_round_over.restype = ctypes.c_int
    return lib


@dataclass
class PlayerDump:
    field: np.ndarray   # (H, W) uint8 raw tile values
    scalars: dict
    incoming_lines: float
    cogp: np.ndarray    # (7,) float32


class Oracle:
    def __init__(self, height=22, width=10, n_players=2, seed1=1, seed2=2,
                 piece_map=(0, 1, 2, 3, 4, 5, 6)):
        self.lib = _load()
        self.h, self.w, self.n = height, width, n_players
        pm = (ctypes.c_uint8 * 7)(*piece_map)
        self.lib.oracle_set_pieces(pm)
        self.lib.oracle_init(height, width, n_players, seed1, seed2)

    def reset(self, seed1, seed2):
        self.lib.oracle_reset(seed1, seed2)

    def step(self, keys, dt=400) -> bool:
        """keys: list of per-player key lists."""
        kmax = max((len(k) for k in keys), default=0)
        kmax = max(kmax, 1)
        flat = np.zeros((self.n, kmax), np.int32)
        for i, k in enumerate(keys):
            flat[i, :len(k)] = k
        buf = flat.ravel().astype(np.int32)
        return bool(self.lib.oracle_step(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), kmax, dt))

    def dump(self, p) -> PlayerDump:
        field = np.zeros(self.h * self.w, np.uint8)
        scalars = np.zeros(N_SCALARS, np.int32)
        floats = np.zeros(N_FLOATS, np.float32)
        self.lib.oracle_dump_player(
            p,
            field.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            scalars.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            floats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return PlayerDump(
            field=field.reshape(self.h, self.w),
            scalars=dict(zip(SCALAR_NAMES, scalars.tolist())),
            incoming_lines=float(floats[0]),
            cogp=floats[1:8].copy(),
        )

    def get_actions(self, p, max_actions=4096, max_len=64):
        out = np.full(max_actions * max_len, -2, np.int32)
        n = self.lib.oracle_get_actions(
            p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            max_actions, max_len)
        acts = []
        out = out.reshape(max_actions, max_len)
        for a in range(n):
            row = out[a]
            end = np.argmax(row == -1)
            acts.append(row[:end].tolist())
        return acts

    def get_finesse_rests(self, p, max_rests=8192):
        """(kind, rot, posX, posY) rows: kind 0 = top-drop rest, 1 = finesse
        emission rest (oracle_get_finesse_rests in wrapper.cpp)."""
        out = np.zeros(max_rests * 4, np.int32)
        n = self.lib.oracle_get_finesse_rests(
            p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_rests)
        return out.reshape(max_rests, 4)[:min(n, max_rests)].copy()

    @property
    def round_over(self):
        return bool(self.lib.oracle_round_over())

    @property
    def last_winner(self):
        return int(self.lib.oracle_last_winner())

    def uniform_stream(self, seed, n):
        out = np.zeros(n, np.float32)
        self.lib.oracle_uniform_stream(
            seed, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
