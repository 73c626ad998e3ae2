"""Finesse-set parity: the JAX finesse kernel must reproduce TestField's
heuristic search emission-for-emission (as rest-pose sets).

The oracle side dumps the rest pose at every point useFinesseMove would
fire (oracle_get_finesse_rests, oracle/wrapper.cpp), i.e. the INTENT set,
independent of the key-path encoding."""
import numpy as np
import jax
import jax.numpy as jnp

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.engine import step as S
from drl_tetris_tpu.engine import masks as M
from tests.oracle import Oracle
from tests.test_parity import jax_reset_like_oracle

import pytest

pytestmark = pytest.mark.slow  # heavy compiles; deselect with -m 'not slow'

CFG = EngineConfig()


def oracle_rest_sets(oracle, p):
    """(topdrop_set, finesse_set) of (grid_row, posX, posY).  grid_row is
    the mask row index: absolute rotation, except the O piece (single
    enumerated rotation) which lives in row 0."""
    d = oracle.dump(p)
    piece = d.scalars["piece"]
    rows = oracle.get_finesse_rests(p)
    td, fin = set(), set()
    for kind, rot, x, y in rows:
        row = 0 if piece == 6 else int(rot)
        (td if kind == 0 else fin).add((row, int(x), int(y)))
    return td, fin


def jax_rest_sets(cfg, st, p):
    ps = st.players
    mask, rest = M.top_drop(cfg, ps.occ[p], ps.piece[p], ps.rot[p])
    fin = M.finesse_rests(cfg, ps.occ[p], ps.piece[p], ps.rot[p])
    mask, rest, fin = map(np.asarray, (mask, rest, fin))
    td_set = {(r, c - 1, int(rest[r, c]))
              for r in range(4) for c in range(cfg.width) if mask[r, c]}
    fin_set = {(r, c - 1, y)
               for r in range(4) for c in range(cfg.width)
               for y in range(cfg.height) if fin[r, c, y]}
    return td_set, fin_set


def test_finesse_parity_random_play():
    """Drive oracle + JAX engine in lockstep; compare top-drop AND finesse
    rest sets every tick for both players."""
    s1, s2 = 11, 77
    oracle = Oracle(CFG.height, CFG.width, 2, s1, s2)
    st, tables = jax_reset_like_oracle(CFG, s1, s2)
    rng = np.random.RandomState(5)
    checked = finesse_nonempty = 0
    for tick in range(80):
        for p in range(2):
            o_td, o_fin = oracle_rest_sets(oracle, p)
            j_td, j_fin = jax_rest_sets(CFG, st, p)
            assert j_td == o_td, (
                f"tick {tick} p{p} TOPDROP jax-only={j_td - o_td} "
                f"oracle-only={o_td - j_td}")
            assert j_fin == o_fin, (
                f"tick {tick} p{p} FINESSE jax-only={j_fin - o_fin} "
                f"oracle-only={o_fin - j_fin}")
            checked += 1
            finesse_nonempty += bool(o_fin)
        player = tick % 2
        r, t = rng.randint(0, 4), rng.randint(0, CFG.width)
        ks = [8] * r + [2] + [3] * t + [7]
        kmat = np.zeros((2, 16), np.int32)
        kmat[player, : len(ks)] = ks
        oracle.step([list(kmat[i]) for i in range(2)], 400)
        st = S.step_keys(CFG, st, jnp.asarray(kmat), jnp.int32(400), tables)
        if bool(st.round_over):
            oracle.reset(s1 + tick, s2 + tick)
            st, tables = jax_reset_like_oracle(CFG, s1 + tick, s2 + tick, st)
    assert checked > 100
    # random stacking must have produced real finesse situations, or the
    # test proves nothing
    assert finesse_nonempty >= 3, finesse_nonempty


def test_finesse_overhang_board():
    """Hand-built overhang: a tuck under a ledge must be emitted by both
    sides identically."""
    H, W = CFG.height, CFG.width
    board = np.zeros((H, W), np.uint8)
    board[H - 3, 0:6] = 1          # ledge 3 rows above floor
    board[H - 2, 4:6] = 1
    # oracle with this board: drive via dump/replay is awkward; instead
    # build the same occupancy in a fresh oracle via garbage-free manual
    # construction is unsupported — so only cross-check the JAX kernel's
    # invariants here: finesse rests are reachable, off-top-drop, and rest
    # poses (cannot move down).
    occ = jnp.asarray(
        [np.uint32(sum(int(board[y, x]) << x for x in range(W)))
         for y in range(H)], jnp.uint32)
    piece, rot = jnp.int32(5), jnp.int32(2)
    fin = np.asarray(M.finesse_rests(CFG, occ, piece, rot))
    mask, rest = map(np.asarray, M.top_drop(CFG, occ, piece, rot))
    from drl_tetris_tpu.engine import kernels as K
    ext = K.ext_board(CFG, occ)
    for r in range(4):
        for c in range(W):
            for y in range(H):
                if not fin[r, c, y]:
                    continue
                rows = K.lookup_rows(piece, jnp.int32(r))
                x = c - 1
                assert bool(K.possible(CFG, ext, rows, jnp.int32(x),
                                       jnp.int32(y)))
                # a rest: cannot move down
                assert not bool(K.possible(CFG, ext, rows, jnp.int32(x),
                                           jnp.int32(y + 1)))
                # strictly below the top-drop rest of that column
                if mask[r, c]:
                    assert y >= int(rest[r, c]) + 2
