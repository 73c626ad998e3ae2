"""Placement-mask parity: top-drop action set vs the reference TestField."""
import numpy as np
import jax
import jax.numpy as jnp

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.engine import step as S
from drl_tetris_tpu.engine import masks as M
from drl_tetris_tpu.engine.pieces import SPAWN_ROT
from tests.oracle import Oracle
from tests.test_parity import jax_reset_like_oracle

import pytest

pytestmark = pytest.mark.slow  # heavy compiles; deselect with -m 'not slow'

CFG = EngineConfig()


def oracle_topdrop_set(oracle, p):
    """Parse the oracle's action list into the set of top-drop placements
    (absolute rotation, column).  Top-drop entries contain only rotation
    keys {8, 9, 10}, single steps {1, 3}, and the final hard drop 7
    (TestField::findNextMove + convert); finesse entries contain down-moves
    {5, 6}."""
    d = oracle.dump(p)
    piece = d.scalars["piece"]
    spawn = int(SPAWN_ROT[piece])
    out = set()
    for act in oracle.get_actions(p):
        if any(k in (5, 6) for k in act):
            continue  # finesse entry
        rotval = {8: 1, 10: 2, 9: 3}.get(act[0], 0)
        col = 4 + act.count(3) - act.count(1)  # spawn posX=3 -> column 4
        r_abs = (spawn + rotval) % 4
        out.add((r_abs, col))
    return out


def jax_topdrop_set(cfg, st, p):
    ps = st.players
    mask, _ = M.top_drop(cfg, ps.occ[p], ps.piece[p], ps.rot[p])
    mask = np.asarray(mask)
    return {(r, c) for r in range(4) for c in range(cfg.width) if mask[r, c]}


def test_topdrop_parity_random_play():
    """Drive oracle + JAX engine in lockstep; compare the top-drop action
    set at every tick for both players."""
    s1, s2 = 21, 42
    oracle = Oracle(CFG.height, CFG.width, 2, s1, s2)
    st, tables = jax_reset_like_oracle(CFG, s1, s2)
    rng = np.random.RandomState(3)
    checked = 0
    for tick in range(60):
        for p in range(2):
            o_set = oracle_topdrop_set(oracle, p)
            j_set = jax_topdrop_set(CFG, st, p)
            assert j_set == o_set, (
                f"tick {tick} player {p}: jax-only={j_set - o_set}, "
                f"oracle-only={o_set - j_set}")
            checked += 1
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


def test_reachable_superset_of_topdrop():
    """Every top-drop rest position must be reachable by the BFS."""
    st = S.init(CFG, jax.random.PRNGKey(2))
    ps = st.players
    p = 0
    mask, rest = M.top_drop(CFG, ps.occ[p], ps.piece[p], ps.rot[p])
    reach = M.reachable(
        CFG, ps.occ[p], ps.piece[p], ps.rot[p],
        (ps.rot[p], ps.px[p], ps.py[p]))
    mask, rest, reach = map(np.asarray, (mask, rest, reach))
    for r in range(4):
        for c in range(CFG.width):
            if mask[r, c]:
                y = rest[r, c]
                assert reach[r, c, y], (r, c, y)


def test_placement_boards_match_engine_step():
    """placement_boards' resulting occupancy equals actually performing the
    corresponding macro in the engine (for rotation-0 placements where the
    macro lands in the same column)."""
    cfg = CFG
    st = S.init(cfg, jax.random.PRNGKey(7))
    ps = st.players
    p = 0
    mask, occ_after, cleared = M.placement_boards(
        cfg, ps.occ[p], ps.garb[p], ps.piece[p], ps.rot[p])
    mask = np.asarray(mask)
    # take the spawn-rotation placements: r_abs == current rot
    r_abs = int(ps.rot[p])
    from drl_tetris_tpu.engine import kernels as K
    for col in range(cfg.width):
        if not mask[r_abs, col]:
            continue
        x = col - 1
        # emulate: place piece at (x, 0), drop, lock, clear
        ext = K.ext_board(cfg, ps.occ[p])
        rows = K.lookup_rows(ps.piece[p], ps.rot[p])
        d = K.drop_distance(cfg, ext, rows, jnp.int32(x), jnp.int32(0))
        o2 = K.add_piece(cfg, ps.occ[p], rows, jnp.int32(x), d)
        o3, _, n_cl, _ = K.clear_lines(cfg, o2, ps.garb[p], d)
        np.testing.assert_array_equal(
            np.asarray(occ_after[r_abs, col]), np.asarray(o3))
        assert int(cleared[r_abs, col]) == int(n_cl)
