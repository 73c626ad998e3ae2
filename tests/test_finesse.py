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


def test_placement_keys_replays_legal_rests():
    """Key-sequence reconstruction (r3 VERDICT missing item 1): the key
    macro recovered from the reachability BFS parent chain
    (masks.placement_keys) must replay through step_keys to the same
    outcome as the direct pose-lock (step_pose) — the reference's own
    contract, where every emitted placement IS a key macro
    (TestField.cpp:113-125, makeStartSequence :44-49)."""
    from drl_tetris_tpu.engine.core import N_SYM_ROT
    s1, s2 = 31, 47
    st, tables = jax_reset_like_oracle(CFG, s1, s2)
    rng = np.random.RandomState(8)
    tested = finesse_tested = reachable_cnt = total_cnt = 0
    # board/stream fields that must match bit-exactly after the tick; the
    # key path additionally touches drop-delay timing mid-flight (mdown
    # presses arm gravity/lockdown timers exactly as the reference's key
    # playback does) which the teleporting pose path deliberately skips,
    # so raw timer fields are excluded.
    fields = ("occ", "garb", "piece", "nextpiece", "dead", "reward",
              "lines_sent", "combo_count")
    for tick in range(12):
        p = tick % 2
        ps = st.players
        occ, piece, rot = ps.occ[p], ps.piece[p], ps.rot[p]
        start = (ps.rot[p], ps.px[p], ps.py[p])
        lr = np.asarray(M.legal_rests(CFG, occ, piece, rot))
        mask_td, rest_td = map(np.asarray, M.top_drop(CFG, occ, piece, rot))
        td = np.zeros_like(lr)
        for r in range(4):
            for c in range(CFG.width):
                if mask_td[r, c]:
                    td[r, c, rest_td[r, c]] = True
        n_sym = int(np.asarray(N_SYM_ROT)[int(piece)])
        cells = [tuple(c) for c in np.argwhere(lr)]
        rng.shuffle(cells)
        fin_cells = [c for c in cells if not td[c]]
        pick = (fin_cells + [c for c in cells if td[c]])[:6]
        advance = None
        for (r, c, y) in pick:
            rot_exec = int(np.asarray(start[0])) if n_sym == 1 else int(r)
            keys, ok = M.placement_keys(
                CFG, occ, piece, rot, start,
                jnp.int32(rot_exec), jnp.int32(c), jnp.int32(y))
            total_cnt += 1
            if not bool(ok):
                continue
            reachable_cnt += 1
            kmat = np.zeros((2, int(keys.shape[0])), np.int32)
            kmat[p] = np.asarray(keys)
            use = jnp.asarray(np.eye(2, dtype=bool)[p])
            r_v = jnp.full((2,), rot_exec, jnp.int32)
            c_v = jnp.full((2,), int(c), jnp.int32)
            y_v = jnp.full((2,), int(y), jnp.int32)
            s_keys = S.step_keys(CFG, st, jnp.asarray(kmat),
                                 jnp.int32(400), tables)
            s_pose = S.step_pose(CFG, st, use, r_v, c_v, y_v,
                                 jnp.int32(400), tables)
            for f in fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(s_keys.players, f)),
                    np.asarray(getattr(s_pose.players, f)),
                    err_msg=f"tick {tick} p{p} rest {(r, c, y)} field {f}")
            assert bool(s_keys.round_over) == bool(s_pose.round_over)
            tested += 1
            finesse_tested += not td[(r, c, y)]
            if advance is None:
                advance = s_pose
        st = advance if advance is not None else st
        if bool(st.round_over):
            st, tables = jax_reset_like_oracle(CFG, s1 + tick, s2 + tick, st)

    # Random early-game play rarely creates overhangs, so force finesse
    # coverage with the hand-built ledge board (same construction as
    # test_finesse_overhang_board): every tuck under the ledge must have a
    # replayable macro that locks identically to the pose path.
    H, W = CFG.height, CFG.width
    board = np.zeros((H, W), np.uint8)
    board[H - 3, 0:6] = 1
    board[H - 2, 4:6] = 1
    occ_rows = jnp.asarray(
        [np.uint32(sum(int(board[y, x]) << x for x in range(W)))
         for y in range(H)], jnp.uint32)
    from drl_tetris_tpu.engine import kernels as K
    for piece_id in (0, 1, 5):          # pieces with ledge tucks here
        st, tables = jax_reset_like_oracle(CFG, s1, s2)
        ps = st.players
        piece, rot = jnp.int32(piece_id), jnp.int32(0)
        st = st.replace(players=ps.replace(
            occ=ps.occ.at[0].set(occ_rows),
            piece=ps.piece.at[0].set(piece),
            rot=ps.rot.at[0].set(rot),
            cur_rows=ps.cur_rows.at[0].set(K.lookup_rows(piece, rot))))
        ps = st.players
        start = (ps.rot[0], ps.px[0], ps.py[0])
        fin = np.asarray(M.finesse_rests(CFG, occ_rows, piece, rot))
        assert fin.any(), piece_id
        for (r, c, y) in [tuple(z) for z in np.argwhere(fin)]:
            keys, ok = M.placement_keys(
                CFG, occ_rows, piece, rot, start,
                jnp.int32(r), jnp.int32(c), jnp.int32(y))
            total_cnt += 1
            if not bool(ok):
                continue
            reachable_cnt += 1
            kmat = np.zeros((2, int(keys.shape[0])), np.int32)
            kmat[0] = np.asarray(keys)
            use = jnp.asarray(np.array([True, False]))
            s_keys = S.step_keys(CFG, st, jnp.asarray(kmat),
                                 jnp.int32(400), tables)
            s_pose = S.step_pose(CFG, st, use,
                                 jnp.full((2,), int(r), jnp.int32),
                                 jnp.full((2,), int(c), jnp.int32),
                                 jnp.full((2,), int(y), jnp.int32),
                                 jnp.int32(400), tables)
            for f in fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(s_keys.players, f)),
                    np.asarray(getattr(s_pose.players, f)),
                    err_msg=f"ledge p{piece_id} rest {(r, c, y)} field {f}")
            tested += 1
            finesse_tested += 1

    assert tested >= 20 and finesse_tested >= 3, (tested, finesse_tested)
    # the BFS must cover (essentially) the whole emission set; a miss here
    # means a legal rest exists that step_keys cannot replay
    assert reachable_cnt / total_cnt >= 0.95, (reachable_cnt, total_cnt)
