"""Actionable finesse (VERDICT r1 item 4): the full get_actions legal set
(top-drop ∪ finesse) and its execution interface.

The reference returns every legal placement — including tuck/slide/kick
rests found by TestField's finesse search — as key macros agents can
execute (tetris_environment.py:77-85, TestField.cpp:113-125).  Here the
set is engine/masks.legal_rests (4, W, H) and execution is a direct
pose-lock (env.step_pose / engine.step.apply_pose): identical locked
board, no key-path animation."""
import numpy as np
import jax
import jax.numpy as jnp

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.engine import kernels as K
from drl_tetris_tpu.engine import masks as M
from drl_tetris_tpu.engine import step as S
from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv
from tests.oracle import Oracle
from tests.test_finesse import jax_rest_sets, oracle_rest_sets
from tests.test_parity import jax_reset_like_oracle

CFG = EngineConfig()


def test_legal_rests_is_topdrop_union_finesse_vs_oracle():
    """Lockstep vs the C++ oracle: legal_rests must equal the oracle's FULL
    emission set (top-drop ∪ finesse) every tick for both players."""
    s1, s2 = 23, 59
    oracle = Oracle(CFG.height, CFG.width, 2, s1, s2)
    st, tables = jax_reset_like_oracle(CFG, s1, s2)
    rng = np.random.RandomState(9)
    checked = with_finesse = 0
    for tick in range(60):
        for p in range(2):
            o_td, o_fin = oracle_rest_sets(oracle, p)
            ps = st.players
            lr = np.asarray(M.legal_rests(
                CFG, ps.occ[p], ps.piece[p], ps.rot[p]))
            j_set = {(r, c - 1, y)
                     for r in range(4) for c in range(CFG.width)
                     for y in range(CFG.height) if lr[r, c, y]}
            o_set = o_td | o_fin
            assert j_set == o_set, (
                f"tick {tick} p{p} jax-only={j_set - o_set} "
                f"oracle-only={o_set - j_set}")
            checked += 1
            with_finesse += bool(o_fin - o_td)
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
    assert checked > 80 and with_finesse >= 2


def test_step_pose_locks_the_requested_rest():
    """Executing any legal rest must produce exactly the pose_boards
    successor (lock at the pose + line clears) on the acting player's
    board."""
    env = TetrisVectorEnv(EnvConfig(), 8)
    st = env.reset(jax.random.PRNGKey(3))
    rng = np.random.RandomState(4)
    compared = 0
    for tick in range(12):
        p = np.asarray(st.current_player)
        ps = st.engine.players
        take = lambda a: np.asarray(a)[np.arange(8), p]
        occ, garb = take(ps.occ), take(ps.garb)
        piece, rot = take(ps.piece), take(ps.rot)
        rest, occ_after, _ = jax.vmap(
            lambda o, g, pc, rt: M.pose_boards(CFG, o, g, pc, rt)
        )(jnp.asarray(occ), jnp.asarray(garb),
          jnp.asarray(piece), jnp.asarray(rot))
        rest = np.asarray(rest)
        rs, cs, ys = np.zeros(8, np.int32), np.zeros(8, np.int32), \
            np.zeros(8, np.int32)
        expect = np.asarray(occ)
        for e in range(8):
            cells = np.argwhere(rest[e])
            if len(cells) == 0:
                continue
            r, c, y = cells[rng.randint(len(cells))]
            rs[e], cs[e], ys[e] = r, c, y
            expect[e] = np.asarray(occ_after)[e, r, c, y]
        st2, _, done = env.step_pose(
            st, jnp.asarray(rs), jnp.asarray(cs), jnp.asarray(ys))
        got = np.asarray(st2.engine.players.occ)[np.arange(8), p]
        for e in range(8):
            if rest[e].any() and not bool(done[e]):
                np.testing.assert_array_equal(got[e], expect[e], err_msg=f"env {e}")
                compared += 1
        st = st2
    assert compared >= 40


def test_step_pose_illegal_pose_is_safe():
    """An illegal pose must not corrupt the bitboard: the piece hard-drops
    from its current pose instead (same as the null-rotation macro)."""
    env = TetrisVectorEnv(EnvConfig(), 4)
    st = env.reset(jax.random.PRNGKey(5))
    # absurd poses: y beyond the floor, col off-board
    bad_r = jnp.asarray([3, 0, 2, 1])
    bad_c = jnp.asarray([0, 9, 3, 5])
    bad_y = jnp.asarray([CFG.height + 5, CFG.height - 1, -7, CFG.height + 1])
    st_bad, _, _ = env.step_pose(st, bad_r, bad_c, bad_y)
    # equivalent: hard-drop in place = macro (r=0, t=center)
    center = (CFG.width - 4) // 2
    st_hd, _, _ = env.step_pose(
        st, jnp.zeros(4, jnp.int32), jnp.full((4,), -9, jnp.int32),
        jnp.full((4,), -9, jnp.int32))
    occ_bad = np.asarray(st_bad.engine.players.occ)
    occ_hd = np.asarray(st_hd.engine.players.occ)
    np.testing.assert_array_equal(occ_bad, occ_hd)
    # boards remain within width bits
    assert (occ_bad < (1 << CFG.width)).all()
