"""Observation parity: the obs builder vs the reference state_dict formula
applied to oracle-dumped backend state (state_processors.py:23-54 +
unpacker perspective layout)."""
import numpy as np
import jax
import jax.numpy as jnp

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.engine import step as S
from drl_tetris_tpu.env.observations import observe
from tests.oracle import Oracle
from tests.test_parity import jax_reset_like_oracle

CFG = EngineConfig()


def reference_vector(dump):
    """state_dict scalars in collect_separate_data order
    (state_unpack.py:88-105): x, y, incoming, combo_time, combo_count,
    nextpiece one-hot — with the uint8 casts of the reference."""
    s = dump.scalars
    x = np.uint8(s["px"])          # int8 posX viewed as uint8
    y = np.uint8(s["py"])
    inc = s["incoming_count"]
    ct = min(25000, s["combo_remaining"] + 50) // 100
    cc = s["combo_count"]
    nxt = np.zeros(7, np.float32)
    nxt[s["nextpiece"]] = 1.0
    return np.concatenate([[x, y, inc, ct, cc], nxt]).astype(np.float32)


def test_observation_matches_reference_formula():
    s1, s2 = 31, 47
    oracle = Oracle(CFG.height, CFG.width, 2, s1, s2)
    st, tables = jax_reset_like_oracle(CFG, s1, s2)
    rng = np.random.RandomState(5)
    for tick in range(40):
        batched = jax.tree.map(lambda a: a[None], st)  # batch of 1 game
        for player in range(2):
            obs = observe(CFG, batched, jnp.asarray([player]))
            d_me = oracle.dump(player)
            d_opp = oracle.dump(1 - player)
            # index 3 (combo_time) is UNDEFINED in the reference before the
            # first tick of a round: ComboCounter::remaining is an
            # uninitialized member until check() runs (Combo.h) — skip it
            # right after a reset.
            sel = np.ones(12, bool)
            if tick == 0:
                sel[3] = False
            np.testing.assert_array_equal(
                np.asarray(obs.vec)[0, 0][sel], reference_vector(d_me)[sel],
                err_msg=f"tick {tick} p{player} self vec")
            np.testing.assert_array_equal(
                np.asarray(obs.vec)[0, 1][sel], reference_vector(d_opp)[sel],
                err_msg=f"tick {tick} p{player} opp vec")
            # visual = binarized own field, then opponent's
            np.testing.assert_array_equal(
                np.asarray(obs.vis)[0, 0, :, :, 0],
                (d_me.field > 0).astype(np.float32))
            np.testing.assert_array_equal(
                np.asarray(obs.vis)[0, 1, :, :, 0],
                (d_opp.field > 0).astype(np.float32))
            # separate piece index (the acting piece)
            assert int(obs.piece[0, 0]) == d_me.scalars["piece"]
            assert int(obs.piece[0, 1]) == d_opp.scalars["piece"]
        p = tick % 2
        r, t = rng.randint(0, 4), rng.randint(0, CFG.width)
        ks = [8] * r + [2] + [3] * t + [7]
        kmat = np.zeros((2, 16), np.int32)
        kmat[p, : len(ks)] = ks
        oracle.step([list(kmat[i]) for i in range(2)], 400)
        st = S.step_keys(CFG, st, jnp.asarray(kmat), jnp.int32(400), tables)
        if bool(st.round_over):
            oracle.reset(s1 + tick, s2 + tick)
            st, tables = jax_reset_like_oracle(CFG, s1 + tick, s2 + tick, st)


def test_mirrored_observation():
    st = S.init(CFG, jax.random.PRNGKey(9))
    b = jax.tree.map(lambda a: a[None], st)
    o = observe(CFG, b, jnp.asarray([0]))
    om = observe(CFG, b, jnp.asarray([0]), mirrored=True)
    # field flipped horizontally
    np.testing.assert_array_equal(
        np.asarray(om.vis)[0, 0, :, :, 0],
        np.asarray(o.vis)[0, 0, :, ::-1, 0])
    # piece ids swapped through the reflection permutation
    swap = [1, 0, 3, 2, 4, 5, 6]
    assert int(om.piece[0, 0]) == swap[int(o.piece[0, 0])]
