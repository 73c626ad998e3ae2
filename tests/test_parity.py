"""Bit-exact parity: JAX engine vs the compiled reference C++ engine.

The reference seeds from wall clock (PythonHandle.cpp:68-71) so parity runs
inject the exact mt19937 uniform streams (validated bit-exact in
test_rng_replica) into both engines: the oracle consumes them through its
own mt19937, the JAX engine through RngTables.

Every observable quantity is compared after every tick: binarized field,
garbage cells, piece pose, timers, combo/garbage bookkeeping, stats, rewards,
deaths, round transitions, and the bag weights.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # bit-exact oracle lockstep; deselect with -m 'not slow'

from drl_tetris_tpu.engine.core import EngineConfig, zeros_player_state, EngineState
from drl_tetris_tpu.engine import step as S
from tests.oracle import Oracle
from tests.oracle_rng import uniform_stream

T_STREAM = 8192


def make_tables(seed1, seed2):
    # GamePlay::seed: seedHole(seed1), seedPiece(seed2)
    return S.RngTables(
        piece=jnp.asarray(uniform_stream(seed2, T_STREAM)),
        hole=jnp.asarray(uniform_stream(seed1, T_STREAM)),
    )


def jax_reset_like_oracle(cfg, seed1, seed2, state=None):
    tables = make_tables(seed1, seed2)
    if state is None:
        state = EngineState(players=zeros_player_state(cfg),
                            round_over=jnp.bool_(False),
                            last_winner=jnp.int32(-1))
    return S.reset(cfg, state, jax.random.PRNGKey(0), tables), tables


def compare(cfg, st, oracle, tick, check_combo_remaining=True):
    ps = st.players
    for p in range(cfg.n_players):
        d = oracle.dump(p)
        occ = np.asarray(ps.occ[p])
        garb = np.asarray(ps.garb[p])
        my_field = np.array(
            [[(int(occ[y]) >> x) & 1 for x in range(cfg.width)]
             for y in range(cfg.height)], np.uint8)
        my_garb = np.array(
            [[(int(garb[y]) >> x) & 1 for x in range(cfg.width)]
             for y in range(cfg.height)], np.uint8)
        ctx = f"tick {tick} player {p}"
        np.testing.assert_array_equal(my_field, (d.field > 0).astype(np.uint8),
                                      err_msg=f"{ctx}: field")
        np.testing.assert_array_equal(my_garb, (d.field == 8).astype(np.uint8),
                                      err_msg=f"{ctx}: garbage cells")
        s = d.scalars
        mine = {
            "piece": int(ps.piece[p]), "rot": int(ps.rot[p]),
            "px": int(ps.px[p]), "py": int(ps.py[p]),
            "nextpiece": int(ps.nextpiece[p]),
            "time_ms": int(ps.time_ms[p]),
            "dead": int(ps.dead[p]),
            "reward": int(ps.reward[p]) & 0xFF,  # uint8 in the reference
            "lines_cleared": int(ps.lines_cleared[p]),
            "lines_sent": int(ps.lines_sent[p]),
            "garbage_cleared": int(ps.garbage_cleared[p]),
            "lines_blocked": int(ps.lines_blocked[p]),
            "max_combo": int(ps.max_combo[p]),
            "incoming_count": int(ps.incoming_count[p]),
            "combo_count": int(ps.combo_count[p]),
            "g_entries": int(ps.g_size[p]),
            "g_min_remaining": int(ps.g_min_remaining[p]),
            "drop_delay": int(ps.drop_delay[p]),
            "drop_delay_time": int(ps.drop_delay_time[p]),
            "lockdown": int(ps.lockdown[p]),
            "lockdown_time": int(ps.lockdown_time[p]),
            "lines_cleared_snap": int(ps.lines_cleared_snap[p]),
        }
        if check_combo_remaining:
            mine["combo_remaining"] = int(ps.combo_remaining[p])
        for k, v in mine.items():
            assert v == s[k], f"{ctx}: {k}: jax={v} oracle={s[k]}"
        assert abs(float(ps.incoming_lines[p]) - d.incoming_lines) == 0, \
            f"{ctx}: incoming_lines"
        # cogp: the reference computes adjust/6 in double then truncates to
        # float (randomizer.cpp:25); we compute in float32 — <=2 ulp drift.
        # All integer game state remains bit-exact.
        np.testing.assert_allclose(np.asarray(ps.cogp[p]), d.cogp,
                                   rtol=5e-7, err_msg=f"{ctx}: cogp")
    assert bool(st.round_over) == oracle.round_over, f"tick {tick}: round_over"


def test_rng_replica():
    o = Oracle()
    for seed in [0, 1, 123, 31337, -5]:
        np.testing.assert_array_equal(o.uniform_stream(seed, 64),
                                      uniform_stream(seed, 64))


def _run_parity(key_gen, n_steps, n_keys, cfg=None, seeds=(11, 22)):
    cfg = cfg or EngineConfig()
    s1, s2 = seeds
    oracle = Oracle(cfg.height, cfg.width, cfg.n_players, s1, s2,
                    piece_map=cfg.piece_map)
    st, tables = jax_reset_like_oracle(cfg, s1, s2)
    compare(cfg, st, oracle, -1, check_combo_remaining=False)
    rng = np.random.RandomState(7)
    resets = 0
    for tick in range(n_steps):
        keys = key_gen(rng, tick)
        kmat = np.zeros((cfg.n_players, n_keys), np.int32)
        for i, ks in enumerate(keys):
            kmat[i, :len(ks)] = ks
        oracle.step([list(kmat[i]) for i in range(cfg.n_players)], 400)
        st = S.step_keys(cfg, st, jnp.asarray(kmat), jnp.int32(400), tables)
        compare(cfg, st, oracle, tick)
        if bool(st.round_over):
            resets += 1
            ns1, ns2 = s1 + 100 + tick, s2 + 200 + tick
            oracle.reset(ns1, ns2)
            st, tables = jax_reset_like_oracle(cfg, ns1, ns2, st)
            compare(cfg, st, oracle, f"{tick}-postreset")
            assert st.last_winner == oracle.last_winner
    return resets


def test_parity_macro_actions():
    """Alternating-player (r, t) macros — the action space SVENton uses."""
    def gen(rng, tick):
        player = tick % 2
        r, t = rng.randint(0, 4), rng.randint(0, 10)
        ks = [8] * r + [2] + [3] * t + [7]
        return [ks if i == player else [0] for i in range(2)]
    resets = _run_parity(gen, 260, 16)
    assert resets >= 1, "parity run should cover at least one round reset"


def test_parity_key_fuzz():
    """Random raw key streams: movement, soft drops, rotations, idling."""
    def gen(rng, tick):
        out = []
        for i in range(2):
            n = rng.randint(0, 6)
            out.append(list(rng.randint(0, 11, size=n)))
        return out
    _run_parity(gen, 300, 6, seeds=(5, 9))


def test_parity_small_board_single_pieceset():
    """BASELINE.json config 1: limited piece set on a small board."""
    cfg = EngineConfig(height=10, width=6, piece_map=(2, 3, 2, 3, 2, 3, 2))
    def gen(rng, tick):
        player = tick % 2
        r, t = rng.randint(0, 4), rng.randint(0, 6)
        ks = [8] * r + [2] + [3] * t + [7]
        return [ks if i == player else [0] for i in range(2)]
    _run_parity(gen, 200, 16, cfg=cfg, seeds=(3, 4))


def test_vectorized_parity():
    """BASELINE config 2: a vmapped batch of boards evolves bit-exactly like
    the reference engine run per board.  Each board gets its own seeds and
    action stream; the batch steps in lockstep under one vmapped jit."""
    cfg = EngineConfig()
    N, T = 24, 50
    rng = np.random.RandomState(11)
    seeds = [(100 + i, 200 + i) for i in range(N)]
    actions = [(rng.randint(0, 4, T), rng.randint(0, cfg.width, T))
               for _ in range(N)]

    # JAX side: one vmapped batch with per-game injected streams
    tables = [make_tables(s1, s2) for s1, s2 in seeds]
    tables_b = jax.tree.map(lambda *xs: jnp.stack(xs), *tables)
    states = [jax_reset_like_oracle(cfg, s1, s2)[0] for s1, s2 in seeds]
    st = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    step_v = jax.jit(jax.vmap(
        lambda s, k, t: S.step_keys(cfg, s, k, jnp.int32(400), t)))
    snapshots = []
    for tick in range(T):
        kmat = np.zeros((N, 2, 16), np.int32)
        for i in range(N):
            player = tick % 2
            r, t = actions[i][0][tick], actions[i][1][tick]
            ks = [8] * r + [2] + [3] * t + [7]
            kmat[i, player, : len(ks)] = ks
        st = step_v(st, jnp.asarray(kmat), tables_b)
        snapshots.append(jax.device_get(st))

    # Oracle side: replay each board sequentially, compare every tick
    for i in range(N):
        s1, s2 = seeds[i]
        oracle = Oracle(cfg.height, cfg.width, 2, s1, s2)
        for tick in range(T):
            player = tick % 2
            r, t = actions[i][0][tick], actions[i][1][tick]
            ks = [8] * r + [2] + [3] * t + [7]
            kmat = np.zeros((2, 16), np.int32)
            kmat[player, : len(ks)] = ks
            oracle.step([list(kmat[p]) for p in range(2)], 400)
            snap = jax.tree.map(lambda a: a[i], snapshots[tick])
            if bool(snap.round_over):
                # batch has no auto-reset here; once over, states freeze on
                # both sides — verify and stop comparing this board
                assert oracle.round_over
                break
            compare(cfg, snap, oracle, f"board{i}-t{tick}")
