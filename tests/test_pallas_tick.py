"""Pallas whole-rollout kernel: equivalence with the XLA tick path.

Two invariants:

1. engine/rng.py reproduces jax.random bit-for-bit (fold_in / split /
   uniform under partitionable threefry) — this is what lets the Pallas
   kernel share the exact RNG streams of the XLA path.
2. rollout_pallas over T ticks == T iterations of env.step, every state
   leaf bit-identical (same explicit action arrays driving both paths).

Runs in Pallas interpreter mode on the CPU test mesh (conftest.py); the
compiled-Mosaic path is exercised on real TPU by bench.py --pallas.
"""
import jax
import jax.numpy as jnp
import numpy as np

from drl_tetris_tpu.engine import rng
from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv

import pytest

pytestmark = pytest.mark.slow  # heavy compiles; deselect with -m 'not slow'


def test_rng_matches_jax_random():
    key = jax.random.PRNGKey(987)
    kd = jax.random.key_data(key)

    # fold_in
    for c in (0, 1, 7, 123456):
        ref = jax.random.key_data(jax.random.fold_in(key, jnp.uint32(c)))
        man = rng.fold_in(kd, jnp.uint32(c))
        assert (np.asarray(ref) == np.asarray(man)).all(), c

    # split
    ref = jax.random.key_data(jax.random.split(key))
    man = rng.split2(kd)
    assert (np.asarray(ref) == np.asarray(man)).all()

    # uniform scalar + shaped
    ref = jax.random.uniform(key, dtype=jnp.float32)
    man = rng.uniform01(kd)
    assert float(ref) == float(man)
    ref = jax.random.uniform(key, (32,), dtype=jnp.float32)
    man = rng.uniform01(kd, (32,))
    assert (np.asarray(ref) == np.asarray(man)).all()

    # the engine _uniform composition: uniform(fold_in(key, counter))
    for c in (0, 3, 99):
        ref = jax.random.uniform(jax.random.fold_in(key, jnp.uint32(c)),
                                 dtype=jnp.float32)
        man = rng.uniform01(rng.fold_in(kd, jnp.uint32(c)))
        assert float(ref) == float(man), c


def test_pallas_rollout_matches_xla():
    from drl_tetris_tpu.engine.pallas_tick import rollout_pallas

    N, T = 4, 6
    cfg = EnvConfig()
    env = TetrisVectorEnv(cfg, N)
    st0 = env.reset(jax.random.PRNGKey(0))

    k = jax.random.PRNGKey(42)
    kr, kt = jax.random.split(k)
    ar = jax.random.randint(kr, (T, N), 0, 4, dtype=jnp.int32)
    at = jax.random.randint(kt, (T, N), 0, cfg.engine.width, dtype=jnp.int32)

    # XLA reference: T sequential env.steps
    st_ref = st0
    for t in range(T):
        st_ref, _, _ = env.step(st_ref, ar[t], at[t])

    st_pl = rollout_pallas(cfg, st0, T, actions=(ar, at), block_games=N,
                           interpret=True)

    ref_leaves, treedef = jax.tree_util.tree_flatten(st_ref)
    pl_leaves, treedef2 = jax.tree_util.tree_flatten(st_pl)
    assert treedef == treedef2
    keys = jax.tree_util.tree_flatten_with_path(st_ref)[0]
    for (path, refl), pll in zip(keys, pl_leaves):
        assert refl.dtype == pll.dtype, path
        assert (np.asarray(refl) == np.asarray(pll)).all(), (
            jax.tree_util.keystr(path), np.asarray(refl), np.asarray(pll))
    # sanity: something actually happened over 6 ticks
    assert int(jnp.sum(st_pl.engine.players.time_ms)) > 0


def test_pallas_rollout_multiblock_random_actions():
    """Grid >1 block + in-kernel random action generation path (the bench
    configuration) at least runs and advances time in interpret mode."""
    from drl_tetris_tpu.engine.pallas_tick import rollout_pallas

    N, T = 8, 3
    cfg = EnvConfig()
    env = TetrisVectorEnv(cfg, N)
    st0 = env.reset(jax.random.PRNGKey(1))
    st = rollout_pallas(cfg, st0, T,
                        base_key=jax.random.key_data(jax.random.PRNGKey(2)),
                        block_games=4, interpret=True)
    assert int(jnp.sum(st.engine.players.time_ms)) == N * 2 * T * 400
    assert int(jnp.sum(st.current_player)) >= 0
