"""League-pool opponent training + scheduled learning rate
(VERDICT r2 item 3 machinery; PFSP added r5).

Cost note (VERDICT r4 item 4): every StandaloneTrainer instance re-pays
tracing + lowering of the fused iteration programs (~10-25 s each on this
2-CPU box even with a warm persistent compile cache), so the whole module
shares ONE trainer via a module-scoped fixture and tests flip only the
host-side config fields they need (pool_mode, lr_schedule are read
per-iteration from tr.cfg, never baked into the jitted programs).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_tetris_tpu.algos.ppo import PPOConfig, set_learning_rate
from drl_tetris_tpu.config.parameter import LinearParameter
from drl_tetris_tpu.models.nets import ModelConfig
from drl_tetris_tpu.runtime.standalone import StandaloneConfig, StandaloneTrainer


def _tiny():
    return ModelConfig(compute_dtype="float32", tower_layers=1,
                       tower_filters=4, val_layers=1, val_filters=4)


@pytest.fixture(scope="module")
def tr():
    cfg = StandaloneConfig(
        model=_tiny(),
        ppo=PPOConfig(minibatch_size=8, n_train_epochs=1, lr=1e-3),
        n_envs=4, horizon=8, seed=1,
        pool_prob=1.0, pool_size=3, pool_every=1)
    trainer = StandaloneTrainer(cfg)
    base = trainer.cfg
    yield trainer
    trainer.cfg = base


def test_pool_opponent_training_runs_and_trains(tr):
    # iteration 1: pool empty -> plain self-play; snapshot taken after
    tr.train_iteration()
    assert len(tr._pool) == 1
    p1 = jax.tree.map(np.asarray, tr.state.params)
    # iteration 2: plays against the snapshot (pool_prob=1)
    stats = tr.train_iteration()
    assert np.isfinite(stats["losses/total_loss"])
    p2 = jax.tree.map(np.asarray, tr.state.params)
    moved = any(not np.array_equal(a, b) for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(p2)))
    assert moved
    assert len(tr._pool) == 2
    # a few more iterations alternate learner seat without error
    for _ in range(2):
        tr.train_iteration()


def test_lr_schedule_threads_into_optimizer(tr):
    sched = LinearParameter(1e-3, final_val=1e-5, time_horizon=1000)
    saved_steps = tr.total_steps
    tr.cfg = dataclasses.replace(tr.cfg, lr_schedule=sched)
    try:
        tr.total_steps = 0
        tr.train_iteration()
        lr0 = float(tr.state.opt_state.hyperparams["learning_rate"])
        # t=0 evaluation happened before the first update
        assert np.isclose(lr0, 1e-3, rtol=1e-5)
        # fast-forward the step counter; next iteration re-evaluates
        tr.total_steps = 1000
        tr.train_iteration()
        lr1 = float(tr.state.opt_state.hyperparams["learning_rate"])
        assert np.isclose(lr1, 1e-5, rtol=1e-4), lr1
    finally:
        tr.cfg = dataclasses.replace(tr.cfg, lr_schedule=None)
        tr.state = set_learning_rate(tr.state, tr.cfg.ppo.lr)
        tr.total_steps = saved_steps


def test_pfsp_selection_prefers_even_matches(tr):
    """pool_mode='pfsp': opponents are drawn with variance weighting
    w*(1-w), so the ~50% opponent dominates over crushed/hopeless ones."""
    while len(tr._pool) < 3:
        tr.train_iteration()
    tr.cfg = dataclasses.replace(tr.cfg, pool_mode="pfsp")
    saved = list(tr._pool_wr)
    tr._pool_wr[0], tr._pool_wr[1], tr._pool_wr[2] = 0.98, 0.5, 0.02
    picks = np.bincount([tr._pick_opponent() for _ in range(400)],
                        minlength=3)
    for i, w in enumerate(saved):
        tr._pool_wr[i] = w
    # weights ~ (0.0196, 0.25, 0.0196) -> the even match gets ~86%
    assert picks[1] > 250, picks
    assert picks[0] > 0 and picks[2] > 0, picks  # floor keeps all in play


def test_pfsp_winrate_ema_updates_from_pool_segments(tr):
    tr.cfg = dataclasses.replace(tr.cfg, pool_mode="pfsp", pool_wr_lr=0.5)
    stats = None
    for _ in range(4):
        stats = tr.train_iteration()
    assert "pool/opponent_winrate_ema" in stats
    assert all(0.0 <= w <= 1.0 for w in tr._pool_wr)
    assert len(tr._pool_wr) == len(tr._pool)


def test_seed_pool_keeps_pfsp_alignment(tr):
    n0 = len(tr._pool)
    if n0 == tr.cfg.pool_size:        # deque full: eviction keeps lockstep
        tr.seed_pool(tr.state.params)
        assert len(tr._pool) == len(tr._pool_wr) == tr.cfg.pool_size
    else:
        tr.seed_pool(tr.state.params)
        assert len(tr._pool) == len(tr._pool_wr) == n0 + 1
    assert tr._pool_wr[-1] == 0.5


def test_pool_rollout_learner_values_and_parity():
    """In a pool rollout the recorded values are the learner's at every
    tick, and slicing by parity yields the learner's decisions."""
    from drl_tetris_tpu.algos.rollout import (
        make_pool_rollout_fn, make_rollout_fn)
    from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv
    from drl_tetris_tpu.models.nets import PPONet

    env = TetrisVectorEnv(EnvConfig(), 3)
    net = PPONet(_tiny(), full_network=True)
    k = jax.random.PRNGKey(0)
    params = net.init(k, [jnp.zeros((1, 12))] * 2,
                      [jnp.zeros((1, 22, 10, 1))] * 2)
    st = env.reset(jax.random.PRNGKey(1))
    roll = make_pool_rollout_fn(env, net, 6)
    # opponent == learner params: must equal the plain self-play rollout
    plain = make_rollout_fn(env, net, 6)
    st_a, seg_a, v_a = roll(params, params, st, k, learner_first=True)
    st_b, seg_b, v_b = plain(params, st, k)
    for la, lb in zip(jax.tree.leaves(seg_a), jax.tree.leaves(seg_b)):
        assert np.array_equal(np.asarray(la), np.asarray(lb))
    assert np.allclose(np.asarray(v_a), np.asarray(v_b))


def test_traj_len_ema_device_matches_host():
    import numpy as np
    from drl_tetris_tpu.runtime.standalone import (
        _traj_len_ema, _traj_len_ema_host)
    r = np.random.RandomState(0)
    done = r.rand(13, 7) < 0.3
    ep0 = r.randint(0, 9, 7)
    e_d, a_d = _traj_len_ema(done, ep0, 12.0, 0.01)
    e_h, a_h = _traj_len_ema_host(done, ep0.copy(), 12.0, 0.01)
    assert np.array_equal(np.asarray(e_d), e_h)
    assert np.isclose(float(a_d), a_h, rtol=1e-6)
