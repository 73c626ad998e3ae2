"""Scheduled hyperparameters flow into sampling (VERDICT r1 item 5).

The reference schedules exploration epsilon / action_temperature over
training time (presets.py:49,81; sventon_agent.py:81-91) and DQN
prioritization alpha/beta (sventon_agent_dqn_trainer.py:34-39).  Here the
host evaluates config/parameter.py schedules per iteration and passes the
values into the jitted rollout/update as dynamic scalars — these tests pin
that changing t (i.e. the passed value) changes behavior without recompile.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_tetris_tpu.config.parameter import (
    ExpParameter, LinearParameter, Parameter, param_eval)


def test_linear_parameter_time_horizon_form():
    # the reference's interpolating form (tools/parameter.py:55-63,
    # sventon_dqn.py:16: linear_parameter(1, final_val=3.0, time_horizon=T))
    p = LinearParameter(1.0, final_val=3.0, time_horizon=100.0)
    assert p(0) == 1.0
    assert p(50) == pytest.approx(2.0)
    assert p(100) == 3.0
    assert p(10**9) == 3.0  # clamped to horizon
    assert p(-5) == 1.0


def _tiny_setup():
    from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv
    from drl_tetris_tpu.engine.core import EngineConfig
    from drl_tetris_tpu.models.nets import ModelConfig, QNet
    env = TetrisVectorEnv(
        EnvConfig(engine=EngineConfig(height=10, width=6)), 8)
    net = QNet(ModelConfig(tower_layers=1, tower_filters=8,
                           val_layers=1, val_filters=8), full_network=True)
    params = net.init(jax.random.PRNGKey(0),
                      [jnp.zeros((1, 12))] * 2,
                      [jnp.zeros((1, 10, 6, 1))] * 2)
    return env, net, params


def test_epsilon_is_dynamic_in_rollout():
    """Same rollout fn, same key: epsilon=0 must act greedily, epsilon=1
    must act randomly — no recompile between calls."""
    from drl_tetris_tpu.algos.rollout import HParams, make_rollout_fn
    env, net, params = _tiny_setup()
    rollout = make_rollout_fn(env, net, horizon=6, distribution="epsilon")
    st = env.reset(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    hp0 = HParams(epsilon=jnp.float32(0.0), temperature=jnp.float32(1.0),
                  avg_traj_len=jnp.float32(12.0))
    hp1 = hp0._replace(epsilon=jnp.float32(1.0))
    _, seg0, _ = rollout(params, st, key, hp0)
    _, seg0b, _ = rollout(params, st, key, hp0)
    _, seg1, _ = rollout(params, st, key, hp1)
    np.testing.assert_array_equal(np.asarray(seg0.rot),
                                  np.asarray(seg0b.rot))  # deterministic
    assert not (np.array_equal(np.asarray(seg0.rot), np.asarray(seg1.rot))
                and np.array_equal(np.asarray(seg0.trans),
                                   np.asarray(seg1.trans)))


def test_adaptive_epsilon_scales_by_trajectory_length():
    """adaptive_epsilon = epsilon(t) / avg_traj_len (sventon_agent.py:87-89;
    EMA semantics from sherlock_agent.py:39,173).  avg_traj_len=1 with
    epsilon=1 is fully random; a huge avg_traj_len collapses to greedy."""
    from drl_tetris_tpu.algos.rollout import HParams, make_rollout_fn
    env, net, params = _tiny_setup()
    rollout = make_rollout_fn(env, net, horizon=6,
                              distribution="adaptive_epsilon")
    st = env.reset(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    hp_greedy = HParams(epsilon=jnp.float32(1.0),
                        temperature=jnp.float32(1.0),
                        avg_traj_len=jnp.float32(1e9))
    hp_random = hp_greedy._replace(avg_traj_len=jnp.float32(1.0))
    _, seg_g, _ = rollout(params, st, key, hp_greedy)
    _, seg_r, _ = rollout(params, st, key, hp_random)
    # greedy limit must equal the epsilon=0 rollout of the plain dist
    rollout_eps = make_rollout_fn(env, net, horizon=6,
                                  distribution="epsilon")
    _, seg_0, _ = rollout_eps(params, st, key,
                              hp_greedy._replace(epsilon=jnp.float32(0.0)))
    np.testing.assert_array_equal(np.asarray(seg_g.rot),
                                  np.asarray(seg_0.rot))
    assert not np.array_equal(np.asarray(seg_g.rot), np.asarray(seg_r.rot))


def test_traj_len_ema_matches_reference_recurrence():
    from drl_tetris_tpu.runtime.standalone import _traj_len_ema
    done = np.zeros((6, 2), bool)
    done[2, 0] = True   # env0 round ends after 3 ticks
    done[5, 1] = True   # env1 round ends after 6 ticks
    ep_len = np.zeros(2, np.int64)
    atl = 12.0
    ep_len, atl = _traj_len_ema(done, ep_len, atl, tau=0.01)
    expected = (1 - 0.01) * 12.0 + 0.01 * 3.0
    expected = (1 - 0.01) * expected + 0.01 * 6.0
    assert atl == pytest.approx(expected)
    np.testing.assert_array_equal(ep_len, [3, 0])  # env0 is 3 ticks into next


def test_dqn_alpha_beta_are_dynamic():
    """replay_sample takes alpha/beta as traced scalars: different values
    change the IS weights under one jitted callable."""
    from drl_tetris_tpu.algos.replay import (
        ReplayConfig, replay_init, replay_sample)
    cfg = ReplayConfig(capacity=256, k_step=1, height=10)
    rp = replay_init(cfg)
    # fill with synthetic priorities
    prios = jnp.linspace(0.1, 2.0, 256)
    rp = rp.replace(prio=prios, size=jnp.int32(256), cursor=jnp.int32(0))
    f = jax.jit(lambda key, a, b: replay_sample(cfg, rp, key, 64, a, b))
    key = jax.random.PRNGKey(0)
    idx_lo, iw_lo = f(key, jnp.float32(0.01), jnp.float32(0.1))
    idx_hi, iw_hi = f(key, jnp.float32(2.0), jnp.float32(1.0))
    assert not np.array_equal(np.asarray(idx_lo), np.asarray(idx_hi))
    assert not np.allclose(np.asarray(iw_lo), np.asarray(iw_hi))


def test_settings_thread_schedules_into_config():
    from drl_tetris_tpu.config.presets import load
    sched = {"__kind__": "LinearParameter", "init_val": 1.0,
             "final_val": 3.0, "time_horizon": 100.0}
    cfg = load(["default", "sventon", "sventon_dqn", "resblock"],
               {"action_temperature": LinearParameter(
                   1.0, final_val=3.0, time_horizon=100.0),
                "prioritized_replay_alpha": ExpParameter(0.7, decay=-1e-3)})
    # schedules survive typed resolution as evaluable objects
    assert param_eval(cfg.action_temperature, 0) == 1.0
    assert param_eval(cfg.action_temperature, 100) == 3.0
    assert param_eval(cfg.dqn.alpha, 0) == pytest.approx(0.7)
    assert param_eval(cfg.dqn.alpha, 1000) != pytest.approx(0.7)
