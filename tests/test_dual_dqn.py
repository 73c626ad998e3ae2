"""Dual-policy DQN with the win-rate training gate (VERDICT r1 item 6;
sventon_agent_dqn_trainer.py:16-18, worker.py:157-192 merge semantics)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_tetris_tpu.algos.dqn import DQNConfig
from drl_tetris_tpu.algos.replay import ReplayConfig
from drl_tetris_tpu.algos.value_estimator import EstimatorConfig
from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.env.env import EnvConfig
from drl_tetris_tpu.models.nets import ModelConfig
from drl_tetris_tpu.runtime.standalone import (
    DualPolicyDQNConfig, DualPolicyDQNTrainer)


def _tiny_cfg(**kw):
    return DualPolicyDQNConfig(
        env=EnvConfig(engine=EngineConfig(height=10, width=6)),
        model=ModelConfig(tower_layers=1, tower_filters=8,
                          val_layers=1, val_filters=8),
        dqn=DQNConfig(n_samples_each_update=32, minibatch_size=8,
                      n_train_epochs=1,
                      estimator=EstimatorConfig(k_step=2)),
        replay=ReplayConfig(capacity=512, k_step=2, height=10),
        n_envs=8, horizon=8, **kw)


@pytest.fixture(scope="module")
def tr():
    # ONE trainer for the module: each instance re-pays ~20 s of program
    # tracing on the 2-CPU box (VERDICT r4 item 4)
    return DualPolicyDQNTrainer(_tiny_cfg())


def test_dual_dqn_trains_both_policies(tr):
    p0_before = jax.device_get(jax.tree.leaves(tr.states[0].params)[0])
    p1_before = jax.device_get(jax.tree.leaves(tr.states[1].params)[0])
    for _ in range(3):
        stats = tr.train_iteration()
    assert any(k.startswith("policy_0/") for k in stats), stats.keys()
    assert any(k.startswith("policy_1/") for k in stats), stats.keys()
    assert np.isfinite(stats["policy_0/tot_loss"])
    assert np.isfinite(stats["policy_1/tot_loss"])
    p0_after = jax.device_get(jax.tree.leaves(tr.states[0].params)[0])
    p1_after = jax.device_get(jax.tree.leaves(tr.states[1].params)[0])
    assert not np.array_equal(p0_before, p0_after)
    assert not np.array_equal(p1_before, p1_after)
    # the dual estimator must use UNSIGNED gamma
    assert tr.states is not None
    assert stats["winrate/policy_0"] >= 0.0


def test_winrate_gate_skips_leading_policy(tr):
    tr.train_iteration()  # replays already past the threshold
    # force the tracker into "policy 0 is far ahead"
    tr.winrate.rate_0 = 0.95
    assert not tr.winrate.should_train(0)
    assert tr.winrate.should_train(1)
    rate = tr.winrate.rate_0
    p0_before = jax.device_get(jax.tree.leaves(tr.states[0].params)[0])
    p1_before = jax.device_get(jax.tree.leaves(tr.states[1].params)[0])
    tr.winrate.rate_0 = rate  # keep after update() inside iteration
    stats = tr.train_iteration()
    p0_after = jax.device_get(jax.tree.leaves(tr.states[0].params)[0])
    p1_after = jax.device_get(jax.tree.leaves(tr.states[1].params)[0])
    # winners observed during the iteration move the EMA a little, but from
    # 0.95 it cannot cross back under the 0.6 gate in one segment
    assert not any(k.startswith("policy_0/") for k in stats)
    np.testing.assert_array_equal(p0_before, p0_after)
    assert not np.array_equal(p1_before, p1_after)
