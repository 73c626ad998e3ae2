"""Tests for the control plane (tetrikv), distributed runners, checkpoints."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_tetris_tpu.runtime.kv import KVClient, launch_server
from drl_tetris_tpu.runtime.training_state import TrainingState

PORT = 6431


@pytest.fixture(scope="module")
def kv_server():
    proc = launch_server(PORT)
    yield proc
    proc.kill()
    proc.wait()


def test_kv_primitives(kv_server):
    kv = KVClient(port=PORT)
    assert kv.ping()
    kv.set("a/b", b"hello\nworld\x00binary")
    assert kv.get("a/b") == b"hello\nworld\x00binary"
    assert kv.get("missing") is None
    assert kv.incr("ctr", 5) == 5
    assert kv.incr("ctr", 2) == 7
    kv.push("q", b"one")
    kv.push("q", b"two")
    assert kv.qlen("q") == 2
    assert kv.pop("q") == b"one"
    assert kv.pop("q") == b"two"
    assert kv.pop("q") is None
    assert abs(kv.fincr("f", 0.5) - 0.5) < 1e-9
    assert abs(kv.fincr("f", 0.25) - 0.75) < 1e-9
    kv.set("pre/x", b"1")
    kv.set("pre/y", b"2")
    assert set(kv.keys("pre/")) >= {"pre/x", "pre/y"}
    kv.close()


def test_kv_ttl_and_claim(kv_server):
    kv = KVClient(port=PORT)
    # claim: first caller wins, second does not (redis_types.py:118-131)
    assert kv.claim("slot", 0.3)
    assert not kv.claim("slot", 0.3)
    time.sleep(0.5)  # TTL lapses -> slot claimable again (elastic recovery)
    assert kv.claim("slot", 0.3)
    kv.set("tmp", b"v")
    kv.expire("tmp", 0.2)
    assert kv.get("tmp") == b"v"
    time.sleep(0.4)
    assert kv.get("tmp") is None
    kv.close()


def test_kv_persistence(kv_server, tmp_path):
    kv = KVClient(port=PORT)
    kv.set("persist/me", b"payload")
    path = str(tmp_path / "dump.kv")
    assert kv.save(path)
    assert os.path.exists(path)
    kv.close()


def test_training_state_roundtrip(kv_server):
    ts_t = TrainingState("testrun", role="trainer", port=PORT)
    ts_w = TrainingState("testrun", port=PORT)  # claims worker-0
    assert ts_w.me == "worker-0"
    ts_w2 = TrainingState("testrun", port=PORT)
    assert ts_w2.me == "worker-1"

    weights = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    idx = ts_t.publish_weights(weights)
    assert idx == 1
    got_idx, got = ts_w.fetch_weights()
    assert got_idx == 1
    np.testing.assert_array_equal(got["w"], weights["w"])

    ts_w.push_data({"batch": [1, 2, 3]})
    packets = list(ts_t.pop_data_iter())
    assert packets == [{"batch": [1, 2, 3]}]

    assert ts_w.tick_clock(30) == 30
    ts_t.heartbeat()
    ts_w.heartbeat()
    assert "trainer" in ts_t.alive_roles()
    assert "worker-0" in ts_t.alive_roles()


def test_worker_trainer_end_to_end(kv_server):
    """One worker + one trainer exchanging real segments through the store:
    the docker-compose topology in miniature (SURVEY.md 2.5)."""
    jax.config.update("jax_platforms", "cpu")
    from drl_tetris_tpu.runtime.standalone import StandaloneConfig
    from drl_tetris_tpu.runtime.runner import WorkerRunner, TrainerRunner
    from drl_tetris_tpu.models.nets import ModelConfig
    from drl_tetris_tpu.algos.ppo import PPOConfig

    cfg = StandaloneConfig(
        n_envs=4, horizon=8,
        model=ModelConfig(tower_layers=2, tower_filters=8,
                          val_layers=2, val_filters=8),
        ppo=PPOConfig(minibatch_size=8, n_train_epochs=1))
    ts_w = TrainingState("e2e", port=PORT)
    ts_t = TrainingState("e2e", role="trainer", port=PORT)
    worker = WorkerRunner(cfg, ts_w)
    trainer = TrainerRunner(cfg, ts_t, min_samples=32)

    worker.run(max_steps=64)      # two segments -> 64 samples queued
    assert ts_t.queue_len() >= 1
    updates = trainer.run(max_updates=1)
    assert updates == 1
    # weights were published; a fresh worker picks them up
    assert ts_w.weights_index() >= 1
    idx = worker.update_weights()
    assert idx >= 1


def test_dual_policy_worker_trainer_end_to_end(kv_server):
    """single_policy=False through process mode (worker.py:157-192): the
    worker ships one batch per policy + round winners; the trainer trains
    two states behind the win-rate gate and publishes BOTH param trees."""
    jax.config.update("jax_platforms", "cpu")
    from drl_tetris_tpu.runtime.standalone import StandaloneConfig
    from drl_tetris_tpu.runtime.runner import WorkerRunner, TrainerRunner
    from drl_tetris_tpu.models.nets import ModelConfig
    from drl_tetris_tpu.algos.ppo import PPOConfig

    cfg = StandaloneConfig(
        n_envs=4, horizon=8,
        model=ModelConfig(tower_layers=2, tower_filters=8,
                          val_layers=2, val_filters=8),
        ppo=PPOConfig(minibatch_size=8, n_train_epochs=1))
    ts_w = TrainingState("e2e-dual", port=PORT)
    ts_t = TrainingState("e2e-dual", role="trainer", port=PORT)
    worker = WorkerRunner(cfg, ts_w, flavour="dual")
    assert isinstance(worker.params, tuple) and len(worker.params) == 2
    trainer = TrainerRunner(cfg, ts_t, min_samples=32, flavour="dual")

    worker.run(max_steps=64)      # 2 segments -> 16 samples/policy each
    assert ts_t.queue_len() >= 1
    updates = trainer.run(max_updates=1)
    assert updates == 1
    # both policies' weights are published as a (p0, p1) tuple and a
    # fresh worker adopts them
    idx = worker.update_weights()
    assert idx >= 1
    assert isinstance(worker.params, tuple) and len(worker.params) == 2


def test_worker_epsilon_schedule_threads_per_iteration(kv_server):
    """Process-mode sampling schedules are evaluated per iteration against
    the shared workers clock (r3 VERDICT item 7): a decaying epsilon
    Parameter shows up decayed in the worker's own logs."""
    jax.config.update("jax_platforms", "cpu")
    from types import SimpleNamespace
    from drl_tetris_tpu.runtime.standalone import StandaloneConfig
    from drl_tetris_tpu.runtime.runner import WorkerRunner
    from drl_tetris_tpu.models.nets import ModelConfig
    from drl_tetris_tpu.algos.ppo import PPOConfig
    from drl_tetris_tpu.config.parameter import LinearParameter

    cfg = StandaloneConfig(
        n_envs=4, horizon=8,
        model=ModelConfig(tower_layers=2, tower_filters=8,
                          val_layers=2, val_filters=8),
        ppo=PPOConfig(minibatch_size=8, n_train_epochs=1))
    fw = SimpleNamespace(
        train_distribution="epsilon",
        epsilon=LinearParameter(1.0, final_val=0.0, time_horizon=320),
        action_temperature=1.0, tau_learning_rate=0.01, settings={})
    ts = TrainingState("epssched", port=PORT)
    worker = WorkerRunner(cfg, ts, flavour="dqn", fw=fw)
    lines = []
    worker.run(max_steps=96, logger=lines.append)   # 3 segments
    eps = [float(l.split("epsilon=")[1].split()[0])
           for l in lines if "epsilon=" in l]
    assert len(eps) == 3
    assert eps[0] > eps[1] > eps[2], eps   # decays with the clock


def test_checkpoint_roundtrip(tmp_path):
    jax.config.update("jax_platforms", "cpu")
    from drl_tetris_tpu.runtime import checkpoint as ckpt
    state = {"params": {"w": jnp.arange(12.0).reshape(3, 4)},
             "step": jnp.int32(7)}
    d = str(tmp_path / "ck")
    ckpt.save(d, 100, state, settings={"gamma": 0.98})
    assert ckpt.latest_step(d) == 100
    restored = ckpt.restore(d, jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_array_equal(restored["params"]["w"],
                                  np.arange(12.0).reshape(3, 4))
    assert int(restored["step"]) == 7
    # recovery checksum validation (runner.py:90-104 semantics)
    cs = ckpt.pytree_checksum(state)
    ckpt.validate_recovery(lambda s: s, restored, cs)
    with pytest.raises(RuntimeError):
        bad = {"params": {"w": restored["params"]["w"] + 1},
               "step": restored["step"]}
        ckpt.validate_recovery(lambda s: s, bad, cs)
