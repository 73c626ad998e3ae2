"""Process runners: the distributed (multi-process / multi-host DCN) mode.

Port of drl_tetris/runner.py + worker.py + trainer.py: an abstract runner
with signal-triggered state persistence and checksum-validated recovery, a
worker runner streaming rollout segments to the control-plane queue while
polling versioned weights, and a trainer runner draining the queue into PPO
updates and publishing weights.

This mode exists for scale-out across DCN and for parity with the
reference's docker-compose topology (1 trainer + N workers + store); on a
single pod the in-program mesh path (drl_tetris_tpu/parallel) subsumes it
at ICI speed.
"""
from __future__ import annotations

import dataclasses
import pickle
import signal
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp

from drl_tetris_tpu.runtime.training_state import TrainingState
from drl_tetris_tpu.runtime.checkpoint import pytree_checksum
from drl_tetris_tpu.runtime.standalone import StandaloneConfig
from drl_tetris_tpu.env.env import TetrisVectorEnv
from drl_tetris_tpu.models.nets import PPONet
from drl_tetris_tpu.algos.ppo import make_ppo_update, segment_to_batch
from drl_tetris_tpu.algos.rollout import make_rollout_fn, make_policy_fn


class Runner:
    """runner ABC (runner.py:26-120): SIGINT/SIGTERM -> persist state +
    validation artifact; on start, recover and validate."""

    def __init__(self, ts: TrainingState):
        self.ts = ts
        self.received_interrupt = False
        signal.signal(signal.SIGINT, self._on_signal)
        signal.signal(signal.SIGTERM, self._on_signal)

    def _on_signal(self, signum, frame):
        self.received_interrupt = True

    # subclasses provide these
    def get_runner_state(self) -> Any: ...
    def set_runner_state(self, state: Any): ...
    def validation_computation(self) -> Any: ...
    def graceful_exit(self): ...

    def persist(self):
        """store_runner_state_and_exit (runner.py:69-80)."""
        self.ts.store_runner_state(pickle.dumps(self.get_runner_state()))
        out = self.validation_computation()
        self.ts.store_validation(None, pytree_checksum(out))
        self.graceful_exit()

    def recover(self) -> bool:
        """recover_runner_state + validate_runner (runner.py:82-104)."""
        blob = self.ts.load_runner_state()
        if blob is None:
            return False
        self.set_runner_state(pickle.loads(blob))
        val = self.ts.load_validation()
        if val is not None:
            _, checksum = val
            got = pytree_checksum(self.validation_computation())
            if got != checksum:
                raise RuntimeError(
                    f"recovery validation failed: {got} != {checksum}")
        return True


class WorkerRunner(Runner):
    """drl_tetris/worker.py: rollout segments -> queue; weights <- store."""

    def __init__(self, cfg: StandaloneConfig, ts: TrainingState):
        super().__init__(ts)
        self.cfg = cfg
        self.env = TetrisVectorEnv(cfg.env, cfg.n_envs)
        self.net = PPONet(cfg.model, full_network=True)
        self.rollout = make_rollout_fn(self.env, self.net, cfg.horizon)
        key = jax.random.PRNGKey(cfg.seed)
        self.key, kinit, kenv = jax.random.split(key, 3)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        self.params = self.net.init(
            kinit, [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        self.env_state = self.env.reset(kenv)
        self.weights_index = 0
        self._proc = jax.jit(
            lambda seg, v_last: segment_to_batch(cfg.ppo, seg, v_last))

    def get_runner_state(self):
        return jax.device_get((self.env_state, self.params,
                               self.weights_index, self.key))

    def set_runner_state(self, state):
        # pre-key blobs (3-tuple) stay loadable; they resume with the seed key
        if len(state) == 4:
            self.env_state, self.params, self.weights_index, key = \
                jax.device_put(state)
            self.key = jnp.asarray(key)
        else:
            self.env_state, self.params, self.weights_index = \
                jax.device_put(state)

    def validation_computation(self):
        """Recovered workers must reproduce bit-identical policy output
        (worker.py:62-69)."""
        obs = self.env.observe(self.env_state)
        from drl_tetris_tpu.algos.rollout import policy_inputs
        vec, vis = policy_inputs(obs)
        return jax.device_get(self.net.apply(self.params, vec, vis))

    def graceful_exit(self):
        self.ts.unset_alive()

    def update_weights(self):
        """worker.py:131-140: poll the version index, pull on change."""
        idx = self.ts.weights_index()
        if idx > self.weights_index:
            _, weights = self.ts.fetch_weights()
            if weights is not None:
                self.params = jax.device_put(weights)
            self.weights_index = idx
        return idx

    def run(self, max_steps: Optional[int] = None, logger=None):
        steps = 0
        recovered = self.recover()
        if logger and recovered:
            logger(f"{self.ts.me}: recovered state from store "
                   f"(weights_index={self.weights_index})")
        while not self.received_interrupt:
            self.ts.heartbeat()
            self.ts.tick_clock(self.cfg.n_envs * self.cfg.horizon)
            self.update_weights()
            self.key, kroll = jax.random.split(self.key)
            self.env_state, seg, v_last = self.rollout(
                self.params, self.env_state, kroll)
            batch, gae_stats = self._proc(seg, v_last)
            packet = {
                "worker": self.ts.me,
                "weights_index": self.weights_index,
                "batch": jax.device_get(batch),
                "stats": {k: float(v) for k, v in gae_stats.items()},
            }
            self.ts.push_data(packet)
            steps += self.cfg.n_envs * self.cfg.horizon
            if logger:
                logger(f"{self.ts.me}: segment pushed  steps={steps:,}  "
                       f"weights_index={self.weights_index}  "
                       f"queue={self.ts.queue_len()}")
            if max_steps is not None and steps >= max_steps:
                break
        self.persist()
        if logger:
            logger(f"{self.ts.me}: state persisted, exiting ({steps:,} steps)")
        return steps


class TrainerRunner(Runner):
    """drl_tetris/trainer.py: drain queue -> update -> publish weights."""

    def __init__(self, cfg: StandaloneConfig, ts: TrainingState,
                 min_samples: int = 2048, ckpt_dir: Optional[str] = None,
                 settings: Optional[dict] = None):
        super().__init__(ts)
        self.cfg = cfg
        self.ckpt_dir = ckpt_dir
        self.settings = settings
        self.net = PPONet(cfg.model, full_network=True)
        self.init_opt, self.update = make_ppo_update(
            cfg.env.engine, self.net, cfg.ppo)
        key = jax.random.PRNGKey(cfg.seed + 7)
        self.key, kinit = jax.random.split(key)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        params = self.net.init(
            kinit, [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        self.state = self.init_opt(params)
        self.min_samples = min_samples
        self.pending = []
        self.pending_n = 0

    def get_runner_state(self):
        return jax.device_get(self.state)

    def set_runner_state(self, state):
        self.state = jax.device_put(state)

    def validation_computation(self):
        return jax.device_get(jax.tree.leaves(self.state.params)[0])

    def graceful_exit(self):
        """trainer.py:47-50: publish final weights + store snapshot."""
        self.ts.publish_weights(jax.device_get(self.state.params))
        self.ts.unset_alive()

    def drain(self):
        """load_worker_data (trainer.py:83-87)."""
        for packet in self.ts.pop_data_iter():
            self.pending.append(packet["batch"])
            self.pending_n += len(packet["batch"].piece)

    def maybe_train(self):
        """do_training (sventon_agent_ppo_trainer.py:22-67): wait for
        n_samples, train on everything, clear (on-policy)."""
        if self.pending_n < self.min_samples:
            return None
        import numpy as np
        from drl_tetris_tpu.algos.ppo import Batch
        cat = Batch(*[
            jnp.asarray(np.concatenate([getattr(b, f) for b in self.pending]))
            for f in Batch._fields])
        self.pending, self.pending_n = [], 0
        self.key, kupd = jax.random.split(self.key)
        self.state, stats = self.update(self.state, cat, kupd)
        return {k: float(v) for k, v in stats.items()}

    def _save_ckpt(self, step: int):
        if self.ckpt_dir is not None:
            from drl_tetris_tpu.runtime import checkpoint as ckpt
            ckpt.save(self.ckpt_dir, step, jax.device_get(self.state),
                      settings=self.settings)

    def run(self, max_updates: Optional[int] = None, logger=None,
            log_every: int = 1):
        from drl_tetris_tpu.runtime.checkpoint import NUMBERED_EVERY
        updates = 0
        if self.recover() and logger:
            logger("trainer: recovered state from store")
        while not self.received_interrupt:
            self.ts.heartbeat()
            self.drain()
            stats = self.maybe_train()
            if stats is not None:
                updates += 1
                idx = self.ts.publish_weights(jax.device_get(self.state.params))
                for k, v in stats.items():
                    self.ts.stats_set(k, v)
                if logger and updates % log_every == 0:
                    head = {k: stats[k] for k in
                            ("losses/total_loss", "entropy/entropy")
                            if k in stats}
                    logger(f"trainer: update {updates}  weights_index={idx}  "
                           f"clock={self.ts.clock():,}  "
                           + "  ".join(f"{k.split('/')[-1]}={v:.4f}"
                                       for k, v in head.items()))
                # numbered checkpoint every 250 publishes
                # (trainer.py:113-123 cadence; LATEST lives in the store)
                if updates % NUMBERED_EVERY == 0:
                    self._save_ckpt(self.ts.clock())
                if max_updates is not None and updates >= max_updates:
                    break
            else:
                time.sleep(0.01)
        self._save_ckpt(max(self.ts.clock(), 1))
        self.persist()
        if logger:
            logger(f"trainer: exiting after {updates} updates")
        return updates
