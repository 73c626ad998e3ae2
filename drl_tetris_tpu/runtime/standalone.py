"""Standalone single-process self-play training (SVENton-PPO, one chip).

The reference's run_standalone mode (presets.py:157, sventon_agent.py:42-47,
140-144): worker and trainer in one process, no Redis.  Here the whole
iteration — rollout segment, GAE, PPO update, weight handoff — is two jitted
calls; the worker's policy params are simply the learner's (in-memory
broadcast; the distributed runtime in drl_tetris_tpu/parallel shards this
across a mesh).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv
from drl_tetris_tpu.models.nets import ModelConfig, PPONet
from drl_tetris_tpu.algos.ppo import PPOConfig, make_ppo_update, segment_to_batch
from drl_tetris_tpu.algos.rollout import make_rollout_fn, policy_inputs


@dataclasses.dataclass(frozen=True)
class StandaloneConfig:
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    ppo: PPOConfig = PPOConfig()
    n_envs: int = 30              # n_envs_per_thread (sventon_ppo.py:64)
    horizon: int = 72             # ticks per segment; n_envs*horizon >= 2048
    seed: int = 0


class StandaloneTrainer:
    def __init__(self, cfg: StandaloneConfig):
        self.cfg = cfg
        self.env = TetrisVectorEnv(cfg.env, cfg.n_envs)
        self.net = PPONet(cfg.model, full_network=True)
        self.rollout = make_rollout_fn(self.env, self.net, cfg.horizon)
        self.init_opt, self.update = make_ppo_update(
            cfg.env.engine, self.net, cfg.ppo)
        self._proc = jax.jit(
            lambda seg, v_last: segment_to_batch(cfg.ppo, seg, v_last))

        key = jax.random.PRNGKey(cfg.seed)
        self.key, kinit, kenv = jax.random.split(key, 3)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        dummy_vec = [jnp.zeros((1, 12))] * 2
        dummy_vis = [jnp.zeros((1, H, W, 1))] * 2
        params = self.net.init(kinit, dummy_vec, dummy_vis)
        self.state = self.init_opt(params)
        self.env_state = self.env.reset(kenv)
        self.total_steps = 0
        self.stats = {}

    def train_iteration(self):
        """One worker segment + one PPO update (trainer.py:71-75 semantics)."""
        self.key, kroll, kupd = jax.random.split(self.key, 3)
        self.env_state, seg, v_last = self.rollout(
            self.state.params, self.env_state, kroll)
        batch, gae_stats = self._proc(seg, v_last)
        self.state, stats = self.update(self.state, batch, kupd)
        self.total_steps += self.cfg.n_envs * self.cfg.horizon
        stats.update({k: v for k, v in gae_stats.items()})
        self.stats = {k: float(v) for k, v in stats.items()}
        return self.stats

    def run(self, n_iterations: int, log_every: int = 1, logger=print):
        for it in range(n_iterations):
            t0 = time.time()
            stats = self.train_iteration()
            jax.block_until_ready(self.state.params)
            dt = time.time() - t0
            if it % log_every == 0:
                sps = self.cfg.n_envs * self.cfg.horizon / dt
                logger(f"iter {it}: {sps:,.0f} env-steps/s  "
                       f"loss={stats['losses/total_loss']:.4f}  "
                       f"entropy={stats['entropy/entropy']:.3f}  "
                       f"clip_sat={stats['misc/clip_saturation']:.3f}")
        return self.stats
