"""Mesh-parallel actor-learner: the whole training system as ONE program.

The reference scales by running worker *processes* that stream pickled
trajectories through Redis to a single GPU trainer, which streams weights
back (docker-compose.yaml:4-35, drl_tetris/worker.py, trainer.py,
redis_types.py — SURVEY.md section 2.5).  On TPU that entire data plane
collapses into in-program collectives over ICI:

  * actor data parallelism: the env-state batch (N games) is sharded over
    the mesh 'data' axis; each device steps its shard and runs the policy
    forward locally — zero communication (the Ape-X worker fleet);
  * parameter distribution: params live replicated in the same program —
    the weight broadcast that Redis did (trainer.py:107-111,
    worker.py:131-140) is simply the pmean'd update keeping replicas
    identical, at ICI speed, every update instead of every poll;
  * experience transport: trajectory segments never leave the device that
    generated them; the learner trains data-parallel on local shards with
    gradient all-reduce (replacing the Redis data_queue entirely);
  * multi-host: the same program under jax.distributed spans hosts — the
    'data' axis simply gets longer; DCN is only crossed by the collectives
    XLA places.

Tensor/pipeline/sequence/expert parallelism are deliberately absent: the
models are ~3.6M-param CNNs with no sequence dimension (SURVEY.md 2.5
"Explicitly absent") — sharding them would burn ICI bandwidth to save
nothing.  The scaling dimension of this workload is games, and 'data' is
its axis.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv
from drl_tetris_tpu.models.nets import ModelConfig, PPONet
from drl_tetris_tpu.algos.ppo import PPOConfig, make_ppo_update, segment_to_batch
from drl_tetris_tpu.algos.rollout import make_rollout_fn

AXIS = "data"


@dataclasses.dataclass(frozen=True)
class DistributedConfig:
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    ppo: PPOConfig = PPOConfig()
    n_envs: int = 4096            # global game count, sharded over AXIS
    horizon: int = 32
    seed: int = 0


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (AXIS,))


class DistributedTrainer:
    """Sharded self-play training: one jitted step = rollout segment on all
    actor shards + data-parallel PPO update with gradient all-reduce."""

    def __init__(self, cfg: DistributedConfig, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        d = mesh.devices.size
        assert cfg.n_envs % d == 0, "n_envs must divide the mesh"
        self.n_local = cfg.n_envs // d

        # Per-shard env/rollout: built for the LOCAL shard size; shard_map
        # presents each device exactly that slice.
        self.env = TetrisVectorEnv(cfg.env, self.n_local)
        self.net = PPONet(cfg.model, full_network=True)
        self._rollout = make_rollout_fn(self.env, self.net, cfg.horizon)
        self.init_opt, self._update = make_ppo_update(
            cfg.env.engine, self.net, cfg.ppo, axis_name=AXIS)

        env_spec = P(AXIS)
        rep = P()

        def train_shard(state, env_state, key):
            # distinct randomness per shard
            key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
            kroll, kupd = jax.random.split(key)
            env_state, seg, v_last = self._rollout(
                state.params, env_state, kroll)
            batch, gae_stats = segment_to_batch(cfg.ppo, seg, v_last)
            state, stats = self._update(state, batch, kupd)
            stats = jax.tree.map(lambda a: jax.lax.pmean(a, AXIS), stats)
            return state, env_state, stats

        def reset_shard(key):
            key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
            return self.env.reset(key)

        self.train_step = jax.jit(shard_map(
            train_shard, mesh=mesh,
            in_specs=(rep, env_spec, rep),
            out_specs=(rep, env_spec, rep),
            check_rep=False,
        ))
        self.reset_envs = jax.jit(shard_map(
            reset_shard, mesh=mesh, in_specs=(rep,), out_specs=env_spec,
            check_rep=False,
        ))

    def init(self, key):
        H, W = self.cfg.env.engine.height, self.cfg.env.engine.width
        kp, ke = jax.random.split(jax.random.PRNGKey(self.cfg.seed) if key is None else key)
        params = self.net.init(
            kp, [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        state = self.init_opt(params)
        env_state = self.reset_envs(ke)
        return state, env_state
