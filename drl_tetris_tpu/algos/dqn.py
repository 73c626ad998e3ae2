"""SVENton-DQN: prioritized k-step double-dueling Q-learning.

Ports prio_qnet's training graph (agents/networks/prio_qnet.py:102-124) and
the DQN trainer loop (agents/sventon_agent/sventon_agent_dqn_trainer.py):

  1. prioritized sample (scheduled alpha/beta) from the replay,
  2. k-step lambda targets through the REFERENCE net (value_estimator),
  3. epochs x minibatches of IS-weighted MSE on Q(s, r, t, piece),
  4. new priorities |q - target| (+ optional optimistic term) from the last
     epoch -> replay prio update,
  5. periodic reference_update copying main -> reference params
     (network.py:51-60, time_to_reference_update).

SIXten's k-step value learning with prioritized replay (prio_vnet.py —
vestigial in the reference snapshot, SURVEY.md 2.4) survives through this
same path: set k_step = n_step_value_estimates and train the V head only.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.env.observations import field_grid
from drl_tetris_tpu.algos.replay import (
    ReplayConfig, ReplayState, replay_sample, replay_gather_windows,
    replay_update_prios)
from drl_tetris_tpu.algos.value_estimator import EstimatorConfig, make_target_fn


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    lr: float = 1e-4                      # value_lr (presets.py:49)
    nn_regularizer: float = 1e-4
    n_samples_each_update: int = 8192     # presets.py:41
    minibatch_size: int = 32
    n_train_epochs: int = 3
    # ParamLike: the reference schedules these over training time
    # (sventon_agent_dqn_trainer.py:34-39); host loops evaluate them per
    # update and pass the values into update_fn as dynamic scalars.
    alpha: Any = 0.7                      # prioritized_replay_alpha
    beta: Any = 0.7                       # prioritized_replay_beta
    optimistic_prios: float = 0.0
    time_to_reference_update: int = 1     # presets.py:147
    estimator: EstimatorConfig = EstimatorConfig()


@struct.dataclass
class DQNState:
    params: Any
    ref_params: Any
    opt_state: Any
    update_count: jnp.ndarray


def make_dqn_update(engine_cfg: EngineConfig, net, cfg: DQNConfig,
                    replay_cfg: ReplayConfig):
    """Returns (init_fn(params), update_fn(state, replay, key) ->
    (state', replay', stats))."""
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    target_fn = make_target_fn(engine_cfg, net, cfg.estimator)

    def init_fn(params) -> DQNState:
        return DQNState(params=params,
                        ref_params=jax.tree.map(jnp.copy, params),
                        opt_state=tx.init(params),
                        update_count=jnp.int32(0))

    def q_of(params, occ, vec, rot, trans, piece):
        grids = field_grid(engine_cfg, occ)
        vis = [grids[:, 0, :, :, None], grids[:, 1, :, :, None]]
        vl = [vec[:, 0, :], vec[:, 1, :]]
        q, v, a = net.apply(params, vl, vis)
        b = jnp.arange(q.shape[0])
        return q[b, rot, trans, piece]

    def loss_fn(params, mb, weights):
        q_rtp = q_of(params, mb["occ0"], mb["vec0"], mb["rot"],
                     mb["trans"], mb["piece"])
        err = q_rtp - mb["target"]
        prios = jnp.abs(err)
        if cfg.optimistic_prios != 0.0:
            prios = prios + cfg.optimistic_prios * jax.nn.relu(prios)
        value_loss = jnp.mean(weights * err ** 2)
        reg = cfg.nn_regularizer * 0.5 * sum(
            jnp.sum(jnp.square(w)) for w in jax.tree.leaves(params))
        loss = value_loss + reg
        return loss, (prios, {"q_val": jnp.mean(q_rtp),
                              "q_target": jnp.mean(mb["target"]),
                              "value_loss": value_loss, "reg_loss": reg,
                              "tot_loss": loss})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    from drl_tetris_tpu.config.parameter import param_eval

    @jax.jit
    def update_fn(state: DQNState, replay: ReplayState, key,
                  alpha=None, beta=None):
        alpha = param_eval(cfg.alpha) if alpha is None else alpha
        beta = param_eval(cfg.beta) if beta is None else beta
        ks, kp = jax.random.split(key)
        idx, iw = replay_sample(cfg_replay_static, replay, ks,
                                cfg.n_samples_each_update, alpha, beta)
        win = replay_gather_windows(cfg_replay_static, replay, idx)
        targets = target_fn(state.ref_params, win)
        samples = {
            "occ0": win["occ"][:, 0], "vec0": win["vec"][:, 0],
            "rot": win["rot"], "trans": win["trans"], "piece": win["piece"],
            "target": targets,
        }
        n = cfg.n_samples_each_update
        n_mb = n // cfg.minibatch_size

        def epoch_step(carry, ekey):
            params, opt_state, prio_buf = carry
            perm = jax.random.permutation(ekey, n)
            mb_idxs = perm[: n_mb * cfg.minibatch_size].reshape(
                n_mb, cfg.minibatch_size)

            def mb_step(c, mi):
                params, opt_state, prio_buf = c
                mb = jax.tree.map(lambda a: a[mi], samples)
                (loss, (prios, stats)), grads = grad_fn(
                    params, mb, iw[mi])
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                prio_buf = prio_buf.at[mi].set(prios)
                return (params, opt_state, prio_buf), stats

            (params, opt_state, prio_buf), stats = jax.lax.scan(
                mb_step, (params, opt_state, prio_buf), mb_idxs)
            return (params, opt_state, prio_buf), jax.tree.map(
                lambda a: a[-1], stats)

        prio_buf = jnp.zeros((n,), jnp.float32)
        ekeys = jax.random.split(kp, cfg.n_train_epochs)
        (params, opt_state, prio_buf), stats = jax.lax.scan(
            epoch_step, (state.params, state.opt_state, prio_buf), ekeys)
        stats = jax.tree.map(lambda a: a[-1], stats)

        replay = replay_update_prios(replay, idx, prio_buf)
        count = state.update_count + 1
        # reference_update every time_to_reference_update trainings
        do_ref = (count % cfg.time_to_reference_update) == 0
        ref_params = jax.tree.map(
            lambda m, r: jnp.where(do_ref, m, r), params, state.ref_params)
        return DQNState(params=params, ref_params=ref_params,
                        opt_state=opt_state, update_count=count), replay, stats

    cfg_replay_static = replay_cfg
    return init_fn, update_fn
