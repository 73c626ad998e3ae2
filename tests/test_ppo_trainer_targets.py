"""PPO trainer-computes-targets mode (workers_computes_advantages=False).

Reference semantics: ppo_nets.create_targets (ppo_nets.py:227-257) — a
separate reference network feeds the value_estimator, target values are
k-step lambda estimates, advantages = values - targets; the reference net
syncs from the main net on the trainer's cadence
(sventon_agent_ppo_trainer.py:70-74, counter init
sventon_agent_trainer_base.py:42).  Workers run the value-stream-free net
(full_network gating, ppo_nets.py:28).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_tetris_tpu.algos.ppo import (
    PPOConfig, segment_to_windows, make_ppo_update)
from drl_tetris_tpu.algos.rollout import Segment
from drl_tetris_tpu.env.env import EnvConfig
from drl_tetris_tpu.models.nets import ModelConfig, PPONet
from drl_tetris_tpu.runtime.standalone import StandaloneConfig, StandaloneTrainer


def _tiny_model():
    return ModelConfig(compute_dtype="float32", tower_layers=1,
                       tower_filters=4, val_layers=1, val_filters=4)


def _fake_segment(T, N, H=22, seed=0):
    r = np.random.RandomState(seed)
    return Segment(
        occ=jnp.asarray(r.randint(0, 1024, (T, N, 2, H)), jnp.uint32),
        vec=jnp.asarray(r.rand(T, N, 2, 12), jnp.float32),
        piece=jnp.asarray(r.randint(0, 7, (T, N)), jnp.int32),
        rot=jnp.asarray(r.randint(0, 4, (T, N)), jnp.int32),
        trans=jnp.asarray(r.randint(0, 10, (T, N)), jnp.int32),
        prob=jnp.asarray(r.rand(T, N), jnp.float32),
        v_piece=jnp.asarray(r.rand(T, N), jnp.float32),
        v_mean=jnp.asarray(r.rand(T, N), jnp.float32),
        reward=jnp.asarray(r.rand(T, N), jnp.float32),
        done=jnp.asarray(r.rand(T, N) < 0.2),
        player=jnp.asarray(r.randint(0, 2, (T, N)), jnp.int32),
    )


def test_segment_to_windows_layout():
    T, N, K = 6, 3, 2
    seg = _fake_segment(T, N)
    cfg = PPOConfig(workers_computes_advantages=False,
                    n_step_value_estimates=K)
    wb = segment_to_windows(cfg, seg)
    n_t = T - K
    assert wb.occ_w.shape == (n_t * N, K + 1, 2, 22)
    assert wb.reward_w.shape == (n_t * N, K + 1)
    # sample (t, n) flattens to index t*N + n; window j is segment step t+j
    occ = np.asarray(seg.occ)
    rew = np.asarray(seg.reward)
    for t in range(n_t):
        for n in range(N):
            b = t * N + n
            for j in range(K + 1):
                assert np.array_equal(np.asarray(wb.occ_w)[b, j], occ[t + j, n])
                assert np.asarray(wb.reward_w)[b, j] == rew[t + j, n]
            assert np.asarray(wb.piece)[b] == np.asarray(seg.piece)[t, n]


def test_trainer_targets_k1_numeric():
    """k=1 targets == r0 + gamma_eff * V_ref(s1) (masked at dones), and the
    loss consumes advantages = values - targets."""
    from drl_tetris_tpu.algos.value_estimator import kstep_targets
    env_cfg = EnvConfig()
    model = _tiny_model()
    net = PPONet(model, full_network=True)
    key = jax.random.PRNGKey(0)
    params = net.init(key, [jnp.zeros((1, 12))] * 2,
                      [jnp.zeros((1, 22, 10, 1))] * 2)
    cfg = PPOConfig(workers_computes_advantages=False,
                    n_step_value_estimates=1)
    seg = _fake_segment(4, 5, seed=3)
    wb = segment_to_windows(cfg, seg)
    windows = {"occ": wb.occ_w, "vec": wb.vec_w,
               "reward": wb.reward_w, "done": wb.done_w}
    tgt = np.asarray(kstep_targets(env_cfg.engine, net, cfg.estimator,
                                   params, windows))

    # replicate by hand
    from drl_tetris_tpu.env.observations import field_grid
    occ1 = wb.occ_w[:, 1]
    grids = field_grid(env_cfg.engine, occ1)
    vis = [grids[:, 0, :, :, None], grids[:, 1, :, :, None]]
    vec = [wb.vec_w[:, 1, 0, :], wb.vec_w[:, 1, 1, :]]
    _, v = net.apply(params, vec, vis)
    v1 = np.asarray(jnp.mean(v, axis=-1))
    g = cfg.estimator.effective_gamma
    d0 = np.asarray(wb.done_w)[:, 0]
    r0 = np.asarray(wb.reward_w)[:, 0]
    done_time = 1.0 - np.minimum(1, d0)          # k=1 window: 1 if alive
    expect = r0 * 1.0 + v1 * (done_time >= 1) * g
    # estimator weight: lam_k**k / lam_k**k == 1 when alive; when done at 0
    # lam_1 = lam*(done_time >= 0) = lam regardless (truncate uses k-1=0)
    assert np.allclose(tgt, expect, atol=1e-5), (tgt[:4], expect[:4])


def test_trainer_targets_mode_trains_and_syncs_ref():
    cfg = StandaloneConfig(
        model=_tiny_model(),
        ppo=PPOConfig(workers_computes_advantages=False,
                      n_step_value_estimates=1,
                      time_to_reference_update=1,
                      minibatch_size=16, n_train_epochs=2, lr=1e-3),
        n_envs=4, horizon=9)
    tr = StandaloneTrainer(cfg)
    p0 = jax.tree.map(np.asarray, tr.state.params)
    assert tr.state.ref_params is not None
    assert int(tr.state.ref_countdown) == 0

    stats = tr.train_iteration()
    assert np.isfinite(stats["losses/total_loss"])
    # counter was 0 -> ref synced to the post-update main params, reloaded
    assert int(tr.state.ref_countdown) == 1
    ref1 = jax.tree.map(np.asarray, tr.state.ref_params)
    cur1 = jax.tree.map(np.asarray, tr.state.params)
    chex_equal = all(np.array_equal(a, b) for a, b in zip(
        jax.tree.leaves(ref1), jax.tree.leaves(cur1)))
    assert chex_equal, "reference net must equal main net after first sync"
    # params actually moved
    moved = any(not np.array_equal(a, b) for a, b in zip(
        jax.tree.leaves(p0), jax.tree.leaves(cur1)))
    assert moved

    tr.train_iteration()
    # countdown 1 -> no sync this pass, just tick down
    assert int(tr.state.ref_countdown) == 0
    ref2 = jax.tree.map(np.asarray, tr.state.ref_params)
    same = all(np.array_equal(a, b) for a, b in zip(
        jax.tree.leaves(ref1), jax.tree.leaves(ref2)))
    assert same, "reference net must hold between syncs"


def test_worker_net_skips_value_stream():
    """full_network=False shares the trunk params and matches the policy
    exactly (ppo_nets.py:28 worker gating)."""
    model = _tiny_model()
    full = PPONet(model, full_network=True)
    part = PPONet(model, full_network=False)
    p = full.init(jax.random.PRNGKey(0), [jnp.zeros((1, 12))] * 2,
                  [jnp.zeros((1, 22, 10, 1))] * 2)
    vec = [jnp.ones((3, 12))] * 2
    vis = [jnp.ones((3, 22, 10, 1))] * 2
    pi_f, _ = full.apply(p, vec, vis)
    pi_p, v_p = part.apply(p, vec, vis)
    assert np.allclose(np.asarray(pi_f), np.asarray(pi_p))
    assert np.all(np.asarray(v_p) == 0.0)
