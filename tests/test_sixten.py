"""SIXten family tests: VNet shapes, world-model policy legality, and the
end-to-end standalone trainer (algos/sixten.py, runtime/standalone.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_tetris_tpu.engine import masks as M
from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv
from drl_tetris_tpu.models.nets import ModelConfig
from drl_tetris_tpu.algos.replay import ReplayConfig
from drl_tetris_tpu.algos.sixten import (
    SixtenConfig, VNet, make_sixten_policy, make_sixten_rollout)
from drl_tetris_tpu.algos.value_estimator import EstimatorConfig

TINY = ModelConfig(tower_layers=2, tower_filters=8, val_layers=2,
                   val_filters=8)


@pytest.fixture(scope="module")
def env():
    return TetrisVectorEnv(EnvConfig(), 3)


@pytest.fixture(scope="module")
def net_and_params(env):
    net = VNet(TINY, full_network=True)
    H, W = env.cfg.engine.height, env.cfg.engine.width
    params = net.init(jax.random.PRNGKey(0),
                      [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
    return net, params


def test_vnet_output_shape(net_and_params, env):
    net, params = net_and_params
    H, W = env.cfg.engine.height, env.cfg.engine.width
    v = net.apply(params, [jnp.zeros((5, 12))] * 2,
                  [jnp.zeros((5, H, W, 1))] * 2)
    assert v.shape == (5, 7)
    assert bool(jnp.all(jnp.abs(v) <= 1.0))      # tanh head


def test_policy_picks_legal_placements(net_and_params, env):
    net, params = net_and_params
    cfg = env.cfg.engine
    st = env.reset(jax.random.PRNGKey(1))
    policy = make_sixten_policy(env, net, distribution="argmax")
    obs, piece, r_rel, x, prob, v_sel, v_mean = policy(
        params, st, jax.random.PRNGKey(2))
    N = 3
    assert r_rel.shape == (N,) and x.shape == (N,)
    # the chosen (rotation, column) must be in each game's legal mask
    ps = st.engine.players
    player = st.current_player
    take = lambda a: jnp.take_along_axis(
        a, player.reshape((N,) + (1,) * (a.ndim - 1)), axis=1)[:, 0]
    occ, garb = take(ps.occ), take(ps.garb)
    pc, rot = take(ps.piece), take(ps.rot)
    for i in range(N):
        mask, _ = M.top_drop(cfg, occ[i], pc[i], rot[i])
        r_abs = (int(r_rel[i]) + int(rot[i])) % 4
        c = int(x[i]) + 1
        assert bool(mask[r_abs, c]), (i, r_abs, c, np.asarray(mask))


def test_rollout_and_training_iteration():
    from drl_tetris_tpu.runtime.standalone import (
        StandaloneSIXtenConfig, StandaloneSIXtenTrainer)
    cfg = StandaloneSIXtenConfig(
        model=TINY, n_envs=2, horizon=4,
        replay=ReplayConfig(capacity=512, k_step=2),
    )
    scfg = SixtenConfig(n_samples_each_update=8, minibatch_size=4,
                        n_train_epochs=1,
                        estimator=EstimatorConfig(k_step=2))
    tr = StandaloneSIXtenTrainer(cfg, sixten_cfg=scfg)
    for _ in range(2):
        stats = tr.train_iteration()
    assert tr.total_steps == 16
    assert int(tr.replay.size) > 0
    # second iteration had >= 8 samples -> a training step ran
    assert "tot_loss" in tr.stats
    assert np.isfinite(tr.stats["tot_loss"])


def test_mixed_match_world_model_vs_macro():
    """A VNet world-model agent and a PPONet macro agent play in the same
    vectorized match (env.step_mixed dispatch per acting seat)."""
    from drl_tetris_tpu.models.nets import PPONet
    from drl_tetris_tpu.runtime.evaluate import EvalAgent, play_match
    cfg = EnvConfig()
    H, W = cfg.engine.height, cfg.engine.width
    dummy = ([jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
    vnet = VNet(TINY, full_network=True)
    pnet = PPONet(TINY, full_network=True)
    a = EvalAgent(name="sixten", params=vnet.init(jax.random.PRNGKey(0), *dummy),
                  net=vnet, distribution="argmax", kind="world_model")
    b = EvalAgent(name="sventon", params=pnet.init(jax.random.PRNGKey(1), *dummy),
                  net=pnet, distribution="argmax", kind="macro")
    w0, w1, undecided = play_match(cfg, (a, b), n_games=2, max_ticks=16,
                                   seed=3)
    assert w0 + w1 + undecided == 2
