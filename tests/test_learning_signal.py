"""Learning-signal regression (VERDICT r1 item 1): after a few hundred PPO
updates on a small board, the trained policy must beat the random anchor
decisively.  This is the one cheap test that catches a silently-broken GAE
sign, reward plumbing, or perspective flip — losses staying finite would
not.  Measured headroom: winrate ~0.78 at these settings; asserted 0.60."""
import jax
import jax.numpy as jnp
import pytest

from drl_tetris_tpu.algos.ppo import PPOConfig
from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.env.env import EnvConfig
from drl_tetris_tpu.models.nets import ModelConfig
from drl_tetris_tpu.runtime.standalone import StandaloneConfig, StandaloneTrainer


@pytest.mark.slow
def test_ppo_beats_random_after_short_training():
    cfg = StandaloneConfig(
        env=EnvConfig(engine=EngineConfig(height=10, width=6)),
        model=ModelConfig(tower_layers=1, tower_filters=8,
                          val_layers=1, val_filters=8),
        ppo=PPOConfig(lr=1e-4, minibatch_size=32, n_train_epochs=4,
                      entropy_loss=0.01),
        n_envs=16, horizon=16, seed=0)
    tr = StandaloneTrainer(cfg)
    ent0 = None
    for it in range(130):
        stats = tr.train_iteration()
        if it == 0:
            ent0 = float(stats["entropy/entropy"])
    ent1 = float(stats["entropy/entropy"])
    assert ent1 < ent0 - 0.3, f"no policy sharpening: {ent0} -> {ent1}"

    from drl_tetris_tpu.runtime.evaluate import EvalAgent, play_match
    net = tr.net
    rnd = net.init(jax.random.PRNGKey(99),
                   [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, 10, 6, 1))] * 2)
    a = EvalAgent(name="trained", params=tr.state.params, net=net,
                  kind="macro", distribution="pi")
    b = EvalAgent(name="random", params=rnd, net=net,
                  kind="macro", distribution="pi")
    # both seatings so a seat bias can't fake a pass
    w0, w1, _ = play_match(cfg.env, (a, b), n_games=32, max_ticks=400, seed=5)
    w1b, w0b, _ = play_match(cfg.env, (b, a), n_games=32, max_ticks=400,
                             seed=6)
    wins, losses = w0 + w0b, w1 + w1b
    rate = wins / max(wins + losses, 1)
    assert rate >= 0.60, f"trained policy winrate vs random only {rate:.2f}"
