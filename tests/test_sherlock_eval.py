"""Sherlock (delta-PPO) evaluation support.

1. The eval policy executes exactly the placement it scores/records —
   regression for the mask-column vs posX off-by-one (mask column c is
   posX c-1; step_place takes posX units, engine/step.py::apply_place).
2. Sherlock checkpoints are loadable tournament entrants like every other
   flavour (the reference's eval.py evaluates all agent types uniformly).
"""
import jax
import jax.numpy as jnp
import numpy as np

from drl_tetris_tpu.algos.sherlock import (SherlockNet,
                                           make_sherlock_policy,
                                           sherlock_candidate_probs)
from drl_tetris_tpu.config.presets import load
from drl_tetris_tpu.engine import masks as M
from drl_tetris_tpu.env.env import TetrisVectorEnv
from drl_tetris_tpu.runtime import checkpoint as ckpt
from drl_tetris_tpu.runtime.evaluate import EvalAgent, play_match

TINY_OV = {"tower_layers": 1, "tower_filters": 8, "val_layers": 1,
           "val_filters": 8, "val_filter_size": 3}


def _tiny_sherlock():
    cfg = load(["default", "sventon", "sventon_ppo", "sherlock"], TINY_OV)
    net = SherlockNet(cfg.model, full_network=True)
    H, W = cfg.env.engine.height, cfg.env.engine.width
    params = net.init(jax.random.PRNGKey(5),
                      [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
    return cfg, net, params


def test_sherlock_policy_executes_recorded_placement():
    cfg, net, params = _tiny_sherlock()
    n = 4
    env = TetrisVectorEnv(cfg.env, n)
    st = env.reset(jax.random.PRNGKey(11))
    ecfg = cfg.env.engine
    W = ecfg.width

    pol = make_sherlock_policy(env, net, distribution="argmax")
    for step in range(3):
        # the policy's argmax choice, re-derived from the shared scorer
        obs = env.observe(st)
        p, mask, _, piece, _, _ = sherlock_candidate_probs(
            ecfg, net, params, obs, st, full=False)
        pf = np.asarray(p.reshape(n, -1))
        mf = np.asarray(mask.reshape(n, -1))
        a_idx = np.where(mf, pf, -1.0).argmax(axis=1)
        r_abs, c = a_idx // W, a_idx % W

        # predicted post-lock boards of those placements
        player = np.asarray(st.current_player)
        ps = st.engine.players
        take = lambda a: jnp.take_along_axis(
            a, st.current_player.reshape((n,) + (1,) * (a.ndim - 1)),
            axis=1)[:, 0]
        _, occ_after, _ = jax.vmap(
            lambda o, g, pc, r: M.placement_boards(ecfg, o, g, pc, r)
        )(take(ps.occ), take(ps.garb), take(ps.piece), take(ps.rot))
        pred = np.asarray(occ_after)[np.arange(n), r_abs, c]

        out = pol(params, st, jax.random.PRNGKey(step))
        _, _, r_rel, x, *_ = out
        np.testing.assert_array_equal(np.asarray(x), c - 1)
        st2, _, done = env.step_place(st, r_rel, x)
        got = np.asarray(st2.engine.players.occ)[np.arange(n), player]
        live = ~np.asarray(done)   # finished rounds swap in reset boards
        assert (got[live] == pred[live]).all()
        st = st2


def test_sherlock_checkpoint_is_a_tournament_entrant(tmp_path):
    from drl_tetris_tpu.cli.main import _load_agent
    cfg, net, params = _tiny_sherlock()
    ckpt.save(str(tmp_path), 9, {"params": params}, settings=cfg.settings)

    cli_cfg = load(["default", "sventon", "sventon_ppo"], TINY_OV)
    agent, acfg = _load_agent(str(tmp_path), cli_cfg)
    assert acfg.flavour == "sherlock"
    assert agent.kind == "sherlock"

    # cross-kind matches dispatch per game: vs a macro agent (step_mixed)
    # and vs a world-model agent (both step_place)
    from drl_tetris_tpu.models.nets import PPONet
    pnet = PPONet(cli_cfg.model, full_network=True)
    H, W = cli_cfg.env.engine.height, cli_cfg.env.engine.width
    pparams = pnet.init(jax.random.PRNGKey(1),
                        [jnp.zeros((1, 12))] * 2,
                        [jnp.zeros((1, H, W, 1))] * 2)
    macro = EvalAgent(name="macro", params=pparams, net=pnet,
                      distribution="pi", kind="macro")
    w0, w1, undecided = play_match(cfg.env, (agent, macro), n_games=2,
                                   max_ticks=48, seed=3)
    assert w0 + w1 + undecided == 2

    from drl_tetris_tpu.algos.sixten import VNet
    vnet = VNet(cli_cfg.model, full_network=True)
    vparams = vnet.init(jax.random.PRNGKey(2),
                        [jnp.zeros((1, 12))] * 2,
                        [jnp.zeros((1, H, W, 1))] * 2)
    wm = EvalAgent(name="wm", params=vparams, net=vnet,
                   distribution="epsilon", kind="world_model", epsilon=1.0)
    w0, w1, undecided = play_match(cfg.env, (agent, wm), n_games=2,
                                   max_ticks=48, seed=4)
    assert w0 + w1 + undecided == 2
