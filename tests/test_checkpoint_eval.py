"""Settings side-file round-trip + flavour-dispatched eval agent loading
(the reference's weights<->settings pairing, eval.py:99-104,
tools/utils.py:47-64)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_tetris_tpu.config.presets import load
from drl_tetris_tpu.runtime import checkpoint as ckpt

TINY = ["tower_layers=1", "tower_filters=8", "val_layers=1", "val_filters=8",
        "val_filter_size=3"]
TINY_OV = {"tower_layers": 1, "tower_filters": 8, "val_layers": 1,
           "val_filters": 8, "val_filter_size": 3}


def test_settings_roundtrip_through_json(tmp_path):
    cfg = load(["default", "sventon", "sventon_ppo", "resblock",
                "experiment_sventon_ppo"], TINY_OV)
    # params-only checkpoint (the demo-weights light form)
    params = {"w": jnp.arange(4.0)}
    ckpt.save(str(tmp_path), 100, {"params": params}, settings=cfg.settings)
    s = ckpt.load_settings(str(tmp_path))
    assert s is not None
    from drl_tetris_tpu.config.presets import resolve
    cfg2 = resolve(s)
    # schedulable parameters and compressor configs survive the round trip
    assert cfg2.ppo.lr == cfg.ppo.lr
    assert cfg2.ppo.compress_advantages == cfg.ppo.compress_advantages
    assert cfg2.env.engine.height == cfg.env.engine.height
    assert cfg2.flavour == "ppo"


def test_restore_raw_reads_any_tree(tmp_path):
    tree = {"params": {"a": jnp.ones((2, 3)), "b": jnp.zeros(5)}}
    ckpt.save(str(tmp_path), 7, tree)
    raw = ckpt.restore_raw(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(raw["params"]["a"]),
                                  np.ones((2, 3)))


@pytest.mark.parametrize("presets,flavour,kind", [
    (["default", "sventon", "sventon_ppo"], "ppo", "macro"),
    (["default", "sventon", "sventon_dqn"], "dqn", "macro"),
    (["default", "sventon", "sventon_dqn", "experiment_sixten"],
     "sixten", "world_model"),
])
def test_eval_agent_reconstructed_from_side_file(tmp_path, presets, flavour,
                                                 kind):
    from drl_tetris_tpu.cli.main import _load_agent
    cfg = load(presets, TINY_OV)
    assert cfg.flavour == flavour

    if flavour == "sixten":
        from drl_tetris_tpu.algos.sixten import VNet
        net = VNet(cfg.model, full_network=True)
    elif flavour == "dqn":
        from drl_tetris_tpu.models.nets import QNet
        net = QNet(cfg.model, full_network=True)
    else:
        from drl_tetris_tpu.models.nets import PPONet
        net = PPONet(cfg.model, full_network=True)
    H, W = cfg.env.engine.height, cfg.env.engine.width
    params = net.init(jax.random.PRNGKey(3),
                      [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
    ckpt.save(str(tmp_path), 42, {"params": params}, settings=cfg.settings)

    # load with a DIFFERENT cli config: the side-file must win
    cli_cfg = load(["default", "sventon", "sventon_ppo"], TINY_OV)
    agent, acfg = _load_agent(str(tmp_path), cli_cfg)
    assert acfg.flavour == flavour
    assert agent.kind == kind
    for a, b in zip(jax.tree.leaves(agent.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
