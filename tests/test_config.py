"""Config layer: preset layering semantics (tools/utils.py:34-45), typed
resolution, and flavour wiring for every agent family."""
import pytest

from drl_tetris_tpu.config.presets import PRESETS, load, merge_settings, resolve
from drl_tetris_tpu.config.parameter import (
    ExpParameter, LinearParameter, Parameter)


def test_presets_apply_in_order_then_overlays():
    # later presets override earlier ones (parse_settings semantics)
    s = merge_settings(["default", "sventon", "sventon_dqn"])
    assert s["flavour"] == "dqn"
    s2 = merge_settings(["default", "sventon", "sventon_dqn"],
                        {"flavour": "ppo", "gamma": 0.5})
    assert s2["flavour"] == "ppo" and s2["gamma"] == 0.5


def test_game_area_derived_key():
    s = merge_settings(["default"], {"game_size": (8, 6)})
    assert s["game_area"] == 48  # tools/utils.py:44


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        merge_settings(["default", "nope"])


def test_default_stack_resolves_ppo():
    cfg = load()
    assert cfg.flavour == "ppo"
    assert cfg.env.engine.height == 22 and cfg.env.engine.width == 10
    # experiment_sventon_ppo values took effect (sventon_ppo.py:30-36)
    assert cfg.ppo.minibatch_size == 64
    assert cfg.ppo.gae_lambda == 0.7
    assert cfg.ppo.compress_advantages is not None


def test_sherlock_preset_wiring():
    cfg = load(["default", "sventon", "sherlock"])
    assert cfg.flavour == "sherlock"
    assert cfg.sherlock is not None
    assert cfg.sherlock.impossibility_loss == 0.1  # delta_ppo_nets c4
    assert cfg.train_distribution == "pi"
    assert not cfg.model.separate_piece_values


def test_dual_policy_via_single_policy_false():
    cfg = load(["default", "sventon", "sventon_ppo"],
               {"single_policy": False})
    assert not cfg.ppo.single_policy
    # winrate gate defaults live in settings (presets.py:179-180)
    assert cfg.settings.get("winrate_learningrate", 0.02) == 0.02


def test_sixten_preset_schedules():
    cfg = load(["default", "sventon", "sventon_dqn", "experiment_sixten"])
    assert cfg.flavour == "sixten"
    assert cfg.sixten.estimator.k_step == 5
    assert cfg.env.engine.piece_map == tuple((0, 6) * 4)[:7]


def test_parameters_evaluate_with_clamps():
    assert Parameter(3.0)(0) == 3.0
    lin = LinearParameter(0.5, decay=0.5 / 100, max_val=1.0)
    assert lin(0) == 0.5
    assert lin(100) == pytest.approx(1.0)
    assert lin(10**9) == 1.0  # clamped
    exp = ExpParameter(1e-3, base=10.0, decay=-3 / 100)
    assert exp(0) == pytest.approx(1e-3)
    assert exp(100) == pytest.approx(1e-6)


def test_every_preset_resolves():
    # no preset combination may crash typed resolution
    for name in PRESETS:
        cfg = resolve(merge_settings(["default", name]))
        assert cfg.env.engine.width > 0
