"""The process-mode CLI: `up` brings a full topology (tetrikv + trainer +
worker) from a cold shell to trained weights — the docker-compose analog
(docker-compose.yaml:4-35, scripts/{trainer,worker}_runscript.py)."""
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_up_topology_cold_shell():
    out = subprocess.run(
        [sys.executable, "-m", "drl_tetris_tpu", "up",
         "--workers", "1", "--updates", "1", "--steps", "128",
         "--n-envs", "4", "--horizon", "8",
         "--port", "6471", "--run-id", "uptest",
         "--set", "tower_layers=1", "tower_filters=8", "val_layers=1",
         "val_filters=8", "n_samples_each_update=64", "minibatch_size=16",
         "n_train_epochs_per_update=1"],
        capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "claimed slot worker-0" in out.stdout
    assert "trainer: update 1" in out.stdout
    assert "segment pushed" in out.stdout


def test_cli_parsers_wire_process_mode():
    """The subcommands exist and parse (cheap guard for argparse wiring)."""
    from drl_tetris_tpu.cli.main import main
    for cmd in ("worker", "trainer", "up", "kv"):
        with pytest.raises(SystemExit) as e:
            main([cmd, "--help"])
        assert e.value.code == 0
