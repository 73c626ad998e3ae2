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


@pytest.mark.slow
def test_train_experiment_schedule(tmp_path):
    """`train --experiment lr_sweep` produces one run per cumulative patch
    with distinct run-ids (trainer_runscript.py:19-23 semantics)."""
    out = subprocess.run(
        [sys.executable, "-m", "drl_tetris_tpu", "train",
         "--experiment", "lr_sweep", "--platform", "cpu",
         "--steps", "16", "--n-envs", "2", "--horizon", "8",
         "--save-every", "1", "--data-dir", str(tmp_path),
         "--set", "tower_layers=1", "tower_filters=4", "val_layers=1",
         "val_filters=4", "minibatch_size=8",
         "n_train_epochs_per_update=1", "compute_dtype=float32"],
        capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    runs = sorted(p.name for p in (tmp_path / "models").iterdir())
    assert runs == ["lr_sweep", "lr_sweep-patch1", "lr_sweep-patch2"], runs


@pytest.mark.slow
def test_up_topology_dqn_flavour():
    """Process mode is not PPO-only: `up --set flavour=dqn` trains DQN
    end-to-end through the same worker/trainer runscripts (the reference
    runs any agent class through them)."""
    out = subprocess.run(
        [sys.executable, "-m", "drl_tetris_tpu", "up",
         "--workers", "1", "--updates", "1", "--steps", "256",
         "--n-envs", "4", "--horizon", "8",
         "--port", "6473", "--run-id", "uptest-dqn",
         "--set", "flavour=dqn", "tower_layers=1", "tower_filters=8",
         "val_layers=1", "val_filters=8", "n_samples_each_update=64",
         "minibatch_size=16", "n_train_epochs_per_update=1",
         "n_step_value_estimates=3", "experience_replay_size=4096"],
        capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "claimed slot worker-0" in out.stdout
    assert "trainer: update 1" in out.stdout


@pytest.mark.slow
def test_multihost_two_process_cpu_smoke(tmp_path):
    """`train --multihost` with a 2-process jax.distributed CPU cluster:
    init wires the global mesh (gloo collectives) and one distributed
    train iteration completes on both ranks (r2 VERDICT item 5)."""
    import os
    # the pytest process's XLA_FLAGS carry the 8-device virtual-mesh flag
    # (conftest.py); each rank must contribute exactly ONE cpu device
    env = {**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    procs = []
    for i in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "drl_tetris_tpu", "train",
             "--multihost", "--num-hosts", "2", "--host-id", str(i),
             "--coordinator", "127.0.0.1:9807", "--platform", "cpu",
             "--steps", "32", "--n-envs", "4", "--horizon", "8",
             "--save-every", "1000000", "--data-dir",
             str(tmp_path / f"h{i}"), "--run-id", "mh",
             "--set", "tower_layers=1", "tower_filters=4", "val_layers=1",
             "val_filters=4", "minibatch_size=8",
             "n_train_epochs_per_update=1", "compute_dtype=float32"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env))
    # the sharded train-step compile takes minutes on this 2-CPU box
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i}:\n{out[-2000:]}"
        assert "32 steps" in out, f"rank {i} never finished an iteration"


@pytest.mark.slow
def test_up_topology_dual_policy():
    """`up --set single_policy=false` runs the dual-policy flavour through
    the same worker/trainer runscripts (worker.py:157-192): both policies'
    batches ship, the trainer trains behind the win-rate gate, and the
    published weights are a (policy_0, policy_1) pair (r3 VERDICT item 6)."""
    out = subprocess.run(
        [sys.executable, "-m", "drl_tetris_tpu", "up",
         "--workers", "1", "--updates", "1", "--steps", "128",
         "--n-envs", "4", "--horizon", "8",
         "--port", "6477", "--run-id", "uptest-dual",
         "--set", "single_policy=false", "tower_layers=1",
         "tower_filters=8", "val_layers=1", "val_filters=8",
         "n_samples_each_update=32", "minibatch_size=16",
         "n_train_epochs_per_update=1"],
        capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "claimed slot worker-0" in out.stdout
    assert "trainer: update 1" in out.stdout


@pytest.mark.slow
def test_train_resume_continues_run(tmp_path):
    """`train --resume` restores the FULL train state from the run's own
    latest checkpoint and continues the step count (crash/preemption
    recovery for standalone runs; the league pool is re-seeded from saved
    snapshots)."""
    base = [sys.executable, "-m", "drl_tetris_tpu", "train",
            "--run-id", "resume_t", "--platform", "cpu",
            "--n-envs", "2", "--horizon", "8",
            "--save-every", "1", "--data-dir", str(tmp_path),
            "--set", "tower_layers=1", "tower_filters=4", "val_layers=1",
            "val_filters=4", "minibatch_size=8",
            "n_train_epochs_per_update=1", "compute_dtype=float32"]
    out = subprocess.run(base + ["--steps", "16"],
                         capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    ck = tmp_path / "models" / "resume_t"
    first_steps = sorted(int(p.name) for p in ck.iterdir() if p.name.isdigit())
    assert first_steps and first_steps[-1] == 16

    out = subprocess.run(base + ["--steps", "32", "--resume"],
                         capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "[resume] restored" in out.stdout
    later = sorted(int(p.name) for p in ck.iterdir() if p.name.isdigit())
    assert later[-1] == 32, later
