"""Checkpoint / resume with recovery validation.

The reference persists (1) numbered weight pickles
(models/<run-id>/weights{N,LATEST,FINAL}.w + a settings side-file,
sventon_agent_base.py:116-129, tools/utils.py:74-86; numbered every 250
publishes, trainer.py:113-123) and (2) a dill'd [env, agent] blob in Redis,
with (3) an md5 checksum proving a restored worker reproduces bit-identical
NN outputs (runner.py:61-120, worker.py:58-69).

Here all three collapse into orbax checkpoints of explicit pytrees
(params / opt state / env state / PRNG keys are all just arrays) plus the
same checksum validation, which becomes trivial because the whole system is
deterministic given its state.
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

NUMBERED_EVERY = 250  # trainer.py:113-123 save cadence


def _mgr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=None),
    )


def _enc(v):
    """Settings value -> JSON.  Dataclasses (CompressorConfig, Parameter
    schedules) round-trip through a __kind__ tag; the reference instead
    pickles live objects next to the weights (sventon_agent_base.py:128-129,
    self-criticized README.md:91)."""
    import dataclasses
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return {"__kind__": type(v).__name__,
                **{k: _enc(x) for k, x in dataclasses.asdict(v).items()}}
    if isinstance(v, (tuple, list)):
        return [_enc(x) for x in v]
    if isinstance(v, dict):
        return {k: _enc(x) for k, x in v.items()}
    if isinstance(v, (bool, int, float, str)) or v is None:
        return v
    return {"__repr__": repr(v)}


def _dec(v):
    if isinstance(v, dict) and "__kind__" in v:
        kind = v.pop("__kind__")
        from drl_tetris_tpu.config import parameter as P
        from drl_tetris_tpu.algos.ppo import CompressorConfig
        registry = {"Parameter": P.Parameter,
                    "LinearParameter": P.LinearParameter,
                    "ExpParameter": P.ExpParameter,
                    "CompressorConfig": CompressorConfig}
        cls = registry.get(kind)
        return cls(**{k: _dec(x) for k, x in v.items()}) if cls else v
    if isinstance(v, dict):
        return {k: _dec(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_dec(x) for x in v]
    return v


def save(directory: str, step: int, state: Any,
         settings: Optional[dict] = None) -> None:
    """Save a checkpoint; also drops the run settings side-file next to the
    weights like the reference does (sventon_agent_base.py:128-129)."""
    os.makedirs(directory, exist_ok=True)
    with _mgr(directory) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    if settings is not None:
        with open(os.path.join(directory, "settings.json"), "w") as f:
            json.dump({k: _enc(v) for k, v in settings.items()}, f, indent=1)


def load_settings(checkpoint_path: str) -> Optional[dict]:
    """Find the settings side-file for a checkpoint path (the run dir or a
    step dir inside it) — tools/utils.py:47-52 weight->settings pairing."""
    p = os.path.abspath(checkpoint_path.rstrip("/"))
    for d in (p, os.path.dirname(p)):
        sp = os.path.join(d, "settings.json")
        if os.path.exists(sp):
            with open(sp) as f:
                return {k: _dec(v) for k, v in json.load(f).items()}
    return None


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    with _mgr(directory) as mgr:
        return mgr.latest_step()


def restore(directory: str, target: Any, step: Optional[int] = None) -> Any:
    with _mgr(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
        return mgr.restore(step, args=ocp.args.StandardRestore(target))


def restore_raw(directory: str, step: Optional[int] = None) -> Any:
    """Restore without a target pytree: nested dicts of numpy arrays.  Lets
    eval load any flavour's checkpoint without rebuilding its optimizer
    state (the reference's eval likewise reads only the weight arrays,
    eval.py:99-139)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
    # Address the pytree item directly and restore every leaf as host
    # numpy, so saved device shardings are ignored (a TPU-written
    # checkpoint must open on CPU and vice versa).
    path = os.path.join(os.path.abspath(directory), str(step), "default")
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path)
        for attr in ("item_metadata", "tree"):
            if hasattr(meta, attr):
                meta = getattr(meta, attr)
        tree = meta
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def pytree_checksum(tree: Any) -> str:
    """md5 over every leaf's bytes — the recovery-validation artifact
    (runner.py:119-120 md5-of-dill, exact here because state is explicit)."""
    h = hashlib.md5()
    for leaf in jax.tree.leaves(tree):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def validate_recovery(compute_fn, restored_state, expected_checksum: str):
    """runner.validate_runner (runner.py:90-104): recompute the recorded
    computation from the restored state and require a bit-identical result."""
    out = compute_fn(restored_state)
    got = pytree_checksum(out)
    if got != expected_checksum:
        raise RuntimeError(
            f"recovery validation failed: checksum {got} != {expected_checksum}")
    return True
