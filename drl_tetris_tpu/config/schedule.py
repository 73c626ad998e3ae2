"""Experiment scheduling: presets + patches -> a sequence of runs.

Port of tools/experiment_schedule.py:3-40: an experiment is a base settings
dict plus a list of patches applied CUMULATIVELY (the null patch first, so
the unpatched base runs too, :13); each yielded item is a fully resolved
FrameworkConfig.  Experiments here are data (a preset list + override
dicts), not exec'd Python files (experiment_schedule.py:22-31 — the
reference executes experiment files with ``exec``)."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, List, Optional, Sequence

from drl_tetris_tpu.config.presets import FrameworkConfig, merge_settings, resolve


@dataclasses.dataclass(frozen=True)
class Experiment:
    name: str
    presets: Sequence[str] = ("default", "sventon", "sventon_ppo",
                              "resblock", "experiment_sventon_ppo")
    overrides: Dict[str, Any] = dataclasses.field(default_factory=dict)
    patches: Sequence[Dict[str, Any]] = ()


def experiment_schedule(experiments: Sequence[Experiment],
                        only_last: bool = False,
                        overrides: Optional[Dict[str, Any]] = None
                        ) -> Iterator[FrameworkConfig]:
    """Yield one resolved config per (experiment, cumulative patch), with
    the null patch first (experiment_schedule.py:10-21); ``only_last`` and
    CLI ``overrides`` match trainer_runscript.py:19-23."""
    items: List[FrameworkConfig] = []
    for exp in experiments:
        cumulative: Dict[str, Any] = {}
        for i, patch in enumerate(({},) + tuple(exp.patches)):
            cumulative.update(patch)
            s = merge_settings(exp.presets, exp.overrides, cumulative,
                               overrides or {})
            run_id = exp.name if i == 0 else f"{exp.name}-patch{i}"
            items.append(resolve(s, run_id=run_id))
    if only_last and items:
        items = items[-1:]
    yield from items
