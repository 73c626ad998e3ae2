"""The pluggable agent/trainer contract (the template agent).

Port of agents/template_agent/* (template_agent.py:23-50) — the documented
skeleton every agent family implements.  In the reference this is a pair of
classes holding mutable buffers and a TF session; here it is a pair of
protocols over pure functions + state pytrees, which every built-in family
satisfies:

  worker side (sventon_agent.py:56-169 analog):
    policy_fn(params, env_state, key) -> action fields + recorded internals
        (see drl_tetris_tpu/algos/rollout.py make_policy_fn)
    rollout(params, env_state, key) -> (env_state', Segment, bootstrap)
        (make_rollout_fn / make_dual_rollout_fn / make_sherlock_rollout)
    process(segment, bootstrap) -> training batch        (segment_to_batch)

  trainer side (sventon_agent_trainer_base.py:48-101 analog):
    init_fn(params) -> TrainState
    update_fn(state, batch_or_replay, key) -> (state', stats)
        (make_ppo_update / make_dqn_update / make_sherlock_update)
    weight export/import == the params pytree itself (orbax / msgpack)

To add a new agent family: provide those five callables and register a
preset naming them; the standalone trainers, distributed runners, mesh
program, and evaluation tournaments consume only this interface.
"""
from __future__ import annotations

from typing import Any, Callable, Protocol, Tuple


class PolicyFn(Protocol):
    def __call__(self, params: Any, env_state: Any, key: Any) -> Tuple: ...


class RolloutFn(Protocol):
    def __call__(self, params: Any, env_state: Any, key: Any
                 ) -> Tuple[Any, Any, Any]: ...


class ProcessFn(Protocol):
    def __call__(self, segment: Any, bootstrap: Any) -> Any: ...


class InitFn(Protocol):
    def __call__(self, params: Any) -> Any: ...


class UpdateFn(Protocol):
    def __call__(self, state: Any, data: Any, key: Any) -> Tuple[Any, dict]: ...
