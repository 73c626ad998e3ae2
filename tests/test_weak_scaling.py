"""Weak-scaling regression check on the virtual 8-device mesh (VERDICT r1
item 7; BASELINE.md: >=85% efficiency at 4 hosts).

Wall-clock cannot demonstrate parallel speedup on a shared-core CPU box
(all virtual devices run on the same cores), so the asserted proxy is the
compiled per-device SPMD program cost: with per-device work held constant,
per-device FLOPs must not grow with the mesh — a sharding regression (an
accidental all-gather of env state, a replicated batch, a collective moved
into the per-tick loop) shows up as per-device cost scaling with N."""
import jax
import pytest

import __graft_entry__ as graft
from drl_tetris_tpu.parallel.mesh import DistributedTrainer, make_mesh


@pytest.mark.slow
def test_weak_scaling_per_device_cost_constant():
    costs = {}
    for d in (1, 2, 4, 8):
        tr = DistributedTrainer(graft._scaling_cfg(d), make_mesh(d))
        state, env_state = tr.init(jax.random.PRNGKey(0))
        costs[d] = graft._per_device_cost(tr, state, env_state)
    base = costs[1]
    for d in (2, 4, 8):
        eff = base / max(costs[d], 1.0)
        assert eff >= 0.85, (
            f"per-device flops grew {1/eff:.2f}x at {d} devices: {costs}")
