"""Weak-scaling regression check on the virtual 8-device mesh (VERDICT r1
item 7; BASELINE.md: >=85% efficiency at 4 hosts).

Wall-clock cannot demonstrate parallel speedup on a shared-core CPU box
(all virtual devices run on the same cores), so the asserted proxy is the
compiled cost curve of the SPMD training step.  XLA's cost analysis counts
sharded-region ops at their GLOBAL size and replicated-region ops once
(measured; see __graft_entry__._compiled_flops), so under constant
per-device work the total is AFFINE in the device count.  A sharding
regression — an accidental all-gather of env state, a replicated batch, a
collective moved into the per-tick loop — makes every device touch the
global batch and adds an O(N^2) term, breaking linearity."""
import jax
import pytest

import __graft_entry__ as graft
from drl_tetris_tpu.parallel.mesh import DistributedTrainer, make_mesh


@pytest.mark.slow
def test_weak_scaling_compiled_cost_linear():
    costs = {}
    for d in (1, 2, 4, 8):
        tr = DistributedTrainer(graft._scaling_cfg(d), make_mesh(d))
        state, env_state = tr.init(jax.random.PRNGKey(0))
        costs[d] = graft._compiled_flops(tr, state, env_state)
    sharded_per_dev = costs[2] - costs[1]
    assert sharded_per_dev >= 0, costs
    for d in (4, 8):
        predicted = costs[1] + sharded_per_dev * (d - 1)
        eff = predicted / max(costs[d], 1.0)
        assert eff >= 0.85, (
            f"compiled flops at {d} devices are {1/eff:.2f}x the linear "
            f"extrapolation from 1-2 devices: {costs}")
