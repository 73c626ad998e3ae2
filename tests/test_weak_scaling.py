"""Weak-scaling regression check on the virtual 8-device mesh (VERDICT r1
item 7; BASELINE.md: >=85% efficiency at 4 hosts).

Wall-clock cannot demonstrate parallel speedup on a shared-core CPU box
(all virtual devices run on the same cores), so the asserted proxy is the
compiled cost curve of the SPMD training step.  XLA's cost analysis counts
the shard_map region at its PER-SHARD size (measured, MULTICHIP_r04.json:
flops(2) == flops(8) exactly; see __graft_entry__._compiled_flops), so
under constant per-device work the compiled cost is FLAT for n >= 2 — the
1 -> 2 delta is the collectives appearing.  A sharding regression — an
accidental all-gather of env state, a replicated batch, a collective moved
into the per-tick loop — makes every device's program touch the global
batch, so the per-device cost grows with the mesh and flatness breaks."""
import jax
import pytest

import __graft_entry__ as graft
from drl_tetris_tpu.parallel.mesh import DistributedTrainer, make_mesh


@pytest.mark.slow
def test_weak_scaling_compiled_cost_flat():
    costs = {}
    for d in (2, 4, 8):
        tr = DistributedTrainer(graft._scaling_cfg(d), make_mesh(d))
        state, env_state = tr.init(jax.random.PRNGKey(0))
        costs[d] = graft._compiled_flops(tr, state, env_state)
    for d in (4, 8):
        eff = costs[2] / max(costs[d], 1.0)
        assert eff >= 0.85, (
            f"per-device compiled flops at {d} devices are {1/eff:.2f}x "
            f"the 2-device anchor: {costs}")
