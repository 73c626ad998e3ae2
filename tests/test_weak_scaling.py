"""Weak-scaling regression check on the virtual 8-device mesh (VERDICT r1
item 7; BASELINE.md: >=85% efficiency at 4 hosts).

Wall-clock cannot demonstrate parallel speedup on a shared-core CPU box
(all virtual devices run on the same cores), so the asserted proxy is the
compiled cost curve of the SPMD training step.  XLA's accounting of the
shard_map region is VERSION-DEPENDENT — the r4 image counted it at
per-shard size (flops(2) == flops(8) exactly, MULTICHIP_r04.json), jax
0.8 counts it at global logical size (flops(n) = 134.3M + 39.8M*n fits
measured 1/2/8 exactly) — so the null is calibrated from the 1- and
2-device anchors (see __graft_entry__.dryrun_multichip).  Under either
accounting, a sharding regression — an accidental all-gather of env
state, a replicated batch, a collective moved into the per-tick loop —
makes every device's program touch the global batch and blows past the
anchor-calibrated prediction."""
import jax
import pytest

import __graft_entry__ as graft
from drl_tetris_tpu.parallel.mesh import DistributedTrainer, make_mesh


@pytest.mark.slow
def test_weak_scaling_compiled_cost_matches_calibrated_null():
    costs = {}
    for d in (1, 2, 4, 8):
        tr = DistributedTrainer(graft._scaling_cfg(d), make_mesh(d))
        state, env_state = tr.init(jax.random.PRNGKey(0))
        costs[d] = graft._compiled_flops(tr, state, env_state)
    slope = max(costs[2] - costs[1], 0.0)
    for d in (4, 8):
        predicted = costs[2] + (d - 2) * slope
        eff = predicted / max(costs[d], 1.0)
        assert eff >= 0.85, (
            f"compiled flops at {d} devices are {1/eff:.2f}x the "
            f"anchor-calibrated prediction: {costs}")
