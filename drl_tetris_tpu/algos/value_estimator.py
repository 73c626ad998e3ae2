"""k-step / TD(lambda) target machinery.

Port of agents/networks/value_estimator.py:4-103 — the reference's
placeholder-driven k-step estimator graph — to a jitted function over
sampled replay windows:

  done_time = number of not-yet-done steps in the window (cumsum mask,
              value_estimator.py:52-53)
  e_k       = sum_{t<k} r_t [done_time >= t] gamma^t
              + V_ref(s_k) [done_time >= k] gamma^k        (:69-76)
  target    = sum_k e_k lam_k^k / sum_k lam_k^k            (:80-88)
  lam_k     = lambda * [done_time >= k-1]  if truncate_aggregation

with gamma sign-flipped for single-policy self-play and the optional sparse
step filter (steps not divisible by any filter entry, :90-99).
V_ref(s_k) is the reference net's piece-mean value (:63-64).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.env.observations import field_grid


def create_steps(k: int, filt: Optional[Sequence[int]] = None) -> Tuple[int, ...]:
    """value_estimator._create_steps (:90-99)."""
    steps = list(range(1, k + 1))
    if filt:
        f = np.asarray(filt).reshape(1, -1)
        s = np.asarray(steps).reshape(-1, 1)
        keep = np.prod(s % f, axis=1) != 0
        steps = s[np.where(keep)].ravel().tolist()
    return tuple(int(s) for s in steps)


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    k_step: int = 5
    gamma: float = 0.98              # pre-sign-flip
    lam: float = 0.95                # tau/lambda aggregation weight
    single_policy: bool = True
    truncate_aggregation: bool = True
    step_filter: Tuple[int, ...] = ()

    @property
    def steps(self) -> Tuple[int, ...]:
        return create_steps(self.k_step, self.step_filter or None)

    @property
    def effective_gamma(self) -> float:
        return -self.gamma if self.single_policy else self.gamma


def kstep_targets(engine_cfg: EngineConfig, ref_net, cfg: EstimatorConfig,
                  ref_params, windows):
    """Pure k-step/TD(lambda) target computation — (n,) float32,
    stop-gradiented (value_estimator.py:100-103).

    windows: occ (n, k+1, 2, H), vec (n, k+1, 2, 12), reward (n, k+1),
    done (n, k+1).  Callable from inside any jitted update (the PPO
    trainer-computes-targets loss calls it per minibatch)."""
    steps = cfg.steps
    gamma = cfg.effective_gamma

    def v_ref(params, occ_t, vec_t):
        grids = field_grid(engine_cfg, occ_t)                 # (n, 2, H, W)
        vis = [grids[:, 0, :, :, None], grids[:, 1, :, :, None]]
        vec = [vec_t[:, 0, :], vec_t[:, 1, :]]
        out = ref_net.apply(params, vec, vis)
        # (Q,V,A) -> V; (pi,v) -> v; a bare array (VNet) IS the value
        v = out if isinstance(out, jnp.ndarray) else out[1]
        if v.ndim == 2 and v.shape[-1] > 1:
            v = jnp.mean(v, axis=-1, keepdims=True)           # piece-mean
        return v.reshape(-1)                                  # (n,)

    r = windows["reward"]                                     # (n, k+1)
    d = windows["done"]
    dmask = jnp.minimum(1, jnp.cumsum(d, axis=1))
    done_time = jnp.sum(1 - dmask, axis=1).astype(jnp.float32)    # (n,)

    est_sum = 0.0
    weight = 0.0
    for k in steps:
        e = jnp.zeros_like(done_time)
        for t in range(k):
            e = e + r[:, t] * (done_time >= t) * (gamma ** t)
        vk = v_ref(ref_params, windows["occ"][:, k], windows["vec"][:, k])
        e = e + vk * (done_time >= k) * (gamma ** k)
        lam_k = (cfg.lam * (done_time >= k - 1)
                 if cfg.truncate_aggregation else
                 jnp.full_like(done_time, cfg.lam))
        est_sum = est_sum + e * lam_k ** k
        weight = weight + lam_k ** k
    return jax.lax.stop_gradient(est_sum / weight)


def make_target_fn(engine_cfg: EngineConfig, ref_net, cfg: EstimatorConfig):
    """Returns jitted targets(ref_params, windows) -> (n,) float32."""

    @jax.jit
    def targets(ref_params, windows):
        return kstep_targets(engine_cfg, ref_net, cfg, ref_params, windows)

    return targets
