"""Action-selection distributions over the (rotation, translation) plane.

Ports agents/sventon_agent/sventon_utils.py:15-65 to batched jax.  Each
function takes A: (N, R, T) scores for the acting piece and returns
((r, t), entropy) index arrays of shape (N,).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unravel(idx, R, T):
    return idx // T, idx % T


def action_argmax(A):
    N, R, T = A.shape
    idx = jnp.argmax(A.reshape(N, -1), axis=-1)
    return _unravel(idx, R, T), jnp.zeros((N,), jnp.float32)


def action_distribution(A, key):
    """Sample (r, t) ~ A (A is a probability map, e.g. the PPO policy)."""
    N, R, T = A.shape
    p = A.reshape(N, -1)
    logp = jnp.log(jnp.maximum(p, 1e-20))
    idx = jax.random.categorical(key, logp, axis=-1)
    ent = -jnp.sum(p * jnp.log(p + 1e-6), axis=-1)
    return _unravel(idx, R, T), ent


def action_epsilongreedy(A, key, epsilon):
    N, R, T = A.shape
    ku, kr, kt = jax.random.split(key, 3)
    greedy_idx = jnp.argmax(A.reshape(N, -1), axis=-1)
    rand_r = jax.random.randint(kr, (N,), 0, R)
    rand_t = jax.random.randint(kt, (N,), 0, T)
    explore = jax.random.uniform(ku, (N,)) < epsilon
    gr, gt = _unravel(greedy_idx, R, T)
    r = jnp.where(explore, rand_r, gr)
    t = jnp.where(explore, rand_t, gt)
    e = jnp.minimum(1.0, epsilon)
    n = R * T
    p = jnp.full((n,), e / n).at[0].add(1 - e)
    ent = jnp.full((N,), -jnp.sum(p * jnp.log(p + 1e-12)))
    return (r, t), ent


def pareto(x, temperature):
    """tools/utils.py:88-91: rank-based distribution p ~ 1/rank^theta."""
    order = jnp.argsort(-x, axis=-1)
    ranks = jnp.empty_like(order).at[order].set(jnp.arange(x.shape[-1]) + 1)
    p = 1.0 / ranks.astype(jnp.float32) ** temperature
    return p / jnp.sum(p, axis=-1, keepdims=True)


def action_pareto(A, key, temperature):
    N, R, T = A.shape
    x = A.reshape(N, -1)
    p = jax.vmap(lambda v: pareto(v, temperature))(x)
    idx = jax.random.categorical(key, jnp.log(p), axis=-1)
    ent = -jnp.sum(p * jnp.log(p + 1e-12), axis=-1)
    return _unravel(idx, R, T), ent
