"""Pallas whole-rollout engine kernel: T ticks with state resident in VMEM.

The XLA tick (env.step under lax.scan) is VPU-bound at ~10% lane
efficiency; a large share of the per-tick cost is the loop-carried
EngineState pytree round-tripping through HBM at every scan iteration plus
the fragmentation of the tick into many small fused kernels.  This module
runs the SAME per-game tick code (engine/step.py — shared, not duplicated)
inside one ``pl.pallas_call``:

  * grid over blocks of games (games are independent; blocks pipeline),
  * every state leaf lives in VMEM for the whole T-tick ``fori_loop``,
  * games sit in the LANE dimension: each leaf is fed games-minor
    ((N, ...) -> (..., N)) and the tick is ``jax.vmap(step, in_axes=-1)``,
    so all intermediate arrays keep the game batch in lanes,
  * RNG is the raw-threefry helper set (engine/rng.py) — bit-exact with
    the jax.random calls of the XLA path, but lowerable by Mosaic.

Equivalence with the XLA path (env.TetrisVectorEnv.step) is asserted
bit-for-bit over every state leaf in tests/test_pallas_tick.py.

Reference scope: this accelerates the pure-engine rollout (the env-steps/s
headline, BASELINE.md config 1-2 — the reference's equivalent is the
C++ engine driven by tetris_environment_vector's Python loop,
tetris_environment_vector.py:9-191).  NN-in-the-loop rollouts interleave
device matmuls between ticks and keep using the XLA path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drl_tetris_tpu.engine import rng
from drl_tetris_tpu.engine import step as S
from drl_tetris_tpu.env.env import EnvConfig, EnvState

I32 = jnp.int32


def env_step_one(cfg: EnvConfig, eng, player, key, rounds, r, t):
    """One game's full env tick — the per-game body of
    env.TetrisVectorEnv.step (env.py:96-133), for vmapping over the lane
    axis inside the kernel.  Must stay semantically identical to the batch
    path; the equivalence test enforces it."""
    use = jnp.arange(2) == player
    r2 = jnp.where(use, r, 0)
    t2 = jnp.where(use, t, 0)
    dt = I32(cfg.time_elapsed_each_action)
    stepped = S.finish_phase(
        cfg.engine, S.make_phase_macro(cfg.engine, eng, use, r2, t2), dt, None)
    eng = jax.tree.map(
        lambda a, b: jnp.where(eng.round_over, a, b), eng, stepped)
    done = eng.round_over
    ks = rng.split2(key)
    key2, reset_key = ks[0], ks[1]
    eng_reset = S.reset(cfg.engine, eng, reset_key)
    eng = jax.tree.map(lambda a, b: jnp.where(done, b, a), eng, eng_reset)
    return eng, 1 - player, key2, rounds + done.astype(I32)


def _flatten_state(state: EnvState):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


@partial(jax.jit, static_argnames=("env_cfg", "n_ticks", "block_games",
                                   "interpret", "actions_given"))
def _rollout(env_cfg: EnvConfig, state: EnvState, n_ticks: int,
             base_key, actions_r, actions_t,
             block_games: int, interpret: bool, actions_given: bool
             ) -> EnvState:
    leaves, treedef = _flatten_state(state)
    n_games = state.current_player.shape[0]
    assert n_games % block_games == 0, (n_games, block_games)
    n_blocks = n_games // block_games

    bool_dtypes = [l.dtype == jnp.bool_ for l in leaves]
    # games-minor layout + bool->int32 (Mosaic can't store i1 vectors)
    ins = [jnp.moveaxis(l.astype(jnp.int32) if b else l, 0, -1)
           for l, b in zip(leaves, bool_dtypes)]

    def leaf_spec(x):
        blk = x.shape[:-1] + (block_games,)
        nlead = len(x.shape) - 1
        return pl.BlockSpec(
            blk, lambda i, _n=nlead: (0,) * _n + (i,),
            memory_space=pltpu.VMEM)

    state_specs = [leaf_spec(x) for x in ins]
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ins]
    out_specs = [leaf_spec(x) for x in ins]

    extra_ins = []
    extra_specs = []
    if actions_given:
        # (T, N) explicit actions, blocked over games (tests / replays)
        extra_ins += [actions_r, actions_t]
        extra_specs += [
            pl.BlockSpec((n_ticks, block_games), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(2)]
    else:
        # base key (1, 2) broadcast to every block; per-(tick, block)
        # subkeys decorrelate the random action streams
        extra_ins += [base_key.reshape(1, 2)]
        extra_specs += [
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    n_state = len(ins)
    width = env_cfg.engine.width

    def kernel(*refs):
        in_refs = refs[:n_state]
        ex_refs = refs[n_state:n_state + len(extra_ins)]
        o_refs = refs[n_state + len(extra_ins):]

        vals = [r[...] for r in in_refs]
        vals = [v != 0 if b else v for v, b in zip(vals, bool_dtypes)]
        st0 = jax.tree_util.tree_unflatten(treedef, vals)
        blk_id = pl.program_id(0).astype(jnp.uint32)

        step_b = jax.vmap(
            lambda e, p, k, ro, rr, tt: env_step_one(
                env_cfg, e, p, k, ro, rr, tt),
            in_axes=-1, out_axes=-1)

        def body(tick, carry):
            eng, player, key, rounds = carry
            if actions_given:
                rr = ex_refs[0][pl.ds(tick, 1), :][0]
                tt = ex_refs[1][pl.ds(tick, 1), :][0]
            else:
                bk = ex_refs[0][0]
                tk = rng.fold_in(rng.fold_in(bk, tick.astype(jnp.uint32)),
                                 blk_id)
                bits = rng.random_bits(tk, (block_games,))
                rr = (bits % jnp.uint32(4)).astype(I32)
                tt = ((bits >> jnp.uint32(16)) % jnp.uint32(width)).astype(I32)
            return step_b(eng, player, key, rounds, rr, tt)

        st = jax.lax.fori_loop(
            0, n_ticks,
            lambda i, c: body(i, c),
            (st0.engine, st0.current_player, st0.key, st0.rounds_played))
        final = EnvState(engine=st[0], current_player=st[1], key=st[2],
                         rounds_played=st[3])
        out_vals, _ = jax.tree_util.tree_flatten(final)
        for o, v, b in zip(o_refs, out_vals, bool_dtypes):
            o[...] = v.astype(jnp.int32) if b else v

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=state_specs + extra_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(*ins, *extra_ins)

    outs = [jnp.moveaxis(o, -1, 0) for o in outs]
    outs = [o.astype(jnp.bool_) if b else o for o, b in zip(outs, bool_dtypes)]
    return jax.tree_util.tree_unflatten(treedef, outs)


def rollout_pallas(env_cfg: EnvConfig, state: EnvState, n_ticks: int, *,
                   base_key: Optional[jnp.ndarray] = None,
                   actions: Optional[tuple] = None,
                   block_games: int = 1024,
                   interpret: bool = False) -> EnvState:
    """Advance every game ``n_ticks`` macro-ticks inside one Pallas kernel.

    Either ``actions=(r, t)`` with two (T, N) int32 arrays (explicit action
    replay — the equivalence tests drive both paths with the same arrays),
    or ``base_key`` (2,) uint32 for in-kernel uniform-random actions (the
    throughput benchmark's random policy).
    """
    n_games = state.current_player.shape[0]
    block_games = min(block_games, n_games)
    if actions is not None:
        ar, at = actions
        return _rollout(env_cfg, state, n_ticks, jnp.zeros((2,), jnp.uint32),
                        ar.astype(I32), at.astype(I32), block_games,
                        interpret, True)
    assert base_key is not None
    dummy = jnp.zeros((1, 1), I32)
    return _rollout(env_cfg, state, n_ticks, base_key.astype(jnp.uint32),
                    dummy, dummy, block_games, interpret, False)
