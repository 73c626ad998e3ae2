"""Pallas whole-rollout engine kernel: T ticks with state resident in VMEM.

r3 MEASURED VERDICT (docs/NOTES_ROUND3.md): this kernel now compiles and
runs bit-exactly on real v5e hardware, but at ~391k env-steps/s
(1024 games, block_games=128) it is ~60x SLOWER than the XLA scan — the
r1 hypothesis that the scan was bound by the loop-carried state
round-tripping through HBM is refuted (state traffic is ~2% of HBM
bandwidth at the XLA path's rate; the tick is VPU-compute-bound, and
XLA's fusion already handles it well).  Mosaic additionally cannot build
blocks wider than 128 games here — r3 saw the compile helper OOM-killed;
the r4 retry on a 125 GB-RAM host had the block_games=512 compile exceed
a 15-minute budget (vs seconds at 128), so the kernel's theoretically
best shape (full 8x sublane packing on rank-1 state) is not practically
compilable — and its i1/layout constraints
force costlier op forms than XLA's (see engine/shifts.py, step._sel).
The kernel is retained as a hardware-validated correctness gate and a
worked example of the games-in-lanes layout; the XLA scan is the
production engine path.

This module runs the SAME per-game tick code (engine/step.py — shared,
not duplicated) inside one ``pl.pallas_call``:

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

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drl_tetris_tpu.engine import rng
from drl_tetris_tpu.engine import shifts
from drl_tetris_tpu.engine import step as S
from drl_tetris_tpu.env.env import EnvConfig, EnvState

I32 = jnp.int32


def _bsel(pred, a, b):
    """Batch-level where(pred, a, b): pred is (N,) games-in-lanes, leaves
    are (..., N).  The predicate broadcast happens right-aligned through
    int32 ((N,) -> (1, ..., 1, N) keeps the game batch in the lane dim —
    the only broadcast shape Mosaic can lower), and bool leaves select in
    int32 (Mosaic select over i1 vectors round-trips through an i8 it
    can't truncate back)."""
    if a is b:
        return a
    p = jnp.broadcast_to(jnp.asarray(pred, jnp.int32), jnp.shape(a)) != 0
    if jnp.result_type(a) == jnp.bool_:
        return jnp.where(p, jnp.asarray(a, jnp.int32),
                         jnp.asarray(b, jnp.int32)) != 0
    return jnp.where(p, a, b)


def env_step_batch(cfg: EnvConfig, eng, player, key, rounds, r, t,
                   games_minor: bool = True, bool_tree=None):
    """One full env tick over the whole game batch — the batched body of
    env.TetrisVectorEnv.step (env.py:96-133).  The per-game make/finish and
    reset subroutines are vmapped over the lane axis; the two FULL-STATE
    merges (freeze finished rounds; swap in resets) run at batch level so
    their scalar-per-game predicates broadcast right-aligned into rank-2
    leaves ((N,) -> (1,1,N)) instead of through vmap's front-batching,
    which Mosaic cannot lower.  Must stay semantically identical to the
    batch path; the equivalence test enforces it.

    bool_tree: EngineState-shaped pytree of Python bools marking which
    leaves are semantically boolean.  When given, ``eng`` carries those
    leaves as int32 and they are converted to bool PER GAME inside the
    vmapped subroutines: an i1 vector must never cross the vmap boundary —
    vmap's axis normalization emits `transpose`/minor-dim broadcasts on
    batched i1 values, which Mosaic cannot legalize (the r2 hardware
    failure after the concat fix was exactly a tpu.transpose on i1 from
    `_get` slicing a batched bool leaf)."""
    ax = -1 if games_minor else 0
    dt = I32(cfg.time_elapsed_each_action)

    def to_bools(e):
        if bool_tree is None:
            return e
        return jax.tree.map(lambda x, b: (x != 0) if b else x, e, bool_tree)

    def tick_core(e, p, rr, tt):
        use = jnp.arange(2) == p
        r2 = S._sel(use, rr, jnp.zeros_like(rr))   # arithmetic select in-kernel
        t2 = S._sel(use, tt, jnp.zeros_like(tt))
        return S.finish_phase(
            cfg.engine, S.make_phase_macro(cfg.engine, e, use, r2, t2),
            dt, None)

    # Bool outputs cross the vmap boundary as int32: reset() produces
    # trace-CONSTANT bool leaves (dead=False etc.) which out_axes must
    # broadcast over games, and Mosaic can't minor-dim-insert i1 vectors.
    def _bools_out(tree):
        return jax.tree.map(
            lambda x: jnp.asarray(x, jnp.int32)
            if jnp.result_type(x) == jnp.bool_ else x, tree)

    def _bools_back(tree, template):
        if bool_tree is not None:       # batch level stays int32 throughout
            return tree
        return jax.tree.map(
            lambda x, t: (x != 0) if jnp.result_type(t) == jnp.bool_ else x,
            tree, template)

    ro = eng.round_over
    stepped = _bools_back(
        jax.vmap(lambda e, p, rr, tt: _bools_out(
                     tick_core(to_bools(e), p, rr, tt)),
                 in_axes=ax, out_axes=ax)(eng, player, r, t), eng)
    eng = jax.tree.map(lambda a, b: _bsel(ro, a, b), eng, stepped)
    done = eng.round_over
    ks = jax.vmap(rng.split2, in_axes=ax, out_axes=ax)(key)
    if games_minor:
        key2, reset_key = ks[0], ks[1]
    else:
        key2, reset_key = ks[:, 0], ks[:, 1]
    eng_reset = _bools_back(
        jax.vmap(lambda e, k: _bools_out(S.reset(cfg.engine, to_bools(e), k)),
                 in_axes=ax, out_axes=ax)(eng, reset_key), eng)
    eng = jax.tree.map(lambda a, b: _bsel(done, b, a), eng, eng_reset)
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
    # Rank-1 (N,) leaves transfer as (1, N): with block_games < N, a
    # rank-1 operand's XLA layout tiles the FULL length while Mosaic
    # expects block-sized tiling ("XLA layout {0:T(1024)} does not match
    # Mosaic layout {0:T(128)}"); rank-2 blocks avoid the mismatch.  The
    # kernel strips/restores the leading singleton at the ref boundary.
    promoted = [x.ndim == 1 for x in ins]
    ins = [x[None, :] if p else x for x, p in zip(ins, promoted)]

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
    # Which engine leaves are semantically bool (carried as int32 in the
    # kernel; converted per game inside the vmapped subroutines)
    eng_bool_tree = jax.tree.map(
        lambda l: bool(l.dtype == jnp.bool_), state.engine)

    def kernel(*refs):
        in_refs = refs[:n_state]
        ex_refs = refs[n_state:n_state + len(extra_ins)]
        o_refs = refs[n_state + len(extra_ins):]

        # Loop carry AND batch level stay int32 for bool leaves: Mosaic
        # materializes loop-carried i1 vectors as i8 with no i8->i1
        # truncation, and batched i1 values hit unlegalizable transposes /
        # broadcasts in vmap axis bookkeeping.  Bools only exist as
        # temporaries inside the per-game subroutines (env_step_batch's
        # bool_tree conversion).
        def to_state(vals):
            return jax.tree_util.tree_unflatten(treedef, list(vals))

        def from_state(st):
            out, _ = jax.tree_util.tree_flatten(st)
            return [v.astype(jnp.int32) if b else v
                    for v, b in zip(out, bool_dtypes)]

        carry0 = [r[...][0] if p else r[...]
                  for r, p in zip(in_refs, promoted)]
        blk_id = pl.program_id(0).astype(jnp.uint32)

        def body(tick, carry):
            st = to_state(carry)
            eng, player, key, rounds = (st.engine, st.current_player,
                                        st.key, st.rounds_played)
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
            eng, player, key, rounds = env_step_batch(
                env_cfg, eng, player, key, rounds, rr, tt,
                bool_tree=eng_bool_tree)
            return from_state(EnvState(engine=eng, current_player=player,
                                       key=key, rounds_played=rounds))

        out_vals = jax.lax.fori_loop(
            0, n_ticks, lambda i, c: body(i, c), carry0)
        for o, v, p in zip(o_refs, out_vals, promoted):
            o[...] = v[None, :] if p else v

    # mxu_shifts: the engine's static H/CAP-axis shifts trace as constant
    # f32 matmuls instead of sliced-operand concats (engine/shifts.py —
    # Mosaic rejects tpu.concatenate with mismatched non-concat-dim
    # layout offsets, the BENCH_r02 hardware failure).  Rows must stay
    # within the f32-exact integer range for the matmul lowering.
    shifts.require_f32_exact(env_cfg.engine)
    with shifts.mxu_shifts():
        outs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=state_specs + extra_specs,
            out_shape=out_shapes,
            out_specs=out_specs,
            interpret=interpret,
            # the full state pipeline (45 in + 45 out blocks, double
            # buffered) plus matmul-shift temporaries exceeds the default
            # 16M scoped-vmem budget; the v5e has 128M VMEM per core
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            debug=bool(int(os.environ.get("PALLAS_TICK_DEBUG", "0"))),
        )(*ins, *extra_ins)

    outs = [o[0] if p else o for o, p in zip(outs, promoted)]
    outs = [jnp.moveaxis(o, -1, 0) for o in outs]
    outs = [o.astype(jnp.bool_) if b else o for o, b in zip(outs, bool_dtypes)]
    return jax.tree_util.tree_unflatten(treedef, outs)


def rollout_pallas(env_cfg: EnvConfig, state: EnvState, n_ticks: int, *,
                   base_key: Optional[jnp.ndarray] = None,
                   actions: Optional[tuple] = None,
                   block_games: int = 128,
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
