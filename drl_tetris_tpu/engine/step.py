"""Game-step state machine: macro actions, key actions, finish/delay phases.

This reproduces, tick for tick, the semantics of the reference backend's
PythonHandle::make_actions / finish_actions (PythonHandle.cpp:138-188) and
GamePlay's subsystems:

  hd/hd_make/hd_finish      gamePlay.cpp:38-59
  mDown + drop-delay        gamePlay.cpp:61-69, DropDelay.cpp
  delayCheck                gamePlay.cpp:90-114   (the per-tick state machine)
  sendLines                 gamePlay.cpp:160-171
  combo                     Combo.cpp
  garbage queue             Garbage.cpp
  garbage push / death      gamePlay.cpp:179-204
  adaptive piece bag        randomizer.cpp:10-32
  round restart / seeding   gamePlay.cpp:206-230, PythonHandle.cpp:49-71

Everything operates on a single game (one EngineState); vectorization over
games is a plain ``jax.vmap``.  Per-player subroutines take/return a
"player view" — a PlayerState whose fields are scalars/(H,) rows for ONE
player, extracted with ``jax.tree.map(lambda a: a[i], players)``.

Hot-path discipline (this file is the per-tick inner loop of a 4096-game
batch): no lax.scan/fori, no gathers/scatters — bag draws are unrolled
7-step chains, the garbage FIFO keeps its front at slot 0 so all front
accesses are static, round seeding (the reference's S/Z reroll loop,
gamePlay.cpp:223-228) is evaluated in closed form over precomputed draw
candidates, and the current piece's row masks are cached in the state.

RNG: the reference seeds mt19937 from wall-clock (PythonHandle.cpp:68-71,
irreproducible by design).  Here each player carries explicit PRNG keys and
draw counters.  For bit-exact parity against the C++ oracle, ``RngTables``
(host-precomputed mt19937 uniform streams, see tests/oracle_rng.py) can be
injected; the engine then reads table[counter] instead of hashing the key.

Known float caveats vs C++ (documented, tested to not matter on parity
horizons): the bag's ``adjust /= 6.0`` and the combo payout ``pow`` are
float32 here but double-rounded-to-float in C++ (<=1 ulp).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from drl_tetris_tpu.engine.core import (
    EngineConfig, EngineState, PlayerState, zeros_player_state,
)
from drl_tetris_tpu.engine import kernels as K
from drl_tetris_tpu.engine import rng
from drl_tetris_tpu.engine import shifts
from drl_tetris_tpu.engine.pieces import SPAWN_ROT as _SPAWN_ROT_NP

I32 = jnp.int32
F32 = jnp.float32


class RngTables(NamedTuple):
    """Injected per-round uniform streams (both players share one stream per
    kind, exactly like the reference seeding both players identically,
    PythonHandle.cpp:68-71)."""
    piece: jnp.ndarray  # (T,) float32
    hole: jnp.ndarray   # (T,) float32


def _sel(pred, a, b):
    """where(pred, a, b) with two Mosaic accommodations (XLA path fuses
    both away — measured neutral):

    * BOOL leaves route through int32: Mosaic lowers select_n over i1
      vectors via an i8 mask it can't truncate back.
    * Inside the Pallas rollout kernel (shifts.mxu_shifts scope) the
      select is ARITHMETIC — bitwise mask-blend for ints, exact 0/1 lerp
      for floats — so the i1 predicate is consumed by a convert at birth
      and never broadcast/moved: vmap's axis bookkeeping otherwise emits
      `tpu.transpose` / minor-dim broadcasts on i1 vectors whenever the
      predicate's batch position differs from the operands', and Mosaic
      cannot legalize those (the r2->r3 hardware failures)."""
    if shifts.in_mxu_mode():
        dt = jnp.result_type(a)
        p = jnp.asarray(pred, jnp.int32)
        if dt == jnp.bool_:
            a32, b32 = jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)
            return (b32 ^ ((a32 ^ b32) & -p)) != 0
        if jnp.issubdtype(dt, jnp.integer):
            mask = jnp.asarray(-p, dt)      # 0 or all-ones, any int width
            return b ^ ((a ^ b) & mask)
        # float32: blend the BIT PATTERNS through an int32 view — exact by
        # construction (an arithmetic a*p + b*(1-p) lerp drifted cogp in
        # the equivalence test).  Mosaic's bitcast is vector-only, so
        # rank-0 results use the plain scalar select (scalars live in
        # sregs; the i1 lowering gaps are vector-only).
        assert dt == jnp.float32, dt
        shape = jnp.broadcast_shapes(jnp.shape(pred), jnp.shape(a),
                                     jnp.shape(b))
        if shape == ():
            return jnp.where(pred, a, b)
        af = jnp.broadcast_to(jnp.asarray(a, dt), shape)
        bf = jnp.broadcast_to(jnp.asarray(b, dt), shape)
        ai = jax.lax.bitcast_convert_type(af, jnp.int32)
        bi = jax.lax.bitcast_convert_type(bf, jnp.int32)
        out = bi ^ ((ai ^ bi) & jnp.broadcast_to(-p, shape))
        return jax.lax.bitcast_convert_type(out, dt)
    if jnp.result_type(a) == jnp.bool_:
        return jnp.where(pred, jnp.asarray(a, jnp.int32),
                         jnp.asarray(b, jnp.int32)) != 0
    return jnp.where(pred, a, b)


def _merge(pred, a_tree, b_tree):
    """_sel(pred, a, b) per leaf, skipping leaves that are the SAME object
    in both trees.  Functional updates via .replace() keep untouched fields
    identical, so a branch that mutates 6 of the ~40 PlayerState leaves
    costs 6 selects instead of 40 — a large share of the tick is these
    merges."""
    return jax.tree.map(
        lambda a, b: a if a is b else _sel(pred, a, b), a_tree, b_tree)


def _merge3(pred_c, pred_b, a_tree, b_tree, c_tree):
    """c where pred_c, else b where pred_b, else a — identity-skipping.
    REQUIRES pred_c => pred_b (true at the lockdown call site: the hard
    drop only happens when the lockdown fired), so the merge nests as
    where(pred_b, where(pred_c, c, b), a) and leaves c shares with b cost
    nothing."""
    def f(a, b, c):
        inner = b if b is c else _sel(pred_c, c, b)
        return a if inner is a else _sel(pred_b, inner, a)
    return jax.tree.map(f, a_tree, b_tree, c_tree)


def _uniform(key, counter, table):
    if table is None:
        # == jax.random.uniform(jax.random.fold_in(key, counter), f32) bit
        # for bit, but built on the raw threefry primitive so the same code
        # lowers inside the Pallas whole-rollout kernel (see rng.py).
        return rng.uniform01(rng.fold_in(key, counter.astype(jnp.uint32)))
    return table[jnp.clip(counter, 0, table.shape[0] - 1)]


def _prefix_sum(x):
    """Inclusive prefix sum over a small leading axis (jnp.cumsum has no
    Mosaic lowering; engine/shifts.py lowers Hillis-Steele shift-adds
    under XLA, one MXU matmul inside the Pallas rollout kernel)."""
    return shifts.prefix_sum(x)


def _select7(idx, values):
    """out = values[idx] for a static 7-tuple, as unrolled selects."""
    out = jnp.full_like(idx, values[0])
    for k in range(1, 7):
        out = _sel(idx == k, values[k], out)
    return out


def _spawn_rot(piece):
    return _select7(piece, tuple(int(x) for x in _SPAWN_ROT_NP))


# ---------------------------------------------------------------------------
# Randomizer (randomizer.cpp)
# ---------------------------------------------------------------------------

_COGP_FRESH = float(1000 // 7)  # integer division in the reference!


def _choose_from_bag(cogp, u):
    """getPiece's selection loop (randomizer.cpp:12-19): sequential weight
    subtraction, first negative wins, default 0.  Unrolled, exact float
    order."""
    rem = u * F32(1000)
    chosen = I32(0)
    found = jnp.bool_(False)
    for i in range(7):
        rem2 = rem - cogp[i]
        hit = (~found) & (rem2 < 0)
        chosen = _sel(hit, i, chosen)
        found = found | hit
        rem = _sel(found, rem, rem2)
    return chosen


def _bag_update(cogp, chosen):
    """getPiece's weight shift (randomizer.cpp:23-29)."""
    cval = jnp.sum(_sel(jnp.arange(7) == chosen, cogp, 0.0))
    adjust = (cval / F32(4)) * F32(3)
    spread = adjust / F32(6)
    return _sel(jnp.arange(7) == chosen, cogp - adjust, cogp + spread)


def _draw_piece(v: PlayerState, tables):
    u = _uniform(v.piece_key, v.piece_draws, None if tables is None else tables.piece)
    chosen = _choose_from_bag(v.cogp, u)
    return v.replace(cogp=_bag_update(v.cogp, chosen),
                     piece_draws=v.piece_draws + 1), chosen


def _draw_hole(v: PlayerState, cfg: EngineConfig, tables):
    """randomizer::getHole(noStack=false) (randomizer.cpp:38-45)."""
    u = _uniform(v.hole_key, v.hole_draws, None if tables is None else tables.hole)
    hole = (u * F32(cfg.width)).astype(I32)
    return v.replace(lasthole=hole, hole_draws=v.hole_draws + 1), hole


# ---------------------------------------------------------------------------
# Garbage FIFO (Garbage.cpp) — front entry at slot 0, pops shift left
# ---------------------------------------------------------------------------

def garbage_count(cfg, v) -> jnp.ndarray:
    live = jnp.arange(cfg.garbage_cap) < v.g_size
    return jnp.sum(_sel(live, v.g_count, 0)).astype(I32)


def _shift_left(arr, n):
    """out[j] = arr[j + n] (zero fill); n is a small traced scalar in
    [0, CAP].  Binary-decomposed static shifts (log2(CAP) masked selects)
    instead of a one-hot (CAP, CAP) select — ~6x fewer lane ops."""
    CAP = arr.shape[0]
    out = arr
    k = 0
    while (1 << k) <= CAP:
        s = 1 << k
        out = _sel((n >> k) & 1 != 0, shifts.shift_up(out, s), out)
        k += 1
    return out


def _garbage_add(cfg, v: PlayerState, amount) -> PlayerState:
    """GarbageHandler::add (Garbage.cpp:22-24).  If the ring is full the new
    lines merge into the newest entry (the reference vector is unbounded; at
    CAP pending entries the game is long decided)."""
    CAP = cfg.garbage_cap
    j = jnp.arange(CAP)
    full = v.g_size >= CAP
    tail = jnp.minimum(v.g_size, CAP - 1)
    at_tail = j == tail
    delay = v.time_ms + cfg.garbage_initial_delay
    g_count = _sel(at_tail,
                        _sel(full, v.g_count + amount, amount),
                        v.g_count)
    g_delay = _sel(at_tail & ~full, delay, v.g_delay)
    return v.replace(g_count=g_count, g_delay=g_delay,
                     g_size=jnp.minimum(v.g_size + 1, CAP))


def _garbage_block(cfg, v: PlayerState, amount, freeze: bool):
    """GarbageHandler::block (Garbage.cpp:26-52).  Returns (v', remainder)."""
    CAP = cfg.garbage_cap
    j = jnp.arange(CAP)
    empty0 = v.g_size == 0
    live = j < v.g_size
    counts = _sel(live, v.g_count, 0)
    csum = _prefix_sum(counts)
    # NOT csum[-1]: negative indexing lowers to dynamic_slice, which vmap
    # batches into a gather (no Mosaic lowering)
    total = jnp.sum(counts)
    blocked = jnp.minimum(amount, total)
    delay0 = v.g_delay[0]
    new_counts = jnp.clip(csum - blocked, 0, counts)
    n_popped = jnp.sum(live & (csum <= blocked)).astype(I32)
    g_count = _shift_left(_sel(live, new_counts, v.g_count), n_popped)
    g_delay = _shift_left(v.g_delay, n_popped)
    size = v.g_size - n_popped
    nonempty = size > 0
    fd = jnp.maximum(delay0, g_delay[0])
    if freeze:
        fd = jnp.minimum(fd + cfg.garbage_freeze_delay,
                         v.time_ms + v.g_min_remaining + cfg.garbage_freeze_delay)
    g_delay = _sel((j == 0) & nonempty, fd, g_delay)
    g_min = _sel(nonempty, v.g_min_remaining, I32(cfg.garbage_initial_delay))
    v2 = v.replace(
        g_count=g_count, g_delay=g_delay, g_size=size, g_min_remaining=g_min,
        lines_blocked=v.lines_blocked + blocked)
    out = _merge(empty0, v, v2)
    return out, _sel(empty0, amount, amount - blocked)


def _garbage_check(cfg, v: PlayerState):
    """GarbageHandler::check (Garbage.cpp:54-72): pop one pending line when
    the front entry's delay lapses.  Returns (v', popped?)."""
    CAP = cfg.garbage_cap
    j = jnp.arange(CAP)
    t = v.time_ms
    empty = v.g_size == 0
    fire = (~empty) & (t > v.g_delay[0])
    chain_delay = v.g_delay[0] + cfg.garbage_add_delay
    new_front = v.g_count[0] - 1
    pop = fire & (new_front == 0)
    g_count = _sel(fire & (j == 0), new_front, v.g_count)
    g_count = _sel(pop, _shift_left(g_count, I32(1)), g_count)
    g_delay = _sel(pop, _shift_left(v.g_delay, I32(1)), v.g_delay)
    size = _sel(pop, v.g_size - 1, v.g_size)
    nonempty_after = size > 0
    fd = jnp.maximum(chain_delay, g_delay[0])
    g_delay = _sel(fire & nonempty_after & (j == 0), fd, g_delay)
    g_min = _sel(
        fire,
        _sel(nonempty_after, fd - t, I32(cfg.garbage_initial_delay)),
        _sel(empty, v.g_min_remaining,
                  jnp.minimum(v.g_min_remaining, v.g_delay[0] - t)),
    )
    return v.replace(g_count=g_count, g_delay=g_delay, g_size=size,
                     g_min_remaining=g_min), fire


def _garbage_clear(cfg, v: PlayerState) -> PlayerState:
    return v.replace(
        g_count=jnp.zeros_like(v.g_count), g_delay=jnp.zeros_like(v.g_delay),
        g_size=I32(0), g_min_remaining=I32(cfg.garbage_initial_delay))


# ---------------------------------------------------------------------------
# Combo counter (Combo.cpp)
# ---------------------------------------------------------------------------

def _combo_increase(cfg, v: PlayerState, amount) -> PlayerState:
    """ComboCounter::increase (Combo.cpp:15-30).  amount <= 4 (a piece
    clears at most 4 rows); the lineTime accumulation is unrolled with the
    reference's float order."""
    first = v.combo_count == 0
    start = _sel(first, v.time_ms, v.combo_start)
    ctime = _sel(first, I32(0), v.combo_time)
    cc = v.combo_count + 1
    lc = v.combo_line_count
    lt = F32(0)
    for i in range(4):
        take = i < amount
        lc2 = lc + 1
        lt2 = lt + F32(cfg.combo_line_mult) / lc2.astype(F32)
        lc = _sel(take, lc2, lc)
        lt = _sel(take, lt2, lt)
    # comboTime += staticMultiplyer/comboCount (int div) + lineTime (float),
    # truncated back into the int32 comboTime (Combo.h: int32_t comboTime).
    ctime = (ctime.astype(F32) + (cfg.combo_static_mult // cc).astype(F32)
             + lt).astype(I32)
    return v.replace(combo_start=start, combo_time=ctime, combo_count=cc,
                     combo_line_count=lc,
                     max_combo=jnp.maximum(v.max_combo, cc))


def _combo_check(cfg, v: PlayerState):
    """ComboCounter::check (Combo.cpp:32-48).  Returns (v', lines_sent)."""
    t = v.time_ms
    deadline = v.combo_start + v.combo_time
    remaining = jnp.maximum(deadline - t, 0)
    fire = (t > deadline) & (v.combo_count != 0)
    dur_mult = F32(1) + t.astype(F32) / F32(60000) * F32(0.1)
    cc = v.combo_count.astype(F32)
    sent = (jnp.power(cc, F32(1.4) + cc * F32(0.01)) * dur_mult).astype(I32)
    sent = _sel(fire, sent, 0)
    return v.replace(
        combo_remaining=remaining,
        combo_count=_sel(fire, 0, v.combo_count),
        combo_line_count=_sel(fire, 0, v.combo_line_count),
    ), sent


# ---------------------------------------------------------------------------
# Piece lifecycle
# ---------------------------------------------------------------------------

def _copy_piece(cfg, v: PlayerState, np_) -> PlayerState:
    """GamePlay::copyPiece (gamePlay.cpp:84-88)."""
    rot = _spawn_rot(np_)
    return v.replace(piece=np_, rot=rot, cur_rows=K.lookup_rows(np_, rot),
                     px=I32((cfg.width - 4) // 2), py=I32(0))


def _piece_map(cfg, raw):
    return _select7(raw, tuple(int(x) for x in cfg.piece_map))


def _make_new_piece(cfg, v: PlayerState, tables):
    """GamePlay::makeNewPiece (gamePlay.cpp:71-82): spawn nextpiece, roll a
    new nextpiece through the piece_map filter, die if the spawn is blocked
    (the blocking piece is still drawn into the field)."""
    v = _copy_piece(cfg, v, v.nextpiece)
    v, raw = _draw_piece(v, tables)
    v = v.replace(nextpiece=_piece_map(cfg, raw))
    ext = K.ext_board(cfg, v.occ)
    ok = K.possible(cfg, ext, v.cur_rows, v.px, v.py)
    occ_dead = K.add_piece(cfg, v.occ, v.cur_rows, v.px, v.py)
    v = v.replace(occ=_sel(ok, v.occ, occ_dead))
    return v, ~ok


def _send_lines(cfg, v: PlayerState, n_cleared, n_garb):
    """GamePlay::sendLines (gamePlay.cpp:160-171).  Returns (v', sent)."""
    v = v.replace(garbage_cleared=v.garbage_cleared + n_garb,
                  lines_cleared=v.lines_cleared + n_cleared)
    no_clear = n_cleared == 0
    # no-clear branch: combo timer penalty (Combo.cpp:50-52)
    v_nc = v.replace(combo_time=v.combo_time - 200)
    # clear branch: block incoming with (x-1), send remainder, extend combo
    v_cl, sent = _garbage_block(cfg, v, n_cleared - 1, freeze=True)
    v_cl = v_cl.replace(lines_sent=v_cl.lines_sent + sent)
    v_cl = _combo_increase(cfg, v_cl, n_cleared)
    v_out = _merge(no_clear, v_nc, v_cl)
    return v_out, _sel(no_clear, 0, sent)


def _hd_make(cfg, v: PlayerState) -> PlayerState:
    """GamePlay::hd_make (gamePlay.cpp:48-52): drop, lock into board, reset
    gravity timer."""
    ext = K.ext_board(cfg, v.occ)
    d = K.drop_distance(cfg, ext, v.cur_rows, v.px, v.py)
    py = v.py + d
    occ = K.add_piece(cfg, v.occ, v.cur_rows, v.px, py)
    return v.replace(py=py, occ=occ, drop_delay_time=v.time_ms, lockdown=False)


def _hd_finish(cfg, v: PlayerState, tables):
    """GamePlay::hd_finish (gamePlay.cpp:54-59).  Returns (v', sent|-1)."""
    occ, garb, n_cl, n_gb = K.clear_lines(cfg, v.occ, v.garb, v.py)
    v = v.replace(occ=occ, garb=garb)
    v, sent = _send_lines(cfg, v, n_cl, n_gb)
    v, died = _make_new_piece(cfg, v, tables)
    return v, _sel(died, I32(-1), sent)


def _hd_full(cfg, v: PlayerState, tables):
    """GamePlay::hd (gamePlay.cpp:38-46) — used by the lockdown timer."""
    v = _hd_make(cfg, v)
    return _hd_finish(cfg, v, tables)


def _game_mdown(cfg, v: PlayerState):
    """GamePlay::mDown (gamePlay.cpp:61-69): on success reset the gravity
    timer; on failure start the 400 ms lockdown countdown."""
    ext = K.ext_board(cfg, v.occ)
    ok, px, py = K.try_move(cfg, ext, v.cur_rows, v.px, v.py, 0, 1)
    ddt = _sel(ok, v.time_ms, v.drop_delay_time)
    # dropDelay.set only (re)arms the timer if not already in lockdown
    lt = _sel(ok, v.lockdown_time,
                   _sel(v.lockdown, v.lockdown_time,
                             v.time_ms + cfg.lockdown_ms))
    lockdown = ~ok
    return v.replace(px=px, py=py, drop_delay_time=ddt,
                     lockdown=lockdown, lockdown_time=lt), ok


def _push_garbage(cfg, v: PlayerState, tables):
    """GamePlay::pushGarbage (gamePlay.cpp:179-192).  Returns (v', died)."""
    v, hole = _draw_hole(v, cfg, tables)
    occ, garb = K.add_garbage_line(cfg, v.occ, v.garb, hole)
    v = v.replace(occ=occ, garb=garb)
    py1 = _sel(v.py > 0, v.py - 1, v.py)
    ext = K.ext_board(cfg, occ)
    ok = K.possible(cfg, ext, v.cur_rows, v.px, py1)
    died = (~ok) & (py1 <= 0)
    py2 = _sel((~ok) & (py1 > 0), py1 - 1, py1)
    return v.replace(py=py2), died


# ---------------------------------------------------------------------------
# delayCheck (gamePlay.cpp:90-114)
# ---------------------------------------------------------------------------

def _delay_check(cfg, v: PlayerState, dt, tables):
    """Per-tick timers: gravity, lockdown auto-drop, garbage intake, combo
    payout, garbage landing.  Returns (v', sent) with sent == -1 on death.
    A lockdown auto-drop returns early, skipping garbage/combo for the tick
    (the bare ``return hd()`` at gamePlay.cpp:95)."""
    v = v.replace(time_ms=v.time_ms + dt)
    t = v.time_ms

    # DropDelay::check (DropDelay.cpp:3-21): speed up every 3000 ms
    speedup = (t - v.incr_dd_time) > 3000
    dd = v.drop_delay
    dec = _sel(dd > 200, 10, _sel(dd > 100, 5,
          _sel(dd > 50, 2, _sel(dd > 10, 1, 0))))
    dd = _sel(speedup, dd - dec, dd)
    v = v.replace(drop_delay=dd,
                  incr_dd_time=_sel(speedup, t, v.incr_dd_time))
    gravity = (t - v.drop_delay_time) > dd
    v = v.replace(drop_delay_time=_sel(gravity, t, v.drop_delay_time))
    vg, _ = _game_mdown(cfg, v)
    v = _merge(~gravity, v, vg)

    # Lockdown (DropDelay.cpp:43-48): one more mDown attempt, else hard drop
    lock_fire = v.lockdown & (t > v.lockdown_time)
    vl, moved = _game_mdown(cfg, v)
    vh, hd_sent = _hd_full(cfg, vl, tables)
    do_hd = lock_fire & ~moved
    v = _merge3(do_hd, lock_fire, v, vl, vh)
    # early return skips the garbage/combo block below
    early = do_hd

    # --- the rest of delayCheck (skipped when early) -----------------------
    x = v
    add_g = jnp.floor(x.incoming_lines).astype(I32)
    x = x.replace(incoming_lines=x.incoming_lines - add_g.astype(F32))
    xa = _garbage_add(cfg, x, add_g)
    x = _merge(add_g <= 0, x, xa)

    x, combo_sent = _combo_check(cfg, x)
    xp, rem = _garbage_block(cfg, x, combo_sent, freeze=False)
    xp = xp.replace(lines_sent=xp.lines_sent + rem)
    pay = combo_sent > 0
    x = _merge(~pay, x, xp)
    sent = _sel(pay, rem, 0)

    x, popped = _garbage_check(cfg, x)
    xg, died_g = _push_garbage(cfg, x, tables)
    x = _merge(~popped, x, xg)
    died = popped & died_g
    rest_ret = _sel(died, I32(-1), sent)

    v_out = _merge(early, v, x)
    ret = _sel(early, hd_sent, rest_ret)
    return v_out, ret


# ---------------------------------------------------------------------------
# Actions
# ---------------------------------------------------------------------------

def apply_macro(cfg, v: PlayerState, r, tr) -> PlayerState:
    """The (rotation, translation) macro the agents emit
    (sventon_utils.py:9-13): r clockwise rotations, slide to the far left,
    tr steps right, hard drop (lock only — line resolution happens in the
    finish phase).  Board is unchanged until the final lock, so the extended
    board is computed once."""
    ext = K.ext_board(cfg, v.occ)
    all_rows = K.lookup_rows_all(v.piece)
    rot, px, py, rows = v.rot, v.px, v.py, v.cur_rows
    for k in range(3):  # r <= 3
        do = k < r
        _, rot2, px2, py2, rows2 = K.try_rotate(
            cfg, ext, v.piece, rot, px, py, 1, cur_rows=rows,
            all_rows=all_rows)
        rot = _sel(do, rot2, rot)
        px = _sel(do, px2, px)
        py = _sel(do, py2, py)
        rows = _sel(do, rows2, rows)
    px = px - K.slide_distance(cfg, ext, rows, px, py, -1)
    px = px + jnp.minimum(tr, K.slide_distance(cfg, ext, rows, px, py, +1))
    v = v.replace(rot=rot, px=px, py=py, cur_rows=rows)
    return _hd_make(cfg, v)


def apply_place(cfg, v: PlayerState, r_rel, x_target) -> PlayerState:
    """Column-targeted placement: the key macro TestField emits for a
    top-drop action (findNextMove/makeStartSequence, TestField.cpp:44-49,
    113-125): r_rel cw rotations from spawn, then |x_target - center|
    single steps toward the target column measured from the SPAWN center
    (faithfully ignoring any kick displacement), then hard drop."""
    ext = K.ext_board(cfg, v.occ)
    all_rows = K.lookup_rows_all(v.piece)
    rot, px, py, rows = v.rot, v.px, v.py, v.cur_rows
    for k in range(3):
        do = k < r_rel
        _, rot2, px2, py2, rows2 = K.try_rotate(
            cfg, ext, v.piece, rot, px, py, 1, cur_rows=rows,
            all_rows=all_rows)
        rot = _sel(do, rot2, rot)
        px = _sel(do, px2, px)
        py = _sel(do, py2, py)
        rows = _sel(do, rows2, rows)
    center = (cfg.width - 4) // 2
    dx = x_target - center
    direction_right = dx >= 0
    n = jnp.abs(dx)
    sl_r = K.slide_distance(cfg, ext, rows, px, py, +1)
    sl_l = K.slide_distance(cfg, ext, rows, px, py, -1)
    move = _sel(direction_right, jnp.minimum(n, sl_r),
                     -jnp.minimum(n, sl_l))
    v = v.replace(rot=rot, px=px + move, py=py, cur_rows=rows)
    return _hd_make(cfg, v)


def apply_pose(cfg, v: PlayerState, rot_abs, col, y) -> PlayerState:
    """Direct pose-lock: teleport the falling piece to (rot_abs,
    posX = col-1, posY = y) and hard-drop (zero distance when the pose is a
    rest).  This is the action interface for FINESSE placements — rests the
    reference reaches via key paths found by its backtracking search
    (TestField::findNextMove/tryAllFinesseMoves, TestField.cpp:113-125,
    174-410); the locked board is identical, only the intermediate
    animation differs.  An illegal (overlapping/out-of-range) pose is
    ignored: the piece hard-drops from its current pose instead, so bad
    arguments cannot corrupt the bitboard."""
    ext = K.ext_board(cfg, v.occ)
    rot_abs = jnp.clip(rot_abs, 0, 3)
    rows = K.lookup_rows(v.piece, rot_abs)
    px = col - 1
    ok = K.possible(cfg, ext, rows, px, y)
    v = v.replace(
        rot=_sel(ok, rot_abs, v.rot),
        px=_sel(ok, px, v.px),
        py=_sel(ok, y, v.py),
        cur_rows=_sel(ok, rows, v.cur_rows))
    return _hd_make(cfg, v)


def make_phase_pose(cfg, state: EngineState, use, rot_abs, col, y
                    ) -> EngineState:
    """make_actions with direct pose-locks (the full get_actions action
    space: top-drop ∪ finesse, engine/masks.legal_rests)."""
    ps = state.players
    for i in range(cfg.n_players):
        v = _get(ps, i)
        active = (~v.dead) & use[i]
        v2 = apply_pose(cfg, v, rot_abs[i], col[i], y[i])
        ps = _put(ps, i, v2, active, base=v)
    return state.replace(players=ps)


@partial(jax.jit, static_argnums=(0,))
def step_pose(cfg: EngineConfig, state: EngineState, use, rot_abs, col, y,
              dt, tables: Optional[RngTables] = None) -> EngineState:
    """Full tick with direct pose-lock placements."""
    def run(s):
        s = make_phase_pose(cfg, s, use, rot_abs, col, y)
        return finish_phase(cfg, s, dt, tables)
    new = run(state)
    return jax.tree.map(lambda a, b: _sel(state.round_over, a, b), state, new)


def make_phase_place(cfg, state: EngineState, use, r_rel, x_target) -> EngineState:
    """make_actions with column-targeted placements (the world-model action
    interface used by Sherlock/SIXten-style agents)."""
    ps = state.players
    for i in range(cfg.n_players):
        v = _get(ps, i)
        active = (~v.dead) & use[i]
        v2 = apply_place(cfg, v, r_rel[i], x_target[i])
        ps = _put(ps, i, v2, active, base=v)
    return state.replace(players=ps)


@partial(jax.jit, static_argnums=(0,))
def step_place(cfg: EngineConfig, state: EngineState, use, r_rel, x_target,
               dt, tables: Optional[RngTables] = None) -> EngineState:
    """Full tick with column-targeted placements."""
    def run(s):
        s = make_phase_place(cfg, s, use, r_rel, x_target)
        return finish_phase(cfg, s, dt, tables)
    new = run(state)
    return jax.tree.map(lambda a, b: _sel(state.round_over, a, b), state, new)


def apply_key(cfg, v: PlayerState, key) -> PlayerState:
    """Raw key-code dispatch (PythonHandle.cpp:73-112; codes documented at
    PythonHandle.h:20-31).  Used by the press_key action type and parity
    tests; not a hot path (lax.switch per key)."""
    ext = K.ext_board(cfg, v.occ)

    def mv(dx, dy):
        def f(x):
            _, px, py = K.try_move(cfg, ext, x.cur_rows, x.px, x.py, dx, dy)
            return x.replace(px=px, py=py)
        return f

    def far(direction):
        def f(x):
            d = K.slide_distance(cfg, ext, x.cur_rows, x.px, x.py, direction)
            return x.replace(px=x.px + direction * d)
        return f

    def rot(turns):
        def f(x):
            _, r2, px2, py2, rows2 = K.try_rotate(
                cfg, ext, x.piece, x.rot, x.px, x.py, turns,
                cur_rows=x.cur_rows)
            return x.replace(rot=r2, px=px2, py=py2, cur_rows=rows2)
        return f

    def mdown(x):
        return _game_mdown(cfg, x)[0]

    def far_down(x):
        # 'while (mDown());' — ends with one failing mDown => lockdown armed
        ext2 = K.ext_board(cfg, x.occ)
        d = K.drop_distance(cfg, ext2, x.cur_rows, x.px, x.py)
        x = x.replace(
            py=x.py + d,
            drop_delay_time=_sel(d > 0, x.time_ms, x.drop_delay_time),
            # each successful mDown clears lockdown via dropDelay.reset, so
            # the final failing attempt re-arms the 400 ms countdown
            lockdown=x.lockdown & (d <= 0))
        x, _ = _game_mdown(cfg, x)  # the final failing attempt
        return x

    branches = [
        lambda x: x,            # 0 nothing
        mv(-1, 0),              # 1 left
        far(-1),                # 2 far left
        mv(1, 0),               # 3 right
        far(+1),                # 4 far right
        mdown,                  # 5 down
        far_down,               # 6 far down
        lambda x: _hd_make(cfg, x),  # 7 hard drop (make half)
        rot(1),                 # 8 rotate cw
        rot(3),                 # 9 rotate ccw
        rot(2),                 # 10 flip
    ]
    # out-of-range codes are a no-op (the C++ switch default)
    key = _sel((key < 0) | (key > 10), 0, key)
    return jax.lax.switch(key, branches, v)


# ---------------------------------------------------------------------------
# Round lifecycle
# ---------------------------------------------------------------------------

def _restart_round(cfg, v: PlayerState) -> PlayerState:
    """GamePlay::restartRound (gamePlay.cpp:206-216) + data.clear()."""
    z = I32(0)
    v = _garbage_clear(cfg, v)
    return v.replace(
        occ=jnp.zeros_like(v.occ), garb=jnp.zeros_like(v.garb),
        combo_start=z, combo_time=z, combo_count=z, combo_line_count=z,
        time_ms=z, incoming_lines=F32(0), lines_cleared_snap=z,
        dead=jnp.bool_(False),
        drop_delay=I32(1000), drop_delay_time=z, incr_dd_time=z,
        lockdown=jnp.bool_(False), lockdown_time=z,
        lines_sent=z, lines_recv=z, garbage_cleared=z, lines_cleared=z,
        lines_blocked=z, max_combo=z,
    )


def _seed_round(cfg, v: PlayerState, piece_key, hole_key, tables) -> PlayerState:
    """GamePlay::seed (gamePlay.cpp:218-230), evaluated in closed form.

    The reference loop is: reset bag; spawn (draw 0); while next is S/Z:
    reset bag, redraw; final spawn (one more draw).  Because the bag is
    RESET before every reroll, candidate i is a single draw from a fresh
    bag — an independent function of uniform u_i — so the loop collapses to
    'first acceptable candidate' over a precomputed draw window, with the
    final state depending only on (u_k, u_{k+1}).  The board is empty at
    seed time, so spawn-blocked death is impossible and the field checks of
    makeNewPiece vanish."""
    v = v.replace(piece_key=piece_key, hole_key=hole_key,
                  piece_draws=I32(0), hole_draws=I32(0),
                  cogp=jnp.full((7,), F32(_COGP_FRESH)),
                  lasthole=I32(20))
    R = cfg.max_seed_rerolls
    tab = None if tables is None else tables.piece
    us = [_uniform(piece_key, I32(i), tab) for i in range(R + 2)]
    fresh = jnp.full((7,), F32(_COGP_FRESH))
    cands = [_choose_from_bag(fresh, us[i]) for i in range(R + 1)]
    mapped = [_piece_map(cfg, c) for c in cands]
    if cfg.only_zs:
        k = I32(0)
    else:
        # first acceptable candidate (lowest index with non-S/Z piece);
        # unrolled descending selects — argmax on ints has no Mosaic
        # lowering, and this is cheaper anyway (R+1 selects, no stack)
        k = I32(R)
        for i in range(R, -1, -1):
            ok_i = ~((mapped[i] == 2) | (mapped[i] == 3))
            k = _sel(ok_i, I32(i), k)
    # select the accepted candidate and its successor uniform
    cand_k = I32(0)
    piece_k = I32(0)
    u_next = F32(0)
    for i in range(R + 1):
        sel = k == i
        cand_k = _sel(sel, cands[i], cand_k)
        piece_k = _sel(sel, mapped[i], piece_k)
        u_next = _sel(sel, us[i + 1], u_next)
    cogp1 = _bag_update(fresh, cand_k)
    cand_next = _choose_from_bag(cogp1, u_next)
    cogp2 = _bag_update(cogp1, cand_next)
    v = v.replace(nextpiece=piece_k, cogp=cogp2, piece_draws=k + 2)
    v = _copy_piece(cfg, v, piece_k)
    v = v.replace(nextpiece=_piece_map(cfg, cand_next))
    return v


def reset(cfg: EngineConfig, state: EngineState, key,
          tables: Optional[RngTables] = None) -> EngineState:
    """PythonHandle::reset (PythonHandle.cpp:49-66): record the winner of the
    finished round, restart and reseed every player.  Both players get the
    same per-round stream keys, mirroring the shared seeding of the
    reference."""
    ps = state.players
    Pn = cfg.n_players
    alive = ~ps.dead
    alive_count = jnp.sum(alive).astype(I32)
    idxs = jnp.arange(Pn, dtype=I32)
    winner = jnp.max(_sel(alive, idxs, -1)).astype(I32)
    winner = _sel(alive_count > 1, I32(-1), winner)
    piece_key = rng.fold_in(key, 0)
    hole_key = rng.fold_in(key, 1)

    def per_player(i):
        v = jax.tree.map(lambda a: a[i], ps)
        v = _restart_round(cfg, v)
        return _seed_round(cfg, v, piece_key, hole_key, tables)

    views = [per_player(i) for i in range(Pn)]

    def _stack(*xs):
        # bool leaves stack through int32 (an i1 concatenate makes Mosaic
        # emit an unsupported i1->i32 vreg bitcast; see _sel)
        if jnp.result_type(xs[0]) == jnp.bool_:
            return jnp.stack([jnp.asarray(x, jnp.int32) for x in xs]) != 0
        return jnp.stack(xs)

    new_ps = jax.tree.map(_stack, *views)
    return EngineState(players=new_ps, round_over=jnp.bool_(False),
                       last_winner=winner)


def init(cfg: EngineConfig, key) -> EngineState:
    """PythonHandle::init (PythonHandle.cpp:5-25)."""
    ps = zeros_player_state(cfg)
    state = EngineState(players=ps, round_over=jnp.bool_(False),
                        last_winner=I32(-1))
    return reset(cfg, state, key)


# ---------------------------------------------------------------------------
# The full tick
# ---------------------------------------------------------------------------

def _distribute(cfg, incoming, sender, amount):
    """PythonHandle::distributeLines (PythonHandle.cpp:124-136)."""
    Pn = cfg.n_players
    if Pn < 2:
        return incoming
    per = amount.astype(F32) / F32(Pn - 1)
    # arithmetic blend instead of a select: `others` is an UNBATCHED (P,)
    # bool constant (sender is a static index), and vmap's broadcast of an
    # i1 minor-dim insert has no Mosaic lowering.  Bit-identical: per*0
    # adds +0.0 and incoming_lines is never -0.0 (monotone >= 0 updates).
    others = (jnp.arange(Pn) != sender).astype(F32)
    return incoming + per * others


def _get(ps, i):
    """Slot i of every (P, ...) leaf.  Bool leaves are sliced through
    int32: slicing a BATCHED i1 leaf makes vmap's axis bookkeeping emit a
    transpose on an i1 vector, which Mosaic cannot legalize (the Pallas
    rollout kernel traces this code); the i32 detour reproduces the value
    with the comparison born at the right batch position."""
    def g(a):
        if jnp.result_type(a) == jnp.bool_:
            return jnp.asarray(a, jnp.int32)[i] != 0
        return a[i]
    return jax.tree.map(g, ps)


def _put(ps, i, view, pred, base=None):
    """Write view back into slot i of ps where pred (scalar bool) holds.
    ``base``: the _get(ps, i) view the subroutine started from — leaves the
    subroutine never replaced are identical objects and are skipped.  The
    select happens on the (row-sized) slice, not the full (P, ...) leaf."""
    def set_slot(full, sel):
        # static-index row replacement as a concat (NOT .at[i].set — jnp
        # scatter has no Mosaic lowering; the Pallas rollout kernel traces
        # this same code).  Zero-length edge slices are omitted: Mosaic
        # rejects zero-sized vector types.
        parts = ([full[:i]] if i > 0 else []) + [sel[None]] + \
                ([full[i + 1:]] if i + 1 < full.shape[0] else [])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def f(full, one, orig):
        if one is orig:
            return full
        if jnp.result_type(full) == jnp.bool_:
            # whole slot update in int32: Mosaic's i1 concatenate asserts
            # (in_bounds_vreg type mismatch); select+concat in i32, one cmp
            sel = jnp.where(pred, jnp.asarray(one, jnp.int32),
                            jnp.asarray(orig, jnp.int32))
            return set_slot(jnp.asarray(full, jnp.int32), sel) != 0
        return set_slot(full, _sel(pred, one, orig))

    if base is None:
        return jax.tree.map(lambda full, one: f(full, one, full[i]), ps, view)
    return jax.tree.map(f, ps, view, base)


def finish_phase(cfg: EngineConfig, state: EngineState, dt, tables) -> EngineState:
    """PythonHandle::finish_actions (PythonHandle.cpp:149-188): resolve every
    player's hard drop (stopping the loop on a death), then run every
    survivor's delayCheck, distributing sent lines as they happen."""
    ps = state.players
    Pn = cfg.n_players

    # --- phase 1: hd_finish for each player, break on first death ----------
    broke = jnp.bool_(False)
    for i in range(Pn):
        v = _get(ps, i)
        active = (~v.dead) & (~broke)
        v2, sent = _hd_finish(cfg, v, tables)
        died = sent == -1
        v2 = v2.replace(dead=v2.dead | died)
        ps = _put(ps, i, v2, active, base=v)
        inc = _distribute(cfg, ps.incoming_lines, i, jnp.maximum(sent, 0))
        do_inc = active & (~died) & (sent > 0)
        ps = ps.replace(incoming_lines=_sel(do_inc, inc, ps.incoming_lines))
        broke = broke | (active & died)

    # --- phase 2: delayCheck for every non-dead player ---------------------
    alive_count = I32(0)
    for i in range(Pn):
        v = _get(ps, i)
        active = ~v.dead
        v2, sent = _delay_check(cfg, v, dt, tables)
        died = sent == -1
        v2 = v2.replace(dead=v2.dead | died)
        # players dying here skip the reward/incoming update ('continue')
        v3 = v2.replace(
            reward=v2.lines_cleared - v2.lines_cleared_snap,
            lines_cleared_snap=v2.lines_cleared,
            incoming_count=garbage_count(cfg, v2),
        )
        v_out = _merge(died, v2, v3)
        ps = _put(ps, i, v_out, active, base=v)
        inc = _distribute(cfg, ps.incoming_lines, i, jnp.maximum(sent, 0))
        do_inc = active & (~died) & (sent > 0)
        ps = ps.replace(incoming_lines=_sel(do_inc, inc, ps.incoming_lines))
        alive_count = alive_count + (active & (~died)).astype(I32)

    check_for_winner = cfg.n_players > 1
    over = (alive_count == 0) | (check_for_winner & (alive_count < 2))
    return state.replace(players=ps, round_over=over)


def make_phase_macro(cfg, state: EngineState, use, r, tr) -> EngineState:
    """make_actions with (r, t) macros; use[i] False == null action."""
    ps = state.players
    use_i32 = jnp.asarray(use, jnp.int32)   # no i1 slicing (see _get)
    for i in range(cfg.n_players):
        v = _get(ps, i)
        active = (~v.dead) & (use_i32[i] != 0)
        v2 = apply_macro(cfg, v, r[i], tr[i])
        ps = _put(ps, i, v2, active, base=v)
    return state.replace(players=ps)


def make_phase_keys(cfg, state: EngineState, keys) -> EngineState:
    """make_actions with raw key sequences, shape (P, K); 0-padded (key 0 is
    a no-op, so padding is exact)."""
    ps = state.players
    n_keys = keys.shape[1]
    for i in range(cfg.n_players):
        v = _get(ps, i)
        active = ~v.dead

        def body(k, x):
            return apply_key(cfg, x, keys[i, k])

        v2 = jax.lax.fori_loop(0, n_keys, body, v)
        ps = _put(ps, i, v2, active, base=v)
    return state.replace(players=ps)


@partial(jax.jit, static_argnums=(0,))
def step_macro(cfg: EngineConfig, state: EngineState, use, r, tr, dt,
               tables: Optional[RngTables] = None) -> EngineState:
    """One full engine tick with macro actions: make + finish.  No-op if the
    round is already over (the caller resets)."""
    def run(s):
        s = make_phase_macro(cfg, s, use, r, tr)
        return finish_phase(cfg, s, dt, tables)
    new = run(state)
    return jax.tree.map(lambda a, b: _sel(state.round_over, a, b), state, new)


@partial(jax.jit, static_argnums=(0,))
def step_keys(cfg: EngineConfig, state: EngineState, keys, dt,
              tables: Optional[RngTables] = None) -> EngineState:
    """One full engine tick with raw key sequences (press_key parity path)."""
    def run(s):
        s = make_phase_keys(cfg, s, keys)
        return finish_phase(cfg, s, dt, tables)
    new = run(state)
    return jax.tree.map(lambda a, b: _sel(state.round_over, a, b), state, new)
