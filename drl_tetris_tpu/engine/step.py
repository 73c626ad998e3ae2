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

from drl_tetris_tpu.engine.core import (
    EngineConfig, EngineState, PlayerState, zeros_player_state,
    ROW_MASKS, SPAWN_ROT,
)
from drl_tetris_tpu.engine import kernels as K

I32 = jnp.int32
F32 = jnp.float32


class RngTables(NamedTuple):
    """Injected per-round uniform streams (both players share one stream per
    kind, exactly like the reference seeding both players identically,
    PythonHandle.cpp:68-71)."""
    piece: jnp.ndarray  # (T,) float32
    hole: jnp.ndarray   # (T,) float32


def _uniform(key, counter, table):
    if table is None:
        return jax.random.uniform(jax.random.fold_in(key, counter.astype(jnp.uint32)),
                                  dtype=F32)
    return table[jnp.clip(counter, 0, table.shape[0] - 1)]


# ---------------------------------------------------------------------------
# Randomizer (randomizer.cpp)
# ---------------------------------------------------------------------------

def _rander_reset(v: PlayerState) -> PlayerState:
    """randomizer::reset (randomizer.cpp:55-62): bag weights and lasthole only
    — the underlying generator state (our draw counters) keeps running.
    1000/7 is integer division in the reference: weights start at 142.0."""
    cogp = jnp.full((7,), F32(1000 // 7), F32)
    return v.replace(cogp=cogp, lasthole=I32(20))


def _draw_piece(v: PlayerState, tables) -> tuple[PlayerState, jnp.ndarray]:
    """randomizer::getPiece (randomizer.cpp:10-32): pick by sequential weight
    subtraction, then shift 3/4 of the picked weight onto the others."""
    u = _uniform(v.piece_key, v.piece_draws, None if tables is None else tables.piece)
    p = u * F32(1000)

    def body(carry, i):
        rem, found, chosen = carry
        rem2 = rem - v.cogp[i]
        hit = jnp.logical_and(~found, rem2 < 0)
        chosen = jnp.where(hit, i, chosen)
        found = found | hit
        rem = jnp.where(found, rem, rem2)
        return (rem, found, chosen), None

    (_, _, chosen), _ = jax.lax.scan(
        body, (p, jnp.bool_(False), I32(0)), jnp.arange(7, dtype=I32))
    adjust = (v.cogp[chosen] / F32(4)) * F32(3)
    cogp = v.cogp.at[chosen].add(-adjust)
    spread = adjust / F32(6)
    cogp = jnp.where(jnp.arange(7) == chosen, cogp, cogp + spread)
    return v.replace(cogp=cogp, piece_draws=v.piece_draws + 1), chosen


def _draw_hole(v: PlayerState, cfg: EngineConfig, tables) -> tuple[PlayerState, jnp.ndarray]:
    """randomizer::getHole(noStack=false) (randomizer.cpp:38-45)."""
    u = _uniform(v.hole_key, v.hole_draws, None if tables is None else tables.hole)
    hole = (u * F32(cfg.width)).astype(I32)
    return v.replace(lasthole=hole, hole_draws=v.hole_draws + 1), hole


# ---------------------------------------------------------------------------
# Garbage queue (Garbage.cpp) — fixed ring buffer over (CAP,) arrays
# ---------------------------------------------------------------------------

def _g_positions(cfg, v):
    """Entry j (FIFO order) lives at ring slot (head + j) % CAP."""
    j = jnp.arange(cfg.garbage_cap, dtype=I32)
    slots = jnp.mod(v.g_head + j, cfg.garbage_cap)
    live = j < v.g_size
    return j, slots, live


def garbage_count(cfg, v) -> jnp.ndarray:
    _, slots, live = _g_positions(cfg, v)
    return jnp.sum(jnp.where(live, v.g_count[slots], 0)).astype(I32)


def _garbage_add(cfg, v: PlayerState, amount) -> PlayerState:
    """GarbageHandler::add (Garbage.cpp:22-24).  If the ring is full the new
    lines merge into the newest entry (the reference vector is unbounded; at
    CAP=32 pending entries the game is long since decided)."""
    full = v.g_size >= cfg.garbage_cap
    tail = jnp.mod(v.g_head + v.g_size, cfg.garbage_cap)
    last = jnp.mod(v.g_head + v.g_size - 1, cfg.garbage_cap)
    delay = v.time_ms + cfg.garbage_initial_delay
    g_count = jnp.where(
        full,
        v.g_count.at[last].add(amount),
        v.g_count.at[tail].set(amount),
    )
    g_delay = jnp.where(full, v.g_delay, v.g_delay.at[tail].set(delay))
    return v.replace(g_count=g_count, g_delay=g_delay,
                     g_size=jnp.minimum(v.g_size + 1, cfg.garbage_cap))


def _garbage_block(cfg, v: PlayerState, amount, freeze: bool):
    """GarbageHandler::block (Garbage.cpp:26-52).  Returns (v', remainder)."""
    empty0 = v.g_size == 0
    j, slots, live = _g_positions(cfg, v)
    counts = jnp.where(live, v.g_count[slots], 0)
    csum = jnp.cumsum(counts)
    total = csum[-1]
    blocked = jnp.minimum(amount, total)
    delay0 = v.g_delay[v.g_head]  # front delay before consumption
    new_counts = jnp.clip(csum - blocked, 0, counts)
    n_popped = jnp.sum(live & (csum <= blocked)).astype(I32)
    g_count = v.g_count.at[slots].set(jnp.where(live, new_counts, v.g_count[slots]))
    head = jnp.mod(v.g_head + n_popped, cfg.garbage_cap)
    size = v.g_size - n_popped
    # Post-adjust the (new) front entry's delay (Garbage.cpp:44-49)
    nonempty = size > 0
    fd = v.g_delay[head]
    fd = jnp.maximum(delay0, fd)
    if freeze:
        fd = jnp.minimum(fd + cfg.garbage_freeze_delay,
                         v.time_ms + v.g_min_remaining + cfg.garbage_freeze_delay)
    g_delay = jnp.where(nonempty, v.g_delay.at[head].set(fd), v.g_delay)
    g_min = jnp.where(nonempty, v.g_min_remaining, I32(cfg.garbage_initial_delay))
    v = v.replace(
        g_count=jnp.where(empty0, v.g_count, g_count),
        g_delay=jnp.where(empty0, v.g_delay, g_delay),
        g_head=jnp.where(empty0, v.g_head, head),
        g_size=jnp.where(empty0, v.g_size, size),
        g_min_remaining=jnp.where(empty0, v.g_min_remaining, g_min),
        lines_blocked=v.lines_blocked + jnp.where(empty0, 0, blocked),
    )
    remainder = jnp.where(empty0, amount, amount - blocked)
    return v, remainder


def _garbage_check(cfg, v: PlayerState):
    """GarbageHandler::check (Garbage.cpp:54-72): pops one pending line when
    the front entry's delay lapses.  Returns (v', popped?)."""
    t = v.time_ms
    empty = v.g_size == 0
    front = v.g_head
    fire = (~empty) & (t > v.g_delay[front])
    chain_delay = v.g_delay[front] + cfg.garbage_add_delay
    new_count = v.g_count[front] - 1
    pop = fire & (new_count == 0)
    g_count = jnp.where(fire, v.g_count.at[front].set(new_count), v.g_count)
    head = jnp.where(pop, jnp.mod(front + 1, cfg.garbage_cap), front)
    size = jnp.where(pop, v.g_size - 1, v.g_size)
    nonempty_after = size > 0
    fd = jnp.maximum(chain_delay, v.g_delay[head])
    g_delay = jnp.where(fire & nonempty_after, v.g_delay.at[head].set(fd), v.g_delay)
    g_min = jnp.where(
        fire,
        jnp.where(nonempty_after, fd - t, I32(cfg.garbage_initial_delay)),
        jnp.where(empty, v.g_min_remaining,
                  jnp.minimum(v.g_min_remaining, v.g_delay[front] - t)),
    )
    return v.replace(g_count=g_count, g_delay=g_delay, g_head=head, g_size=size,
                     g_min_remaining=g_min), fire


def _garbage_clear(cfg, v: PlayerState) -> PlayerState:
    return v.replace(
        g_count=jnp.zeros_like(v.g_count), g_delay=jnp.zeros_like(v.g_delay),
        g_head=I32(0), g_size=I32(0),
        g_min_remaining=I32(cfg.garbage_initial_delay))


# ---------------------------------------------------------------------------
# Combo counter (Combo.cpp)
# ---------------------------------------------------------------------------

def _combo_increase(cfg, v: PlayerState, amount) -> PlayerState:
    """ComboCounter::increase (Combo.cpp:15-30).  amount <= 4 (a piece clears
    at most 4 rows)."""
    first = v.combo_count == 0
    start = jnp.where(first, v.time_ms, v.combo_start)
    ctime = jnp.where(first, I32(0), v.combo_time)
    cc = v.combo_count + 1

    def body(i, carry):
        lc, lt = carry
        take = i < amount
        lc2 = lc + 1
        lt2 = lt + F32(cfg.combo_line_mult) / lc2.astype(F32)
        return (jnp.where(take, lc2, lc), jnp.where(take, lt2, lt))

    line_count, line_time = jax.lax.fori_loop(
        0, 4, body, (v.combo_line_count, F32(0)))
    # comboTime += staticMultiplyer/comboCount (int div) + lineTime (float),
    # truncated back into the int32 comboTime (Combo.h: int32_t comboTime).
    ctime = (ctime.astype(F32)
             + (cfg.combo_static_mult // cc).astype(F32)
             + line_time).astype(I32)
    return v.replace(
        combo_start=start, combo_time=ctime, combo_count=cc,
        combo_line_count=line_count,
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
    sent = jnp.where(fire, sent, 0)
    return v.replace(
        combo_remaining=remaining,
        combo_count=jnp.where(fire, 0, v.combo_count),
        combo_line_count=jnp.where(fire, 0, v.combo_line_count),
    ), sent


# ---------------------------------------------------------------------------
# Piece lifecycle
# ---------------------------------------------------------------------------

def _copy_piece(cfg, v: PlayerState, np_) -> PlayerState:
    """GamePlay::copyPiece (gamePlay.cpp:84-88)."""
    return v.replace(piece=np_, rot=SPAWN_ROT[np_],
                     px=I32((cfg.width - 4) // 2), py=I32(0))


def _make_new_piece(cfg, v: PlayerState, tables):
    """GamePlay::makeNewPiece (gamePlay.cpp:71-82): spawn nextpiece, roll a
    new nextpiece through the piece_map filter, die if the spawn is blocked
    (the blocking piece is still drawn into the field)."""
    v = _copy_piece(cfg, v, v.nextpiece)
    v, raw = _draw_piece(v, tables)
    pmap = jnp.asarray(cfg.piece_map, dtype=I32)
    v = v.replace(nextpiece=pmap[raw])
    ext = K.ext_board_padded(cfg, v.occ)
    ok = K.possible(cfg, ext, v.piece, v.rot, v.px, v.py)
    occ_dead = K.add_piece(cfg, v.occ, v.piece, v.rot, v.px, v.py)
    v = v.replace(occ=jnp.where(ok, v.occ, occ_dead))
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
    v_out = jax.tree.map(lambda a, b: jnp.where(no_clear, a, b), v_nc, v_cl)
    return v_out, jnp.where(no_clear, 0, sent)


def _hd_make(cfg, v: PlayerState) -> PlayerState:
    """GamePlay::hd_make (gamePlay.cpp:48-52): drop, lock into board, reset
    gravity timer."""
    ext = K.ext_board_padded(cfg, v.occ)
    d = K.drop_distance(cfg, ext, v.piece, v.rot, v.px, v.py)
    py = v.py + d
    occ = K.add_piece(cfg, v.occ, v.piece, v.rot, v.px, py)
    return v.replace(py=py, occ=occ, drop_delay_time=v.time_ms, lockdown=False)


def _hd_finish(cfg, v: PlayerState, tables):
    """GamePlay::hd_finish (gamePlay.cpp:54-59).  Returns (v', sent|-1)."""
    occ, garb, n_cl, n_gb = K.clear_lines(cfg, v.occ, v.garb, v.py)
    v = v.replace(occ=occ, garb=garb)
    v, sent = _send_lines(cfg, v, n_cl, n_gb)
    v, died = _make_new_piece(cfg, v, tables)
    return v, jnp.where(died, I32(-1), sent)


def _hd_full(cfg, v: PlayerState, tables):
    """GamePlay::hd (gamePlay.cpp:38-46) — used by the lockdown timer."""
    v = _hd_make(cfg, v)
    return _hd_finish(cfg, v, tables)


def _game_mdown(cfg, v: PlayerState):
    """GamePlay::mDown (gamePlay.cpp:61-69): on success reset the gravity
    timer; on failure start the 400 ms lockdown countdown."""
    ext = K.ext_board_padded(cfg, v.occ)
    ok, px, py = K.try_move(cfg, ext, v.piece, v.rot, v.px, v.py, 0, 1)
    ddt = jnp.where(ok, v.time_ms, v.drop_delay_time)
    # dropDelay.set only (re)arms the timer if not already in lockdown
    lt = jnp.where(ok, v.lockdown_time,
                   jnp.where(v.lockdown, v.lockdown_time,
                             v.time_ms + cfg.lockdown_ms))
    lockdown = jnp.where(ok, False, True)
    return v.replace(px=px, py=py, drop_delay_time=ddt,
                     lockdown=lockdown, lockdown_time=lt), ok


def _push_garbage(cfg, v: PlayerState, tables):
    """GamePlay::pushGarbage (gamePlay.cpp:179-192).  Returns (v', died)."""
    v, hole = _draw_hole(v, cfg, tables)
    occ, garb = K.add_garbage_line(cfg, v.occ, v.garb, hole)
    v = v.replace(occ=occ, garb=garb)
    py1 = jnp.where(v.py > 0, v.py - 1, v.py)
    ext = K.ext_board_padded(cfg, occ)
    ok = K.possible(cfg, ext, v.piece, v.rot, v.px, py1)
    died = (~ok) & (py1 <= 0)
    py2 = jnp.where((~ok) & (py1 > 0), py1 - 1, py1)
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
    dec = jnp.where(dd > 200, 10, jnp.where(dd > 100, 5,
          jnp.where(dd > 50, 2, jnp.where(dd > 10, 1, 0))))
    dd = jnp.where(speedup, dd - dec, dd)
    v = v.replace(drop_delay=dd,
                  incr_dd_time=jnp.where(speedup, t, v.incr_dd_time))
    gravity = (t - v.drop_delay_time) > dd
    v = v.replace(drop_delay_time=jnp.where(gravity, t, v.drop_delay_time))
    v = jax.lax.cond(gravity, lambda x: _game_mdown(cfg, x)[0], lambda x: x, v)

    # Lockdown (DropDelay.cpp:43-48): one more mDown attempt, else hard drop
    lock_fire = v.lockdown & (t > v.lockdown_time)
    CONT = I32(-(1 << 20))  # sentinel: "no early return"

    def on_lock(x):
        x, moved = _game_mdown(cfg, x)
        return jax.lax.cond(moved, lambda y: (y, CONT),
                            lambda y: _hd_full(cfg, y, tables), x)

    v, early = jax.lax.cond(lock_fire, on_lock, lambda x: (x, CONT), v)

    def rest(x):
        # incoming float lines -> queued garbage (gamePlay.cpp:97-102)
        add_g = jnp.floor(x.incoming_lines).astype(I32)
        x = x.replace(incoming_lines=x.incoming_lines - add_g.astype(F32))
        x = jax.lax.cond(add_g > 0, lambda y: _garbage_add(cfg, y, add_g),
                         lambda y: y, x)
        # combo payout -> blocked by pending garbage, remainder sent
        x, combo_sent = _combo_check(cfg, x)

        def pay(y):
            y, rem = _garbage_block(cfg, y, combo_sent, freeze=False)
            return y.replace(lines_sent=y.lines_sent + rem), rem

        x, sent = jax.lax.cond(combo_sent > 0, pay, lambda y: (y, I32(0)), x)
        # garbage landing (one line per tick, gamePlay.cpp:110-111)
        x, popped = _garbage_check(cfg, x)
        x, died = jax.lax.cond(popped, lambda y: _push_garbage(cfg, y, tables),
                               lambda y: (y, jnp.bool_(False)), x)
        return x, jnp.where(died, I32(-1), sent)

    v, ret = jax.lax.cond(early != CONT, lambda x: (x, early), rest, v)
    return v, ret


# ---------------------------------------------------------------------------
# Actions
# ---------------------------------------------------------------------------

def apply_macro(cfg, v: PlayerState, r, tr) -> PlayerState:
    """The (rotation, translation) macro the agents emit
    (sventon_utils.py:9-13): r clockwise rotations, slide to the far left,
    tr steps right, hard drop (lock only — line resolution happens in the
    finish phase).  Board is unchanged until the final lock, so the extended
    board is computed once."""
    ext = K.ext_board_padded(cfg, v.occ)
    rot, px, py = v.rot, v.px, v.py
    for k in range(3):  # r <= 3
        do = k < r
        _, rot2, px2, py2 = K.try_rotate(cfg, ext, v.piece, rot, px, py, 1)
        rot = jnp.where(do, rot2, rot)
        px = jnp.where(do, px2, px)
        py = jnp.where(do, py2, py)
    px = px - K.slide_distance(cfg, ext, v.piece, rot, px, py, -1)
    px = px + jnp.minimum(tr, K.slide_distance(cfg, ext, v.piece, rot, px, py, +1))
    v = v.replace(rot=rot, px=px, py=py)
    return _hd_make(cfg, v)


def apply_key(cfg, v: PlayerState, key) -> PlayerState:
    """Raw key-code dispatch (PythonHandle.cpp:73-112; codes documented at
    PythonHandle.h:20-31).  Used by the press_key action type and by parity
    tests against recorded key streams."""
    ext = K.ext_board_padded(cfg, v.occ)

    def mv(dx, dy):
        def f(x):
            _, px, py = K.try_move(cfg, ext, x.piece, x.rot, x.px, x.py, dx, dy)
            return x.replace(px=px, py=py)
        return f

    def far(direction):
        def f(x):
            d = K.slide_distance(cfg, ext, x.piece, x.rot, x.px, x.py, direction)
            return x.replace(px=x.px + direction * d)
        return f

    def rot(turns):
        def f(x):
            _, r2, px2, py2 = K.try_rotate(cfg, ext, x.piece, x.rot, x.px, x.py, turns)
            return x.replace(rot=r2, px=px2, py=py2)
        return f

    def mdown(x):
        return _game_mdown(cfg, x)[0]

    def far_down(x):
        # 'while (mDown());' — ends with one failing mDown => lockdown armed
        ext2 = K.ext_board_padded(cfg, x.occ)
        d = K.drop_distance(cfg, ext2, x.piece, x.rot, x.px, x.py)
        x = x.replace(
            py=x.py + d,
            drop_delay_time=jnp.where(d > 0, x.time_ms, x.drop_delay_time),
            # each successful mDown clears lockdown via dropDelay.reset, so
            # the final failing attempt re-arms the 400 ms countdown
            lockdown=jnp.where(d > 0, False, x.lockdown))
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
    key = jnp.where((key < 0) | (key > 10), 0, key)
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
    """GamePlay::seed (gamePlay.cpp:218-230): fresh streams, spawn two pieces,
    rerolling the bag while the first would be S/Z (unless the piece set is
    S/Z-only)."""
    v = v.replace(piece_key=piece_key, hole_key=hole_key,
                  piece_draws=I32(0), hole_draws=I32(0))
    v = _rander_reset(v)
    v, _ = _make_new_piece(cfg, v, tables)
    if not cfg.only_zs:
        def body(_, x):
            bad = (x.nextpiece == 2) | (x.nextpiece == 3)
            def reroll(y):
                y = _rander_reset(y)
                y, _ = _make_new_piece(cfg, y, tables)
                return y
            return jax.lax.cond(bad, reroll, lambda y: y, x)
        v = jax.lax.fori_loop(0, cfg.max_seed_rerolls, body, v)
    v, _ = _make_new_piece(cfg, v, tables)
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
    winner = jnp.max(jnp.where(alive, idxs, -1)).astype(I32)
    winner = jnp.where(alive_count > 1, I32(-1), winner)
    piece_key = jax.random.fold_in(key, 0)
    hole_key = jax.random.fold_in(key, 1)

    def per_player(i):
        v = jax.tree.map(lambda a: a[i], ps)
        v = _restart_round(cfg, v)
        return _seed_round(cfg, v, piece_key, hole_key, tables)

    views = [per_player(i) for i in range(Pn)]
    new_ps = jax.tree.map(lambda *xs: jnp.stack(xs), *views)
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
    others = jnp.arange(Pn) != sender
    return jnp.where(others, incoming + per, incoming)


def _get(ps, i):
    return jax.tree.map(lambda a: a[i], ps)


def _put(ps, i, view, pred):
    """Write view back into slot i of ps where pred (scalar bool) holds."""
    return jax.tree.map(
        lambda full, one: jnp.where(pred, full.at[i].set(one), full), ps, view)


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
        ps = _put(ps, i, v2, active)
        inc = _distribute(cfg, ps.incoming_lines, i, jnp.maximum(sent, 0))
        do_inc = active & (~died) & (sent > 0)
        ps = ps.replace(incoming_lines=jnp.where(do_inc, inc, ps.incoming_lines))
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
        v_out = jax.tree.map(lambda a, b: jnp.where(died, a, b), v2, v3)
        ps = _put(ps, i, v_out, active)
        inc = _distribute(cfg, ps.incoming_lines, i, jnp.maximum(sent, 0))
        do_inc = active & (~died) & (sent > 0)
        ps = ps.replace(incoming_lines=jnp.where(do_inc, inc, ps.incoming_lines))
        alive_count = alive_count + (active & (~died)).astype(I32)

    check_for_winner = cfg.n_players > 1
    over = (alive_count == 0) | (check_for_winner & (alive_count < 2))
    return state.replace(players=ps, round_over=over)


def make_phase_macro(cfg, state: EngineState, use, r, tr) -> EngineState:
    """make_actions with (r, t) macros; use[i] False == null action."""
    ps = state.players
    for i in range(cfg.n_players):
        v = _get(ps, i)
        active = (~v.dead) & use[i]
        v2 = apply_macro(cfg, v, r[i], tr[i])
        ps = _put(ps, i, v2, active)
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
        ps = _put(ps, i, v2, active)
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
    return jax.tree.map(lambda a, b: jnp.where(state.round_over, a, b), state, new)


@partial(jax.jit, static_argnums=(0,))
def step_keys(cfg: EngineConfig, state: EngineState, keys, dt,
              tables: Optional[RngTables] = None) -> EngineState:
    """One full engine tick with raw key sequences (press_key parity path)."""
    def run(s):
        s = make_phase_keys(cfg, s, keys)
        return finish_phase(cfg, s, dt, tables)
    new = run(state)
    return jax.tree.map(lambda a, b: jnp.where(state.round_over, a, b), state, new)
