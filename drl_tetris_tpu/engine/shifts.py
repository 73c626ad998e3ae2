"""Static shifts / prefix sums along a small leading axis, with two
lowerings sharing one call site.

The engine's per-game kernels shift (H,)- and (CAP,)-sized vectors by
static amounts: line-clear compaction (kernels.clear_lines), the garbage
row insert (kernels.add_garbage_line), the garbage FIFO pop
(step._shift_left), and Hillis-Steele prefix sums (step._prefix_sum).
In plain XLA these are `jnp.concatenate` of slices — free after fusion.
Inside the Pallas whole-rollout kernel (engine/pallas_tick.py) the same
concats reach Mosaic as `tpu.concatenate` over sliced operands whose
vector layouts carry different sublane/lane offsets, which Mosaic rejects
("result/input offset mismatch on non-concat dimension" — the exact
BENCH_r02 failure was the 21+1 concat of add_garbage_line under the
games-minor layout).

The Pallas lowering here instead expresses every static shift as a matmul
with a constant 0/1 shift matrix in float32:

    shift_down(x, k)[i] = x[i-k]   ==  S_k @ x,   S_k[i, j] = [j == i-k]
    prefix_sum(x)                  ==  L   @ x,   L[i, j]   = [j <= i]

which vmaps over the lane-resident game batch into ONE small MXU matmul
(L x L) @ (L x N) per call — no sliced-operand layouts at all, and the
hottest per-tick ops move off the VPU onto the idle MXU.  Exactness: all
shifted values are small integers (board rows < 2^width, timers in ms,
row counts), far below the 2^24 float32-exact integer range; the matmul
accumulates at most L <= 64 terms of which exactly one is nonzero per
output row.  `require_f32_exact(cfg)` guards the assumption — the Pallas
kernel builder calls it before tracing and rejects widths > 24.

Mode selection is a module flag set by pallas_tick around the kernel
trace (`with mxu_shifts(): pl.pallas_call(...)`): tracing is synchronous,
and any retrace happens inside the jitted `_rollout` body, which
re-enters the context.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_MXU_MODE = False

# Exact-integer ceiling for the float32 matmul path.  Every value routed
# through these helpers in the engine is a bitboard row (< 2^width),
# a millisecond timer, or a small count; width <= 24 keeps rows exact.
_F32_EXACT = 1 << 24


def require_f32_exact(cfg) -> None:
    """Reject engine configs whose bitboard rows can exceed the f32-exact
    integer range (2^24).  EngineConfig allows width up to 25; the matmul
    lowering would silently round a full 25-wide row, so the Pallas path
    refuses it up front rather than corrupting state."""
    if (1 << cfg.width) - 1 >= _F32_EXACT:
        raise ValueError(
            f"mxu_shifts f32 matmul lowering requires width <= 24 "
            f"(rows < 2^24 stay float32-exact); got width={cfg.width}. "
            f"Use the XLA engine path for wider boards.")


@contextlib.contextmanager
def mxu_shifts():
    """Trace-scope marker: lower shifts as MXU matmuls (Pallas kernels)."""
    global _MXU_MODE
    prev = _MXU_MODE
    _MXU_MODE = True
    try:
        yield
    finally:
        _MXU_MODE = prev


def in_mxu_mode() -> bool:
    return _MXU_MODE


def _matmul_apply(mat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(L, L) 0/1 matrix applied along x's leading axis, exact."""
    dt = x.dtype
    xf = x
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        # Mosaic has no uint->float convert; values are < 2^24 so the
        # int32 detour is lossless.
        xf = xf.astype(jnp.int32)
    y = jnp.matmul(mat, xf.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    if jnp.issubdtype(dt, jnp.integer):
        # round-trip through int32: f32 -> uint32 of large values is
        # implementation-defined on some backends; all values are exact
        # small non-negatives so i32 is lossless.
        return y.astype(jnp.int32).astype(dt)
    return y.astype(dt)


def _clamp01(d: jnp.ndarray) -> jnp.ndarray:
    """min(max(d, 0), 1) -> f32.  Pure integer arithmetic: no bool masks
    anywhere (Mosaic cannot transpose/broadcast i1 vectors), and built from
    in-kernel iotas (Pallas kernels may not capture baked array constants;
    XLA constant-folds the whole matrix outside Pallas)."""
    return jnp.minimum(jnp.maximum(d, 0), 1).astype(jnp.float32)


def _iotas(n: int):
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ii, jj


def _shift_mat(n: int, k: int) -> jnp.ndarray:
    """S[i, j] = 1 iff j == i - k (k > 0 shifts toward higher indices)."""
    ii, jj = _iotas(n)
    return _clamp01(1 - jnp.abs(jj - ii + k))


def shift_down(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = x[i-k] for i >= k, zero below: concat([zeros(k), x[:-k]])."""
    n = x.shape[0]
    if k == 0:
        return x
    if k >= n:
        return jnp.zeros_like(x)
    if _MXU_MODE:
        return _matmul_apply(_shift_mat(n, k), x)
    return jnp.concatenate(
        [jnp.zeros((k,) + x.shape[1:], x.dtype), x[:-k]])


def shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = x[i+k] for i < n-k, zero above: concat([x[k:], zeros(k)])."""
    n = x.shape[0]
    if k == 0:
        return x
    if k >= n:
        return jnp.zeros_like(x)
    if _MXU_MODE:
        return _matmul_apply(_shift_mat(n, -k), x)
    return jnp.concatenate(
        [x[k:], jnp.zeros((k,) + x.shape[1:], x.dtype)])


def prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the leading axis."""
    n = x.shape[0]
    if _MXU_MODE:
        ii, jj = _iotas(n)
        return _matmul_apply(_clamp01(ii - jj + 1), x)
    s = 1
    while s < n:
        x = x + jnp.concatenate(
            [jnp.zeros((s,) + x.shape[1:], x.dtype), x[:-s]])
        s *= 2
    return x


def suffix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive suffix sum along the leading axis."""
    n = x.shape[0]
    if _MXU_MODE:
        ii, jj = _iotas(n)
        return _matmul_apply(_clamp01(jj - ii + 1), x)
    s = 1
    while s < n:
        x = x + jnp.concatenate(
            [x[s:], jnp.zeros((s,) + x.shape[1:], x.dtype)])
        s *= 2
    return x
