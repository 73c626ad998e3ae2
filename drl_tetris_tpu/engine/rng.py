"""Raw-threefry RNG helpers, bit-exact with ``jax.random`` but expressed
directly on (2,) uint32 key data via the ``threefry2x32`` primitive.

Why this exists: the engine tick must run both as plain XLA (vmapped
``step.py``) and inside the Pallas whole-rollout kernel
(``pallas_tick.py``).  Mosaic lowers the ``threefry2x32`` primitive itself,
but NOT the higher-level ``random_split`` / ``random_fold_in`` primitives
that ``jax.random.split`` / ``fold_in`` bind (measured: they fail with
"Unimplemented primitive ... random_split").  These helpers reproduce the
partitionable-threefry semantics of jax.random (jax._src/prng.py:
``_threefry_split_foldlike``, ``_threefry_random_bits_partitionable``,
``threefry_fold_in``) out of bare primitive binds, so the SAME engine code
produces the SAME streams under jit, vmap, and pallas_call.  Equivalence
with jax.random is asserted bit-for-bit in tests/test_pallas_tick.py.

Reference RNG being modeled: the C++ engine's mt19937 uniform draws
(randomizer.cpp); parity tests inject host-precomputed mt19937 tables
instead (step.py RngTables), so nothing here affects oracle parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax._src.prng import threefry2x32_p

_U32 = jnp.uint32


def _bind(k1, k2, c1, c2):
    return threefry2x32_p.bind(k1, k2, c1, c2)


def fold_in(key: jnp.ndarray, data) -> jnp.ndarray:
    """== key_data(jax.random.fold_in(key, data)) for uint32 data.

    threefry_fold_in = threefry_2x32(key, threefry_seed(data)); for 32-bit
    data the seed pair is (0, data)."""
    d = jnp.asarray(data).astype(_U32)
    o1, o2 = _bind(key[0], key[1], jnp.zeros_like(d), d)
    return jnp.stack([o1, o2])


def split2(key: jnp.ndarray) -> jnp.ndarray:
    """== key_data(jax.random.split(key)): (2, 2) uint32.

    Partitionable split draws iota_2x32 counts for shape (2,):
    hi words [0, 0], lo words [0, 1], and stacks the two output words
    along the last axis."""
    c1 = jnp.zeros((2,), _U32)
    c2 = jnp.arange(2, dtype=_U32)
    s1, s2 = _bind(key[0], key[1], c1, c2)
    return jnp.stack([s1, s2], axis=1)


def random_bits(key: jnp.ndarray, shape=()) -> jnp.ndarray:
    """== jax.random.bits(key, shape, uint32) under partitionable threefry:
    bits(i) = hash(hi32(i)) ^ ... — for sizes < 2**32 the hi iota word is 0
    and the result is hash_word1 ^ hash_word2 of the lo iota."""
    n = 1
    for d in shape:
        n *= d
    if shape:
        # broadcasted_iota: Mosaic rejects plain 1D iota inside kernels
        c2 = jax.lax.broadcasted_iota(_U32, (n, 1), 0).reshape(shape)
    else:
        c2 = _U32(0)
    c1 = jnp.zeros_like(c2)
    b1, b2 = _bind(key[0], key[1], c1, c2)
    return b1 ^ b2


def uniform01(key: jnp.ndarray, shape=()) -> jnp.ndarray:
    """== jax.random.uniform(key, shape, float32): mantissa-fill trick
    (jax._src/random.py::_uniform)."""
    bits = random_bits(key, shape)
    fb = (bits >> _U32(9)) | _U32(0x3F800000)
    return jax.lax.bitcast_convert_type(fb, jnp.float32) - jnp.float32(1)


def randbelow(key: jnp.ndarray, n: int, shape=()) -> jnp.ndarray:
    """Uniform int32 in [0, n) — NOT jax.random.randint's rejection-free
    scheme (bias < 2**-27 for the tiny n used here; action sampling only,
    never parity-relevant)."""
    return (random_bits(key, shape) % _U32(n)).astype(jnp.int32)
