"""Host-side replica of the reference RNG pipeline, used to precompute
uniform streams that are injected into the JAX engine for bit-exact parity
against the C++ oracle.

The reference draws floats via std::mt19937 + a hand-rolled
UniformRealDistribution (randomizer.h:7-34):

    dScale = (b - a) / ((T)(g.max() - g.min()) + (T)1)   # double arithmetic
    return (g() - g.min()) * dScale + m_a                # rounded to float

With a=0, b=1: (float)(2^32 - 1) rounds to 2^32; + 1.0f stays 2^32, so
dScale == 2^-32 exactly and the result is float32(u32 * 2^-32).
"""
from __future__ import annotations

import numpy as np


class MT19937:
    """Textbook MT19937, identical to std::mt19937 (init_genrand seeding)."""

    N, M = 624, 397
    MATRIX_A = 0x9908B0DF
    UPPER = 0x80000000
    LOWER = 0x7FFFFFFF

    def __init__(self, seed: int):
        self.mt = np.zeros(self.N, dtype=np.uint64)
        self.mt[0] = seed & 0xFFFFFFFF
        for i in range(1, self.N):
            self.mt[i] = (1812433253 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 30)) + i) & 0xFFFFFFFF
        self.idx = self.N

    def _generate(self):
        mt = self.mt
        for i in range(self.N):
            y = (mt[i] & self.UPPER) | (mt[(i + 1) % self.N] & self.LOWER)
            nxt = mt[(i + self.M) % self.N] ^ (y >> 1)
            if y & 1:
                nxt ^= self.MATRIX_A
            mt[i] = nxt
        self.idx = 0

    def next_u32(self) -> int:
        if self.idx >= self.N:
            self._generate()
        y = int(self.mt[self.idx])
        self.idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF


def uniform_stream(seed: int, n: int) -> np.ndarray:
    """First n outputs of UniformRealDistribution<float>(0,1)(mt19937(seed)).

    NB: the reference truncates seeds to short before seeding
    (randomizer.h:54-57 seedHole/seedPiece take short)."""
    g = MT19937(np.int16(seed).astype(np.uint32) & 0xFFFFFFFF)
    out = np.empty(n, dtype=np.float32)
    for i in range(n):
        out[i] = np.float32(np.float64(g.next_u32()) * 2.0 ** -32)
    return out
