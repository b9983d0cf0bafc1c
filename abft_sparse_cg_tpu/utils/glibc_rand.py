"""Bit-exact emulation of glibc's rand() (TYPE_3 additive generator).

The reference driver fills b with unseeded ``rand()/RAND_MAX``
(reference cg.cpp:70) — unseeded means srand(1), i.e. a fixed, fully
deterministic sequence.  Emulating it lets the parity tests hand our
solver the *identical* right-hand side the reference binary uses and
compare residual trajectories line by line (the BASELINE.json
"residual trajectory matches the reference" target).

Algorithm: glibc random_r with the default 128-byte state — a degree-31,
separation-3 additive-feedback generator seeded by a Lehmer LCG
(Schrage-factored 16807 mod 2^31-1), with the first 310 outputs
discarded; each output is the 32-bit sum shifted right once.
"""

from __future__ import annotations

import numpy as np

__all__ = ["glibc_rand", "glibc_rand_uniform", "GLIBC_RAND_MAX"]

GLIBC_RAND_MAX = 2147483647


def glibc_rand(n: int, seed: int = 1) -> np.ndarray:
    """First ``n`` outputs of glibc rand() after srand(seed)."""
    if seed == 0:
        seed = 1
    r = [0] * 34
    r[0] = seed & 0xFFFFFFFF
    for i in range(1, 31):
        hi, lo = divmod(r[i - 1], 127773)
        word = 16807 * lo - 2836 * hi
        if word < 0:
            word += GLIBC_RAND_MAX
        r[i] = word
    for i in range(31, 34):
        r[i] = r[i - 31]

    total = 34 + 310 + n
    vals = r + [0] * (total - 34)
    out = np.empty(n, dtype=np.uint32)
    j = 0
    for k in range(34, total):
        v = (vals[k - 31] + vals[k - 3]) & 0xFFFFFFFF
        vals[k] = v
        if k >= 34 + 310:
            out[j] = v >> 1
            j += 1
    return out


def glibc_rand_uniform(n: int, seed: int = 1) -> np.ndarray:
    """rand()/RAND_MAX sequence — the reference's b-vector entries."""
    return glibc_rand(n, seed).astype(np.float64) / GLIBC_RAND_MAX
