"""Poseidon2 parameter tables for Goldilocks, width 12.

The reference pins its hasher to `Poseidon2GoldilocksConfig` from the
`poseidon2_plonky2` crate (/root/reference/mp2-common/src/lib.rs:36-47).  That
crate's constant tables are not redistributable inside this build environment
(zero egress), so this module generates deterministic, nothing-up-my-sleeve
tables via SHA-256 counter-mode rejection sampling.  The *structure* (widths,
round counts, matrix shapes, s-box) matches Poseidon2 for Goldilocks t=12
exactly; to obtain bit-exact interop with the reference, drop the canonical
tables into `load_table()` — every consumer reads through this module.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from mp2_tpu.field.goldilocks import P

WIDTH = 12
RATE = 8
CAPACITY = 4
SBOX_DEGREE = 7
ROUNDS_F = 8  # external (full) rounds, split 4 + 4
ROUNDS_P = 22  # internal (partial) rounds

_DOMAIN = b"mp2-tpu/poseidon2/goldilocks/t12/v1"


def _sample_field_elements(tag: bytes, count: int) -> list[int]:
    """Uniform elements of [0, p) via SHA-256(domain || tag || counter),
    rejection-sampling 8-byte draws >= p."""
    out = []
    counter = 0
    while len(out) < count:
        h = hashlib.sha256(
            _DOMAIN + b"/" + tag + b"/" + counter.to_bytes(8, "little")
        ).digest()
        counter += 1
        for off in range(0, 32, 8):
            v = int.from_bytes(h[off : off + 8], "little")
            if v < P and len(out) < count:
                out.append(v)
    return out


@lru_cache(maxsize=None)
def load_table():
    """Returns (external_rc, internal_rc, internal_diag):

    external_rc: ROUNDS_F lists of WIDTH round constants
    internal_rc: ROUNDS_P round constants (lane 0 only)
    internal_diag: WIDTH diagonal entries mu_i of the internal matrix
        M_I[i][j] = 1 + (i == j) * (mu_i - 1)
    """
    ext = _sample_field_elements(b"external-rc", ROUNDS_F * WIDTH)
    external_rc = [ext[r * WIDTH : (r + 1) * WIDTH] for r in range(ROUNDS_F)]
    internal_rc = _sample_field_elements(b"internal-rc", ROUNDS_P)
    # Internal diagonal: mu_i must keep M_I invertible & secure; sampled
    # uniformly (prob. of degenerate matrix ~ 2^-64).
    internal_diag = _sample_field_elements(b"internal-diag", WIDTH)
    return external_rc, internal_rc, internal_diag


# The 4x4 block of the external matrix (Poseidon2 paper, eq. for M_E):
# M_E = circ(2*M4, M4, M4) over three 4-lane chunks.
M4 = [
    [5, 7, 1, 3],
    [4, 6, 1, 1],
    [1, 3, 5, 7],
    [1, 1, 4, 6],
]
