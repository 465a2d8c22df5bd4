"""Merkle-cap commitments over Poseidon2 (the prover's vector commitment).

A `MerkleTree` commits to a matrix of field elements: each row (leaf) is
sponge-hashed (or no-op padded if width <= 4), then binary-hashed up to a cap
of 2^cap_height digests.  Matches plonky2's MerkleTree/MerkleCap semantics
(hash_or_noop leaves, two_to_one internal nodes, cap as the commitment) so the
recursion layer's fixed-VK protocol carries over; zero-knowledge salts are
omitted (reference uses zero_knowledge = false configs).

The build is fully vectorized: one two_to_one over the whole level per step —
on TPU each level is a single fused VPU kernel over the batch.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF
from mp2_tpu.hash import poseidon2 as p2
from mp2_tpu.hash import poseidon2_host as p2h


class MerkleTree:
    """Device-side Merkle tree with cap.

    leaves: GF of shape (n, w); n a power of two.
    digest_levels[0]: (n, 4) leaf digests; last level: (2^cap_height, 4) cap.
    """

    def __init__(self, leaves: GF, cap_height: int = 0):
        n = leaves.shape[0]
        assert n & (n - 1) == 0 and n > 0, "leaf count must be a power of two"
        assert (1 << cap_height) <= n
        self.cap_height = cap_height
        self.leaves = leaves
        digests = p2.hash_or_noop(leaves)
        self.digest_levels: List[GF] = [digests]
        while digests.shape[0] > (1 << cap_height):
            left = digests[0::2]
            right = digests[1::2]
            digests = p2.two_to_one(left, right)
            self.digest_levels.append(digests)

    @classmethod
    def from_levels(cls, leaves: GF, digest_levels: List[GF],
                    cap_height: int) -> "MerkleTree":
        """Reconstruct a tree from precomputed digest levels (the fixed-
        column disk cache path) — skips every hash dispatch."""
        t = cls.__new__(cls)
        t.cap_height = cap_height
        t.leaves = leaves
        t.digest_levels = list(digest_levels)
        return t

    @property
    def cap(self) -> GF:
        return self.digest_levels[-1]

    def num_levels(self) -> int:
        return len(self.digest_levels) - 1

    def open(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side opening: returns (leaf_row, siblings[num_levels, 4])."""
        leaf = gl.to_u64(self.leaves[index])
        sibs = []
        idx = index
        for level in self.digest_levels[:-1]:
            sibs.append(gl.to_u64(level[idx ^ 1]))
            idx >>= 1
        return leaf, np.array(sibs, dtype=np.uint64)

    def open_batch(self, indices: Sequence[int]):
        return [self.open(i) for i in indices]


# --- host golden model ------------------------------------------------------


class HostMerkleTree:
    def __init__(self, leaves: Sequence[Sequence[int]], cap_height: int = 0):
        n = len(leaves)
        assert n & (n - 1) == 0 and n > 0
        self.cap_height = cap_height
        self.leaves = [list(row) for row in leaves]
        level = [p2h.hash_or_noop(row) for row in self.leaves]
        self.digest_levels = [level]
        while len(level) > (1 << cap_height):
            level = [
                p2h.two_to_one(level[i], level[i + 1]) for i in range(0, len(level), 2)
            ]
            self.digest_levels.append(level)

    @property
    def cap(self):
        return self.digest_levels[-1]


def verify_merkle_proof(
    leaf: Sequence[int],
    index: int,
    siblings: Sequence[Sequence[int]],
    cap: Sequence[Tuple[int, int, int, int]],
    depth: int = None,
) -> bool:
    """Host verification of an opened leaf against a cap.

    `depth` (when given) pins the expected sibling count: since hash_or_noop
    is the identity on <=4-wide leaves, an unchecked short path would let a
    leaf equal to a cap row verify with zero siblings.
    """
    if depth is not None and len(siblings) != depth:
        return False
    if (index >> len(siblings)) >= len(cap):
        return False
    digest = p2h.hash_or_noop([int(x) for x in leaf])
    idx = index
    for sib in siblings:
        sib = tuple(int(x) for x in sib)
        if idx & 1:
            digest = p2h.two_to_one(sib, digest)
        else:
            digest = p2h.two_to_one(digest, sib)
        idx >>= 1
    return tuple(digest) == tuple(cap[idx])
