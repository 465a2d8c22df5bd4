"""GF(p^2) quadratic extension vs host golden model."""

import random

from mp2_tpu.field import ext2
from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import P

rng = random.Random(7)
N = 64
A0 = [rng.randrange(P) for _ in range(N)]
A1 = [rng.randrange(P) for _ in range(N)]
B0 = [rng.randrange(P) for _ in range(N)]
B1 = [rng.randrange(P) for _ in range(N)]

A = ext2.from_u64_pair(A0, A1)
B = ext2.from_u64_pair(B0, B1)


def test_nonresidue():
    assert pow(7, (P - 1) // 2, P) == P - 1  # 7 is a non-residue


def test_mul():
    got0, got1 = ext2.to_u64_pair(ext2.mul(A, B))
    want = [ext2.host_mul((a0, a1), (b0, b1)) for a0, a1, b0, b1 in zip(A0, A1, B0, B1)]
    assert [(int(x), int(y)) for x, y in zip(got0, got1)] == want


def test_inv():
    got0, got1 = ext2.to_u64_pair(ext2.inv(A))
    want = [ext2.host_inv((a0, a1)) for a0, a1 in zip(A0, A1)]
    assert [(int(x), int(y)) for x, y in zip(got0, got1)] == want
    # a * a^-1 == 1
    prod = ext2.mul(A, ext2.inv(A))
    p0, p1 = ext2.to_u64_pair(prod)
    assert all(int(x) == 1 for x in p0) and all(int(y) == 0 for y in p1)


def test_pow():
    e = 12345
    got0, got1 = ext2.to_u64_pair(ext2.pow_const(A, e))
    want = [ext2.host_pow((a0, a1), e) for a0, a1 in zip(A0, A1)]
    assert [(int(x), int(y)) for x, y in zip(got0, got1)] == want


def test_base_embedding():
    base = gl.from_u64(A0)
    emb = ext2.from_base(base)
    prod = ext2.mul(emb, B)
    got0, got1 = ext2.to_u64_pair(prod)
    want = [ext2.host_mul((a0, 0), (b0, b1)) for a0, b0, b1 in zip(A0, B0, B1)]
    assert [(int(x), int(y)) for x, y in zip(got0, got1)] == want
