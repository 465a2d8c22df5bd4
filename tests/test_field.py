"""Goldilocks field: device arithmetic vs python-int golden model.

Mirrors the reference's gadget-unit-test strategy (SURVEY.md §4 tier 1):
every op checked against an out-of-circuit reference computation, with
adversarial edge cases around the 2^32 boundaries.
"""

import random

import numpy as np
import pytest

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF, P

EDGE = [
    0,
    1,
    2,
    0xFFFFFFFF,  # 2^32 - 1 (= epsilon)
    0x100000000,  # 2^32
    0x100000001,
    P - 1,
    P - 2,
    P // 2,
    0xFFFFFFFE00000002,
    0x8000000000000000,
    0x7FFFFFFFFFFFFFFF,
]


def _rand_elems(n, seed=0):
    rng = random.Random(seed)
    vals = list(EDGE)
    while len(vals) < n:
        vals.append(rng.randrange(P))
    return vals[:n]


N = 256
A_VALS = _rand_elems(N, seed=1)
B_VALS = _rand_elems(N, seed=2)
# pair every edge case with every other edge case too
A_VALS[: len(EDGE) * len(EDGE)] = [a for a in EDGE for _ in EDGE][: N]
B_VALS[: len(EDGE) * len(EDGE)] = [b for _ in EDGE for b in EDGE][: N]

A = gl.from_u64(A_VALS)
B = gl.from_u64(B_VALS)


def test_roundtrip():
    assert [int(v) for v in gl.to_u64(A)] == [v % P for v in A_VALS]


def test_add():
    got = gl.to_u64(gl.add(A, B))
    want = [(a + b) % P for a, b in zip(A_VALS, B_VALS)]
    assert [int(v) for v in got] == want


def test_sub():
    got = gl.to_u64(gl.sub(A, B))
    want = [(a - b) % P for a, b in zip(A_VALS, B_VALS)]
    assert [int(v) for v in got] == want


def test_neg():
    got = gl.to_u64(gl.neg(A))
    want = [(-a) % P for a in A_VALS]
    assert [int(v) for v in got] == want


def test_mul():
    got = gl.to_u64(gl.mul(A, B))
    want = [(a * b) % P for a, b in zip(A_VALS, B_VALS)]
    assert [int(v) for v in got] == want


def test_sqr():
    got = gl.to_u64(gl.sqr(A))
    want = [(a * a) % P for a in A_VALS]
    assert [int(v) for v in got] == want


def test_exp7():
    got = gl.to_u64(gl.exp7(A))
    want = [pow(a, 7, P) for a in A_VALS]
    assert [int(v) for v in got] == want


def test_pow_const():
    for e in [0, 1, 2, 3, 5, 7, 64, P - 2, (P - 1) // 2]:
        got = gl.to_u64(gl.pow_const(A, e))
        want = [pow(a, e, P) if a else (1 if e == 0 else 0) for a in A_VALS]
        assert [int(v) for v in got] == want, f"exponent {e}"


def test_inv():
    got = gl.to_u64(gl.inv(A))
    want = [pow(a, P - 2, P) if a else 0 for a in A_VALS]
    assert [int(v) for v in got] == want


def test_mul_add_const():
    c = 0xDEADBEEF12345678
    got = gl.to_u64(gl.mul_const(A, c))
    want = [(a * c) % P for a in A_VALS]
    assert [int(v) for v in got] == want
    got = gl.to_u64(gl.add_const(A, c))
    want = [(a + c) % P for a in A_VALS]
    assert [int(v) for v in got] == want


def test_sum_dot():
    got = int(gl.to_u64(gl.sum_axis(A, axis=0)))
    assert got == sum(A_VALS) % P
    got = int(gl.to_u64(gl.dot(A, B, axis=0)))
    assert got == sum(a * b for a, b in zip(A_VALS, B_VALS)) % P


def test_generator_orders():
    # 7 generates the full multiplicative group: 7^((p-1)/q) != 1 for each
    # prime q | p-1.  p-1 = 2^32 * 3 * 5 * 17 * 257 * 65537.
    factors = [2, 3, 5, 17, 257, 65537]
    prod = 1
    for q in factors:
        assert pow(7, (P - 1) // q, P) != 1
    # two-adic generator has exact order 2^32
    w = gl.POWER_OF_TWO_GENERATOR
    assert pow(w, 1 << 32, P) == 1
    assert pow(w, 1 << 31, P) != 1


def test_select_equal():
    cond = np.array([i % 2 == 0 for i in range(N)])
    got = gl.to_u64(gl.select(cond, A, B))
    want = [a if c else b for c, a, b in zip(cond, A_VALS, B_VALS)]
    assert [int(v) for v in got] == [v % P for v in want]
    eq = np.asarray(gl.equal(A, A))
    assert eq.all()


def test_jit_vmap():
    import jax

    f = jax.jit(lambda a, b: gl.add(gl.mul(a, b), a))
    got = gl.to_u64(f(A, B))
    want = [(a * b + a) % P for a, b in zip(A_VALS, B_VALS)]
    assert [int(v) for v in got] == want

    g = jax.vmap(gl.mul)
    got = gl.to_u64(g(A, B))
    want = [(a * b) % P for a, b in zip(A_VALS, B_VALS)]
    assert [int(v) for v in got] == want
