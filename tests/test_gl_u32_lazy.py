"""Lazy (non-canonical) u32-pair dialect: congruence over the FULL u64
input range, including values >= p (the whole point of lazy mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mp2_tpu.ops import gl_u32 as K

P = K.P


def _pairs(vals):
    v = np.asarray(vals, dtype=np.uint64)
    return (
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
    )


def _u64(lo, hi):
    return np.asarray(lo, dtype=np.uint64) | (
        np.asarray(hi, dtype=np.uint64) << np.uint64(32)
    )


EDGE = [0, 1, 2, P - 1, P, P + 1, (1 << 64) - 1, (1 << 64) - (1 << 32),
        0xFFFFFFFF, 1 << 32, 1 << 63, P >> 1, 0xFFFFFFFF00000000]


def _sample(rng, n):
    a = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    return np.concatenate([np.array(EDGE, dtype=np.uint64), a])


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_lazy_binops_congruent(op):
    rng = np.random.default_rng(7)
    a = _sample(rng, 4096)
    b = np.flip(_sample(rng, 4096))
    alo, ahi = _pairs(a)
    blo, bhi = _pairs(b)
    fn = {"add": K.add_lazy, "sub": K.sub_lazy, "mul": K.mul_lazy}[op]
    lo, hi = fn(alo, ahi, blo, bhi)
    got = _u64(lo, hi) % np.uint64(P)
    ref = {
        "add": (a.astype(object) + b.astype(object)) % P,
        "sub": (a.astype(object) - b.astype(object)) % P,
        "mul": (a.astype(object) * b.astype(object)) % P,
    }[op]
    assert np.array_equal(got.astype(object), ref)


def test_lazy_all_edge_pairs():
    """Every edge x edge combination through all three ops."""
    e = np.array(EDGE, dtype=np.uint64)
    a = np.repeat(e, len(e))
    b = np.tile(e, len(e))
    alo, ahi = _pairs(a)
    blo, bhi = _pairs(b)
    for op, fn in [("add", K.add_lazy), ("sub", K.sub_lazy),
                   ("mul", K.mul_lazy)]:
        lo, hi = fn(alo, ahi, blo, bhi)
        got = _u64(lo, hi) % np.uint64(P)
        sign = {"add": 1, "sub": -1}.get(op)
        if op == "mul":
            ref = (a.astype(object) * b.astype(object)) % P
        else:
            ref = (a.astype(object) + sign * b.astype(object)) % P
        assert np.array_equal(got.astype(object), ref), op


def test_sq_lazy_congruent():
    """sq_lazy (3-wide-mul squaring) == mul_lazy(x, x) semantics over the
    full u64 range + all edges."""
    rng = np.random.default_rng(13)
    a = _sample(rng, 8192)
    lo, hi = K.sq_lazy(*_pairs(a))
    got = _u64(lo, hi) % np.uint64(P)
    ref = (a.astype(object) * a.astype(object)) % P
    assert np.array_equal(got.astype(object), ref)


def test_exp7_lazy_congruent():
    rng = np.random.default_rng(17)
    a = _sample(rng, 4096)
    lo, hi = K.exp7_lazy(*_pairs(a))
    got = _u64(lo, hi) % np.uint64(P)
    ref = np.array([pow(int(v) % P, 7, P) for v in a], dtype=object)
    assert np.array_equal(got.astype(object), ref)


def test_canon_lazy():
    rng = np.random.default_rng(3)
    a = _sample(rng, 4096)
    lo, hi = K.canon_lazy(*_pairs(a))
    got = _u64(lo, hi)
    ref = a.astype(object) % P
    assert np.array_equal(got.astype(object), ref)
    assert got.max() < P


def test_mul_pow2_lazy_full_exponent_range():
    rng = np.random.default_rng(11)
    x = _sample(rng, 2048)
    n = len(x)
    for t_block in range(0, 192, 8):
        ts = rng.integers(t_block, min(t_block + 8, 192), size=n,
                          dtype=np.uint32)
        lo, hi = K.mul_pow2_lazy(*_pairs(x), jnp.asarray(ts))
        got = _u64(lo, hi) % np.uint64(P)
        ref = np.array(
            [(int(v) * pow(2, int(t), P)) % P for v, t in zip(x, ts)],
            dtype=object,
        )
        assert np.array_equal(got.astype(object), ref), f"block {t_block}"


def test_mul_pow2_lazy_edges():
    e = np.array(EDGE, dtype=np.uint64)
    for t in [0, 1, 31, 32, 33, 47, 48, 63, 64, 65, 95, 96, 97, 127, 128,
              155, 156, 191]:
        ts = jnp.full(len(e), t, dtype=jnp.uint32)
        lo, hi = K.mul_pow2_lazy(*_pairs(e), ts)
        got = _u64(lo, hi) % np.uint64(P)
        ref = np.array([(int(v) * pow(2, t, P)) % P for v in e], dtype=object)
        assert np.array_equal(got.astype(object), ref), f"t={t}"
