"""MXU (matmul) NTT: bit-exactness vs the butterfly pipeline + host model.

The int8 dot is exact integer arithmetic on every backend, so the CPU run
checks the identical math that runs on the TPU systolic array.
"""

import numpy as np
import pytest

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF, P
from mp2_tpu.ops.ntt_mxu import ntt_mxu_flat, radix_plan
from mp2_tpu.prover.ntt import host_ntt, ntt


def _rand(rng, shape):
    return rng.integers(0, P, size=shape, dtype=np.uint64)


@pytest.mark.parametrize("log_n", [4, 8, 10, 13])
@pytest.mark.parametrize("inverse", [False, True])
def test_matches_butterfly(log_n, inverse):
    rng = np.random.default_rng(7 + log_n)
    x = _rand(rng, (3, 1 << log_n))
    want = gl.to_u64(ntt(GF(x), inverse=inverse))
    got = np.asarray(ntt_mxu_flat(x, inverse=inverse))
    assert (got == want).all()


def test_matches_host_golden():
    rng = np.random.default_rng(1)
    n = 256
    x = _rand(rng, (1, n))
    want = np.array(host_ntt([int(v) for v in x[0]]), dtype=np.uint64)
    got = np.asarray(ntt_mxu_flat(x))
    assert (got[0] == want).all()


def test_extreme_values_all_byte_planes():
    # p-1 has every byte saturated; also 0 and single-bit values
    n = 1 << 10
    x = np.full((1, n), P - 1, dtype=np.uint64)
    x[0, ::3] = 0
    x[0, 1::5] = 1 << 63
    want = gl.to_u64(ntt(GF(x)))
    got = np.asarray(ntt_mxu_flat(x))
    assert (got == want).all()


def test_roundtrip():
    rng = np.random.default_rng(3)
    x = _rand(rng, (2, 1 << 9))
    back = np.asarray(ntt_mxu_flat(np.asarray(ntt_mxu_flat(x)), inverse=True))
    assert (back == x).all()


def test_explicit_plans_agree():
    # same transform under different stage factorizations
    rng = np.random.default_rng(4)
    x = _rand(rng, (1, 1 << 12))
    a = np.asarray(ntt_mxu_flat(x, plan=(6, 6)))
    b = np.asarray(ntt_mxu_flat(x, plan=(4, 4, 4)))
    c = np.asarray(ntt_mxu_flat(x, plan=(8, 4)))
    want = gl.to_u64(ntt(GF(x)))
    assert (a == want).all() and (b == want).all() and (c == want).all()


def test_radix_plan_shapes():
    assert radix_plan(22) == (8, 7, 7)
    assert radix_plan(16) == (8, 8)
    assert radix_plan(12) == (6, 6)
    assert radix_plan(8) == (8,)
    assert sum(radix_plan(27)) == 27
