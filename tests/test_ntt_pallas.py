"""Pallas four-step NTT kernels in interpret mode vs the XLA reference:
the default fused pipeline and the transpose-fused variant (all matrix
transposes inside the kernels) must both match bit-for-bit."""

import numpy as np
import pytest

import jax.numpy as jnp

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF
from mp2_tpu.prover import ntt as ntt_mod

LOG_N = 10  # n1 = n2 = 32: several tiles per pass at TILE_R=8


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 1 << LOG_N
    return jnp.asarray(rng.integers(0, gl.P, size=(2, n), dtype=np.uint64))


def _xla_reference(xv, inverse):
    return ntt_mod._ntt_four_step_xla(GF(xv), inverse).v


@pytest.mark.parametrize("inverse", [False, True])
def test_fused_matches_xla(data, inverse):
    from mp2_tpu.ops.ntt_pallas import ntt_four_step_fused

    want = np.asarray(_xla_reference(data, inverse))
    got = np.asarray(ntt_four_step_fused(data, inverse))
    assert (got == want).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_transpose_fused_matches_xla(data, inverse):
    from mp2_tpu.ops.ntt_pallas import ntt_four_step_fused_t

    want = np.asarray(_xla_reference(data, inverse))
    got = np.asarray(ntt_four_step_fused_t(data, inverse))
    assert (got == want).all()


def test_roundtrip_transpose_fused(data):
    from mp2_tpu.ops.ntt_pallas import ntt_four_step_fused_t

    fwd = ntt_four_step_fused_t(data, False)
    back = np.asarray(ntt_four_step_fused_t(fwd, True))
    assert (back == np.asarray(data)).all()
