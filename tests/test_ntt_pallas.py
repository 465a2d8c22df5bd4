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


@pytest.mark.parametrize("inverse", [False, True])
def test_packed_matches_unpacked(inverse, monkeypatch):
    """The packed-pair stage kernel (one twiddle mul per two rows,
    MP2_NTT_PACKED=1 opt-in) is bit-identical to the per-row lazy kernel.

    Measured 2026-08-20 on TPU v5e: NO wall-time win over the per-row
    kernel (5.25 vs 5.20 ms marginal for the 2^22 pipeline) — the stage
    cost is not bounded by the twiddle multiplies (forcing generic muls
    everywhere via MP2_NTT_NO_POW2 is also flat), so halving them does
    not help; kept opt-in for documentation.  Tested at a single log6
    pass: the interpreter wedges on the packed kernel for n <= 32 lanes
    (Mosaic-interpret pathology, packed kernel only)."""
    from mp2_tpu.ops import ntt_pallas as npz

    rng = np.random.default_rng(3)
    log_n = 6
    lo = jnp.asarray(rng.integers(0, 2**32, size=(16, 64), dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 2**31, size=(16, 64), dtype=np.uint32))
    tables = npz._tables(log_n, inverse)
    monkeypatch.setenv("MP2_NTT_PACKED", "0")
    want_lo, want_hi = (
        np.asarray(v)
        for v in npz._run_fused(lo, hi, log_n, tables, None,
                                inverse=inverse, apply_scale=inverse)
    )
    monkeypatch.setenv("MP2_NTT_PACKED", "1")
    got_lo, got_hi = (
        np.asarray(v)
        for v in npz._run_fused(lo, hi, log_n, tables, None,
                                inverse=inverse, apply_scale=inverse)
    )
    assert (got_lo == want_lo).all() and (got_hi == want_hi).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_full_matches_xla_small(inverse):
    """ntt_full (single fused kernel, natural-order in/out, in-VMEM
    bitrev) == the XLA butterfly path on the mid-size shape class."""
    from mp2_tpu.ops.ntt_pallas import ntt_full

    rng = np.random.default_rng(11)
    n = 1 << 9
    xv = jnp.asarray(rng.integers(0, gl.P, size=(3, n), dtype=np.uint64))
    import os

    os.environ["MP2_NO_PALLAS"] = "1"
    try:
        ntt_mod._pallas_ntt_state.update(checked=True, ok=False)
        want = np.asarray(ntt_mod._ntt_small(GF(xv), inverse).v)
    finally:
        del os.environ["MP2_NO_PALLAS"]
        ntt_mod._pallas_ntt_state.update(checked=False, ok=False)
    got = np.asarray(ntt_full(xv, inverse))
    assert (got == want).all()
