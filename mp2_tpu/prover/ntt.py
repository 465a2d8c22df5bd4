"""Number-theoretic transform over Goldilocks (radix-2, vectorized).

The prover's hot loop: polynomial <-> evaluation conversions and low-degree
extensions onto FRI cosets (role of plonky2's `fft`/`coset_fft` in the
reference's layer 0).  Goldilocks has 2-adicity 32, so sizes to 2^32 exist;
practical circuit sizes are 2^12..2^22.

Algorithm: iterative DIT with one bit-reversal gather up front, then log2(n)
stages of contiguous-half butterflies expressed as reshapes — XLA lowers each
stage to fused VPU ops with no scatter/gather.  Twiddles are compile-time
constants per (n, stage).  Extension-field (GF(p^2)) vectors transform
componentwise (the NTT is GF(p)-linear and twiddles are base-field).

For the sharded multi-chip path (2^22+) see mp2_tpu.parallel and the Pallas
kernel in mp2_tpu.ops.ntt_pallas.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.ext2 import GF2
from mp2_tpu.field.goldilocks import GF, P, POWER_OF_TWO_GENERATOR


@lru_cache(maxsize=None)
def _root_of_unity(log_n: int) -> int:
    """Primitive 2^log_n-th root of unity (canonical tower from the 2^32
    generator, matching plonky2's primitive_root_of_unity)."""
    assert 0 <= log_n <= 32
    g = POWER_OF_TWO_GENERATOR
    for _ in range(32 - log_n):
        g = g * g % P
    return g


@lru_cache(maxsize=None)
def _bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Twiddle tables: for stage s (1-based), w_{2^s}^j for j < 2^(s-1)."""
    tables = []
    for s in range(1, log_n + 1):
        w = _root_of_unity(s)
        if inverse:
            w = pow(w, P - 2, P)
        half = 1 << (s - 1)
        tw = np.empty(half, dtype=np.uint64)
        cur = 1
        for j in range(half):
            tw[j] = cur
            cur = cur * w % P
        tables.append(tw)
    return tables


import jax
from functools import partial

# Above this size, use the four-step (Bailey) decomposition: two passes of
# small contiguous transforms + a twiddle pass + transposes — far friendlier
# to VMEM tiling than 22 strided butterfly stages over HBM.
_FOUR_STEP_MIN_LOG = 15


@partial(jax.jit, static_argnames=("inverse",))
def ntt(x: GF, inverse: bool = False) -> GF:
    """Transform along the last axis (length must be a power of two)."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if log_n >= _FOUR_STEP_MIN_LOG:
        return _ntt_four_step(x, inverse)
    return _ntt_small(x, inverse)


_pallas_ntt_state = {"checked": False, "ok": False}


def _pallas_ntt_available() -> bool:
    import os

    if _pallas_ntt_state["checked"]:
        return _pallas_ntt_state["ok"]
    _pallas_ntt_state["checked"] = True
    if os.environ.get("MP2_NO_PALLAS"):
        _pallas_ntt_state["ok"] = False
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    _pallas_ntt_state["ok"] = plat not in ("cpu",)
    return _pallas_ntt_state["ok"]


def _ntt_small(x: GF, inverse: bool) -> GF:
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if n == 1:
        return x
    batch = x.shape[:-1]

    if n >= 512 and _pallas_ntt_available():
        try:
            if n <= (1 << 14):
                # single fused kernel: in-VMEM bitrev (no HBM gather) +
                # lazy packed stages (ops/ntt_pallas.ntt_full)
                from mp2_tpu.ops.ntt_pallas import ntt_full

                out = ntt_full(x.v.reshape(-1, n), inverse)
                return GF(out.reshape(batch + (n,)))
            from mp2_tpu.ops.ntt_pallas import ntt_stages_bitrev_input

            xr = gl.take(x, _bitrev_indices(log_n), axis=-1)
            flat = xr.v.reshape(-1, n)
            out = ntt_stages_bitrev_input(flat, inverse)
            return GF(out.reshape(batch + (n,)))
        except Exception:
            _pallas_ntt_state["ok"] = False  # fall back permanently

    x = gl.take(x, _bitrev_indices(log_n), axis=-1)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        v = x.reshape(batch + (n // m, 2, half))
        e = v[..., 0, :]
        o = v[..., 1, :]
        tw = gl.from_u64(_stage_twiddles(log_n, inverse)[s - 1])
        t = gl.mul(o, tw)
        x = gl.concat([gl.add(e, t), gl.sub(e, t)], axis=-1).reshape(batch + (n,))
    if inverse:
        x = gl.mul_const(x, pow(n, P - 2, P))
    return x


@lru_cache(maxsize=None)
def _four_step_twiddles(log_n: int, inverse: bool) -> np.ndarray:
    """w^(i*j) table of shape (n1, n2) for the middle twiddle pass."""
    log1 = log_n // 2
    log2 = log_n - log1
    n1, n2 = 1 << log1, 1 << log2
    w = _root_of_unity(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    out = np.empty((n1, n2), dtype=np.uint64)
    row = [1] * n2
    for i in range(n1):
        if i == 0:
            row = [1] * n2
        else:
            wi = pow(w, i, P)
            cur = 1
            row = []
            for j in range(n2):
                row.append(cur)
                cur = cur * wi % P
        out[i] = row
    return out


def _ntt_four_step(x: GF, inverse: bool) -> GF:
    """Bailey: view n = n1*n2 as (n1, n2) row-major.

    On TPU the whole decomposition runs as the FUSED pallas pipeline
    (ops/ntt_pallas.ntt_four_step_fused): two in-VMEM kernels (bitrev +
    stages, mid twiddle fused into pass 1) linked by u32-plane transposes.
    """
    if _pallas_ntt_available():
        import os as _os

        from mp2_tpu.ops.ntt_pallas import (
            ntt_four_step_fused,
            ntt_four_step_fused_t,
        )

        variants = [ntt_four_step_fused]
        if _os.environ.get("MP2_NTT_MXU"):
            # opt-in int8 systolic-array formulation (ops/ntt_mxu):
            # bit-exact vs the butterfly pipeline (tests/test_ntt_mxu.py)
            # but currently slower on v5e (31 ms vs 9.6 ms device time:
            # XLA's s8 dot delivers ~70-80 TOPS and the u64-emulated
            # recombine dominates) — stays opt-in until it wins
            from mp2_tpu.ops.ntt_mxu import ntt_mxu_flat

            variants.insert(0, ntt_mxu_flat)
        if _os.environ.get("MP2_NTT_FUSED_T"):
            # opt-in transpose-fused variant first; the default pipeline
            # stays as a fallback so an unproven Mosaic lowering can't
            # knock the whole prover down to the XLA path
            variants.insert(0, ntt_four_step_fused_t)
        batch = x.shape[:-1]
        n = x.shape[-1]
        flat = x.v.reshape(-1, n)
        for fused in variants:
            try:
                out = fused(flat, inverse)
                return GF(out.reshape(batch + (n,)))
            except Exception:
                continue
        _pallas_ntt_state["ok"] = False
    return _ntt_four_step_xla(x, inverse)


def _ntt_four_step_xla(x: GF, inverse: bool) -> GF:
    """Bailey: view n = n1*n2 as (n1, n2) row-major.
    y[k1 + n1*k2] = sum_{j1,j2} x[j1*n2 + j2] w^((j1*n2+j2)(k1 + n1 k2))
    = NTT_j2( w^(j2 k1) * NTT_j1(x[:, j2])[k1] )[k2]   — i.e.
      1) transform the columns (axis 0), 2) twiddle by w^(k1*j2),
      3) transform the rows (axis 1), 4) read out transposed."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    log1 = log_n // 2
    log2 = log_n - log1
    n1, n2 = 1 << log1, 1 << log2
    batch = x.shape[:-1]

    m = x.reshape(batch + (n1, n2))
    # 1) column transforms: move axis to the end
    mt = gl.transpose(m.reshape((-1, n1, n2)), (0, 2, 1))  # (B, n2, n1)
    a = _ntt_small(mt, inverse)  # transforms of length n1
    # 2) twiddle: a[b, j2, k1] *= w^(k1*j2)
    tw = gl.from_u64(_four_step_twiddles(log_n, inverse))  # (n1, n2)
    a = gl.mul(a, gl.transpose(tw))  # (n2, n1) broadcast over batch
    # 3) row transforms of length n2: a currently (B, n2, k1) — transform
    # over j2, so transpose to (B, k1=n1, n2)
    b = gl.transpose(a, (0, 2, 1))
    c = _ntt_small(b, inverse)  # (B, n1, k2=n2)
    # 4) output order: y[k1 + n1*k2] -> index (k2 major? k1 + n1*k2) means
    # reading (k2, k1) row-major: transpose then flatten
    out = gl.transpose(c, (0, 2, 1)).reshape((-1, n))  # (B, n2, n1) flat
    return out.reshape(batch + (n,))


def intt(x: GF) -> GF:
    return ntt(x, inverse=True)


def coset_ntt(coeffs: GF, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> GF:
    """Evaluate on the coset shift*H (plonky2's coset_fft)."""
    n = coeffs.shape[-1]
    powers = _power_table(shift, n)
    return ntt(gl.mul(coeffs, gl.from_u64(powers)))


def coset_intt(evals: GF, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> GF:
    n = evals.shape[-1]
    coeffs = intt(evals)
    powers = _power_table(pow(shift, P - 2, P), n)
    return gl.mul(coeffs, gl.from_u64(powers))


@lru_cache(maxsize=None)
def _power_table(base: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        out[i] = cur
        cur = cur * base % P
    return out


def lde(
    coeffs: GF, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR
) -> GF:
    """Low-degree extension: zero-pad to n*2^rate_bits, evaluate on shift*H."""
    n = coeffs.shape[-1]
    big = n << rate_bits
    pad = gl.zeros(coeffs.shape[:-1] + (big - n,))
    return coset_ntt(gl.concat([coeffs, pad], axis=-1), shift)


def ntt_ext(x: GF2, inverse: bool = False) -> GF2:
    """Extension-field transform: componentwise (GF(p)-linear)."""
    return GF2(ntt(x.c0, inverse), ntt(x.c1, inverse))


# --- host golden model ------------------------------------------------------


def host_ntt(values, inverse=False):
    """O(n log n) recursive python-int NTT (golden model for tests)."""
    n = len(values)
    if n == 1:
        return list(values)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    w = _root_of_unity(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    even = host_ntt(values[0::2], inverse)
    odd = host_ntt(values[1::2], inverse)
    out = [0] * n
    wj = 1
    for j in range(n // 2):
        t = wj * odd[j] % P
        out[j] = (even[j] + t) % P
        out[j + n // 2] = (even[j] - t) % P
        wj = wj * w % P
    return out


def host_intt(values):
    n = len(values)
    out = host_ntt(values, inverse=True)
    n_inv = pow(n, P - 2, P)
    return [v * n_inv % P for v in out]


def host_eval_poly(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc
