"""Goldilocks arithmetic on u32 limb pairs — the in-kernel dialect.

Mosaic/TPU kernels have no 64-bit integers, so Pallas kernels carry field
elements as (lo, hi) u32 arrays and use these branchless primitives
(16-bit half-limb products, 2^64 = 2^32 - 1 reduction).  This is the same
math the first-generation XLA path used before the u64 representation; it
lives on as the kernel-side implementation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

P = (1 << 64) - (1 << 32) + 1
P_LO = np.uint32(P & 0xFFFFFFFF)
P_HI = np.uint32(P >> 32)
EPS = np.uint32(0xFFFFFFFF)
_u32 = jnp.uint32


def addc(a, b):
    s = a + b
    return s, (s < a).astype(_u32)


def subb(a, b):
    d = a - b
    return d, (a < b).astype(_u32)


def mul32_wide(a, b):
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> 16
    b0 = b & jnp.uint32(0xFFFF)
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid, midc = addc(p01, p10)
    lo, c = addc(p00, mid << 16)
    hi = p11 + (mid >> 16) + (midc << 16) + c
    return lo, hi


def geq_p(lo, hi):
    return ((hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))).astype(_u32)


def canon(lo, hi):
    ge = geq_p(lo, hi)
    slo, b0 = subb(lo, ge * P_LO)
    shi = hi - ge * P_HI - b0
    return slo, shi


def add(alo, ahi, blo, bhi):
    lo, c0 = addc(alo, blo)
    h1, c1 = addc(ahi, bhi)
    h2, c2 = addc(h1, c0)
    carry = c1 | c2
    lo, c3 = addc(lo, carry * EPS)
    return canon(lo, h2 + c3)


def mul(alo, ahi, blo, bhi):
    ll_lo, ll_hi = mul32_wide(alo, blo)
    lh_lo, lh_hi = mul32_wide(alo, bhi)
    hl_lo, hl_hi = mul32_wide(ahi, blo)
    hh_lo, hh_hi = mul32_wide(ahi, bhi)
    r0 = ll_lo
    r1, c0 = addc(ll_hi, lh_lo)
    r1, c1 = addc(r1, hl_lo)
    carry1 = c0 + c1
    r2, c2 = addc(lh_hi, hl_hi)
    r2, c3 = addc(r2, hh_lo)
    r2, c4 = addc(r2, carry1)
    r3 = hh_hi + c2 + c3 + c4
    # reduce r0 + r1*2^32 + r2*2^64 + r3*2^96
    t_lo = jnp.uint32(0) - r2
    t_hi = r2 - (r2 != 0).astype(_u32)
    lo, c5 = addc(r0, t_lo)
    h1, c6 = addc(r1, t_hi)
    h2, c7 = addc(h1, c5)
    carry = c6 | c7
    lo, c8 = addc(lo, carry * EPS)
    hi = h2 + c8
    lo2, b0 = subb(lo, r3)
    h3, b1 = subb(hi, jnp.zeros_like(r3))
    h4, b2 = subb(h3, b0)
    borrow = b1 | b2
    lo2, b3 = subb(lo2, borrow * EPS)
    return canon(lo2, h4 - b3)


# ---------------------------------------------------------------------------
# Lazy (non-canonical) dialect: values live in [0, 2^64) and are only
# CONGRUENT to the field element mod p; canonicalize once at the end of a
# kernel (canon + one extra geq_p fold).  Dropping canon from every
# butterfly saves ~25% of the NTT inner-loop ops.
# ---------------------------------------------------------------------------


def add_lazy(alo, ahi, blo, bhi):
    """a + b mod p for ANY u64 inputs; result non-canonical in [0, 2^64)."""
    lo, c0 = addc(alo, blo)
    h1, c1 = addc(ahi, bhi)
    h2, c2 = addc(h1, c0)
    carry = c1 | c2
    # fold carry*2^64 == carry*EPS; a second wrap leaves hi == 0 so the
    # follow-up fold cannot wrap again
    lo, c3 = addc(lo, carry * EPS)
    h3, c4 = addc(h2, c3)
    lo, c5 = addc(lo, c4 * EPS)
    return lo, h3 + c5


def sub_lazy(alo, ahi, blo, bhi):
    """a - b mod p for ANY u64 inputs; result non-canonical in [0, 2^64)."""
    lo, b0 = subb(alo, blo)
    h1, b1 = subb(ahi, bhi)
    h2, b2 = subb(h1, b0)
    w = b1 | b2
    # fold -w*2^64 == -w*EPS; a second wrap leaves hi == 0xFFFFFFFF so the
    # follow-up fold cannot wrap again
    lo, b3 = subb(lo, w * EPS)
    h3, b4 = subb(h2, b3)
    lo, b5 = subb(lo, b4 * EPS)
    return lo, h3 - b5


def mul_lazy(alo, ahi, blo, bhi):
    """a * b mod p for ANY u64 inputs; result non-canonical in [0, 2^64)."""
    ll_lo, ll_hi = mul32_wide(alo, blo)
    lh_lo, lh_hi = mul32_wide(alo, bhi)
    hl_lo, hl_hi = mul32_wide(ahi, blo)
    hh_lo, hh_hi = mul32_wide(ahi, bhi)
    r0 = ll_lo
    r1, c0 = addc(ll_hi, lh_lo)
    r1, c1 = addc(r1, hl_lo)
    carry1 = c0 + c1
    r2, c2 = addc(lh_hi, hl_hi)
    r2, c3 = addc(r2, hh_lo)
    r2, c4 = addc(r2, carry1)
    r3 = hh_hi + c2 + c3 + c4
    # r0 + r1*2^32 - r2 + r2*2^32 - r3*EPS  (2^64==EPS, 2^96==-1,
    # 2^128 == -EPS): first add r2*(2^32-1)
    t_lo = jnp.uint32(0) - r2
    t_hi = r2 - (r2 != 0).astype(_u32)
    lo, c5 = addc(r0, t_lo)
    h1, c6 = addc(r1, t_hi)
    h2, c7 = addc(h1, c5)
    carry = c6 | c7
    lo, c8 = addc(lo, carry * EPS)
    h3, c9 = addc(h2, c8)
    lo, c10 = addc(lo, c9 * EPS)
    hi = h3 + c10
    # subtract r3 (< 2^32), folding a below-zero wrap twice like sub_lazy
    lo2, b0 = subb(lo, r3)
    h4, b1 = subb(hi, b0)
    lo2, b2 = subb(lo2, b1 * EPS)
    h5, b3 = subb(h4, b2)
    lo2, b4 = subb(lo2, b3 * EPS)
    return lo2, h5 - b4


def canon_lazy(lo, hi):
    """[0, 2^64) congruent value -> canonical [0, p): at most two p-folds
    (2^64 - 1 < 2p)."""
    lo, hi = canon(lo, hi)
    return canon(lo, hi)


def sq_lazy(alo, ahi):
    """a * a mod p for ANY u64 input; result non-canonical in [0, 2^64).

    3 wide 32x32 products instead of mul_lazy's 4: the cross term lo*hi
    appears twice, so it is computed once and doubled (its 2^97-bound top
    bit lands in the 2^96 coefficient r3)."""
    ll_lo, ll_hi = mul32_wide(alo, alo)
    lh_lo, lh_hi = mul32_wide(alo, ahi)
    hh_lo, hh_hi = mul32_wide(ahi, ahi)
    # doubled cross term, shifted to the 2^32 position: bits 32..97
    m_lo = lh_lo << 1
    m_hi = (lh_hi << 1) | (lh_lo >> 31)
    m_ov = lh_hi >> 31  # 2^96 contribution of the doubling
    r0 = ll_lo
    r1, c0 = addc(ll_hi, m_lo)
    r2, c1 = addc(hh_lo, m_hi)
    r2, c2 = addc(r2, c0)
    r3 = hh_hi + m_ov + c1 + c2
    # identical reduction to mul_lazy: 2^64 == EPS, 2^96 == -1
    t_lo = jnp.uint32(0) - r2
    t_hi = r2 - (r2 != 0).astype(_u32)
    lo, c5 = addc(r0, t_lo)
    h1, c6 = addc(r1, t_hi)
    h2, c7 = addc(h1, c5)
    carry = c6 | c7
    lo, c8 = addc(lo, carry * EPS)
    h3, c9 = addc(h2, c8)
    lo, c10 = addc(lo, c9 * EPS)
    hi = h3 + c10
    lo2, b0 = subb(lo, r3)
    h4, b1 = subb(hi, b0)
    lo2, b2 = subb(lo2, b1 * EPS)
    h5, b3 = subb(h4, b2)
    lo2, b4 = subb(lo2, b3 * EPS)
    return lo2, h5 - b4


def exp7_lazy(lo, hi):
    """x^7 mod p with non-canonical intermediates and result."""
    l2, h2 = sq_lazy(lo, hi)
    l3, h3 = mul_lazy(l2, h2, lo, hi)
    l4, h4 = sq_lazy(l2, h2)
    return mul_lazy(l4, h4, l3, h3)


def _mul_pow2_32(lo, hi):
    """x * 2^32 mod p, lazy: (lo,hi)*2^32 = lo*2^32 + hi*(2^32 - 1)."""
    h1, c0 = addc(lo, hi)  # new hi = lo + hi (carry = overflow * 2^64)
    # value = h1*2^32 - hi + c0*2^64;  2^64 == EPS
    lo1, b0 = subb(c0 * EPS, hi)
    h2, b1 = subb(h1, b0)
    lo1, b2 = subb(lo1, b1 * EPS)
    return lo1, h2 - b2


def mul_pow2_lazy(lo, hi, t):
    """x * 2^t mod p for per-lane exponents t in [0, 192); lazy result.

    Uses 2^96 == -1 (so t >= 96 negates), conditional *2^32 limb steps for
    the quotient part, and one variable shift round for the remainder."""
    neg = (t >= jnp.uint32(96)).astype(_u32)
    t1 = t - neg * jnp.uint32(96)  # [0, 96)
    q1 = (t1 >= jnp.uint32(32)).astype(_u32)
    q2 = (t1 >= jnp.uint32(64)).astype(_u32)
    r = t1 - (q1 + q2) * jnp.uint32(32)  # [0, 32)
    s1l, s1h = _mul_pow2_32(lo, hi)
    lo = jnp.where(q1 == 1, s1l, lo)
    hi = jnp.where(q1 == 1, s1h, hi)
    s2l, s2h = _mul_pow2_32(lo, hi)
    lo = jnp.where(q2 == 1, s2l, lo)
    hi = jnp.where(q2 == 1, s2h, hi)
    # shift by r in [0, 32): carry chains via (x >> (31 - r)) >> 1
    r31 = jnp.uint32(31) - r
    carry_lo = (lo >> r31) >> 1  # bits of lo above 32 - r
    ovf = (hi >> r31) >> 1  # bits >= 2^64 after the shift (< 2^31)
    lo1 = lo << r
    h1 = (hi << r) | carry_lo
    # fold ovf*2^64 == ovf*(2^32 - 1): add ovf to hi, subtract ovf 64-bit
    h2, c0 = addc(h1, ovf)
    lo2, b0 = subb(lo1, ovf)
    h3, b1 = subb(h2, b0)
    # net wrap: c0 (above 2^64) minus b1 (below 0) — at most one of each
    lo2, c1 = addc(lo2, c0 * EPS)
    h4, c2 = addc(h3, c1)
    lo2, c3 = addc(lo2, c2 * EPS)
    h4 = h4 + c3
    lo2, b2 = subb(lo2, b1 * EPS)
    h5, b3 = subb(h4, b2)
    lo2, b4 = subb(lo2, b3 * EPS)
    h5 = h5 - b4
    # negate when t >= 96: 0 - x lazy
    nl, nh = sub_lazy(jnp.zeros_like(lo2), jnp.zeros_like(h5), lo2, h5)
    lo3 = jnp.where(neg == 1, nl, lo2)
    hi3 = jnp.where(neg == 1, nh, h5)
    return lo3, hi3


def exp7(lo, hi):
    l2, h2 = mul(lo, hi, lo, hi)
    l3, h3 = mul(l2, h2, lo, hi)
    l4, h4 = mul(l2, h2, l2, h2)
    return mul(l4, h4, l3, h3)
