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


def exp7(lo, hi):
    l2, h2 = mul(lo, hi, lo, hi)
    l3, h3 = mul(l2, h2, lo, hi)
    l4, h4 = mul(l2, h2, l2, h2)
    return mul(l4, h4, l3, h3)
