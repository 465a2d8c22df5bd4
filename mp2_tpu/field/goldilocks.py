"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1, as vectorized TPU arithmetic.

TPU has no native 64-bit integer units, so a field element is represented as a
pair of uint32 arrays ``(lo, hi)`` (value = lo + hi * 2^32), and all arithmetic
is built from 32-bit VPU ops, with 32x32->64 products decomposed into 16-bit
half-limb multiplies (exact in uint32).  This mirrors the role of
``GoldilocksField`` in the reference's plonky2 dependency (see
/root/reference/mp2-common/src/lib.rs:36-47 which pins F = Goldilocks), but the
implementation is an original TPU-first design: everything is shape-polymorphic,
jit-traceable, and branchless (carries/borrows via compares + selects).

Canonical-form invariant: all public functions take and return elements in
[0, p).  Mixed-domain tricks (redundant representation) are confined to kernel
internals in mp2_tpu.ops.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = (1 << 64) - (1 << 32) + 1  # 0xFFFFFFFF00000001
P_LO = np.uint32(P & 0xFFFFFFFF)  # 0x00000001
P_HI = np.uint32(P >> 32)  # 0xFFFFFFFF
EPSILON = np.uint32(0xFFFFFFFF)  # 2^64 mod p = 2^32 - 1
MASK32 = 0xFFFFFFFF

# Multiplicative group: |GF(p)*| = p - 1 = 2^32 * (2^32 - 1).
TWO_ADICITY = 32
# 7 generates GF(p)* (verified in tests/test_field.py by order checks).
MULTIPLICATIVE_GROUP_GENERATOR = 7
# 7^(2^32 - 1) mod p: primitive 2^32-th root of unity.
POWER_OF_TWO_GENERATOR = pow(7, (P - 1) >> TWO_ADICITY, P)

_u32 = jnp.uint32


class GF(NamedTuple):
    """A tensor of Goldilocks elements: value = lo + hi * 2^32, in [0, p).

    NamedTuple => automatically a JAX pytree; works under jit/vmap/shard_map.
    """

    lo: jax.Array
    hi: jax.Array

    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __len__(self):
        return self.lo.shape[0]

    # -- arithmetic sugar ---------------------------------------------------
    def __add__(self, other: "GF") -> "GF":
        return add(self, other)

    def __sub__(self, other: "GF") -> "GF":
        return sub(self, other)

    def __mul__(self, other: "GF") -> "GF":
        return mul(self, other)

    def __neg__(self) -> "GF":
        return neg(self)

    def __getitem__(self, idx) -> "GF":
        return GF(self.lo[idx], self.hi[idx])

    def reshape(self, *shape) -> "GF":
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def astuple(self):
        return (self.lo, self.hi)


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def from_u64(x: Union[int, Sequence[int], np.ndarray]) -> GF:
    """Host-side: build a GF tensor from python ints / numpy uint64 (mod p)."""
    arr = np.asarray(x, dtype=np.object_)
    flat = np.array([int(v) % P for v in arr.reshape(-1)], dtype=np.uint64)
    flat = flat.reshape(arr.shape) if arr.shape else flat.reshape(())
    lo = (flat & np.uint64(MASK32)).astype(np.uint32)
    hi = (flat >> np.uint64(32)).astype(np.uint32)
    return GF(jnp.asarray(lo), jnp.asarray(hi))


def to_u64(x: GF) -> np.ndarray:
    """Host-side: convert back to numpy uint64 (canonical values)."""
    lo = np.asarray(jax.device_get(x.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(x.hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape=()) -> GF:
    z = jnp.zeros(shape, dtype=_u32)
    return GF(z, z)


def ones(shape=()) -> GF:
    return GF(jnp.ones(shape, dtype=_u32), jnp.zeros(shape, dtype=_u32))


def full(shape, value: int) -> GF:
    value %= P
    return GF(
        jnp.full(shape, value & MASK32, dtype=_u32),
        jnp.full(shape, value >> 32, dtype=_u32),
    )


def const(value: int) -> GF:
    return full((), value)


# ---------------------------------------------------------------------------
# 32-bit primitive helpers (all uint32, wrapping)
# ---------------------------------------------------------------------------


def _addc(a, b):
    """uint32 a + b -> (sum mod 2^32, carry in {0,1})."""
    s = a + b
    return s, (s < a).astype(_u32)


def _subb(a, b):
    """uint32 a - b -> (diff mod 2^32, borrow in {0,1})."""
    d = a - b
    return d, (a < b).astype(_u32)


def _mul32_wide(a, b):
    """Full 32x32 -> 64 product as (lo32, hi32), via 16-bit half-limbs."""
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> 16
    b0 = b & jnp.uint32(0xFFFF)
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid, midc = _addc(p01, p10)  # mid may carry (values up to ~2^33)
    mlo = mid << 16
    mhi = (mid >> 16) | (midc << 16)
    lo, c = _addc(p00, mlo)
    hi = p11 + mhi + c  # cannot overflow: p11 <= (2^16-1)^2, mhi < 2^17+2^16
    return lo, hi


def _add64(alo, ahi, blo, bhi):
    """64-bit add -> (lo, hi, carry_out)."""
    lo, c0 = _addc(alo, blo)
    h1, c1 = _addc(ahi, bhi)
    h2, c2 = _addc(h1, c0)
    return lo, h2, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """64-bit sub -> (lo, hi, borrow_out)."""
    lo, b0 = _subb(alo, blo)
    h1, b1 = _subb(ahi, bhi)
    h2, b2 = _subb(h1, b0)
    return lo, h2, b1 | b2


def _geq_p(lo, hi):
    """(lo, hi) >= p, as uint32 0/1."""
    gt = hi > P_HI
    eq = hi == P_HI
    return (gt | (eq & (lo >= P_LO))).astype(_u32)


def _canonicalize(lo, hi):
    """Reduce a value < 2*p (held in 64 bits) into [0, p)."""
    ge = _geq_p(lo, hi)
    slo, shi, _ = _sub64(lo, hi, ge * P_LO, ge * P_HI)
    return slo, shi


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------


def add(a: GF, b: GF) -> GF:
    lo, hi, carry = _add64(a.lo, a.hi, b.lo, b.hi)
    # 2^64 = p + (2^32 - 1): on carry-out add EPSILON (cannot re-overflow
    # because a + b < 2p  =>  a+b-2^64 + (2^32-1) < p).
    lo, c0 = _addc(lo, carry * EPSILON)
    hi = hi + c0
    return GF(*_canonicalize(lo, hi))


def sub(a: GF, b: GF) -> GF:
    lo, hi, borrow = _sub64(a.lo, a.hi, b.lo, b.hi)
    # On borrow, we computed a - b + 2^64; subtracting (2^32 - 1) yields
    # a - b + p.  No second borrow (see module docstring invariant).
    lo, b0 = _subb(lo, borrow * EPSILON)
    hi = hi - b0
    return GF(lo, hi)


def neg(a: GF) -> GF:
    return sub(zeros(a.shape), a)


def _mul_wide(a: GF, b: GF):
    """Full 64x64 -> 128 product as four uint32 limbs (r0..r3, LSB first)."""
    ll_lo, ll_hi = _mul32_wide(a.lo, b.lo)
    lh_lo, lh_hi = _mul32_wide(a.lo, b.hi)
    hl_lo, hl_hi = _mul32_wide(a.hi, b.lo)
    hh_lo, hh_hi = _mul32_wide(a.hi, b.hi)

    r0 = ll_lo
    # r1 = ll_hi + lh_lo + hl_lo
    r1, c0 = _addc(ll_hi, lh_lo)
    r1, c1 = _addc(r1, hl_lo)
    carry1 = c0 + c1  # <= 2
    # r2 = lh_hi + hl_hi + hh_lo + carry1
    r2, c2 = _addc(lh_hi, hl_hi)
    r2, c3 = _addc(r2, hh_lo)
    r2, c4 = _addc(r2, carry1)
    carry2 = c2 + c3 + c4  # <= 3
    r3 = hh_hi + carry2  # cannot overflow (product < 2^128)
    return r0, r1, r2, r3


def _reduce128(r0, r1, r2, r3) -> GF:
    """Reduce r0 + r1*2^32 + r2*2^64 + r3*2^96 mod p.

    Uses 2^64 = 2^32 - 1 (mod p) and 2^96 = -1 (mod p):
        x = n0 + n1lo*(2^32 - 1) - n1hi   with n0 = (r0,r1), n1lo=r2, n1hi=r3.
    """
    # t = n1lo * (2^32 - 1) = (n1lo << 32) - n1lo, as 64 bits (no underflow
    # into bit 64 since n1lo*(2^32-1) < 2^64).
    t_lo = jnp.uint32(0) - r2
    t_hi = r2 - (r2 != 0).astype(_u32)

    # s = n0 + t  (mod p pressure handled via carry trick)
    lo, hi, carry = _add64(r0, r1, t_lo, t_hi)
    lo, c0 = _addc(lo, carry * EPSILON)
    hi = hi + c0  # value now < 2^64, and < 2p when carry occurred

    # s = s - n1hi
    lo, hi, borrow = _sub64(lo, hi, r3, jnp.zeros_like(r3))
    lo, b0 = _subb(lo, borrow * EPSILON)
    hi = hi - b0

    return GF(*_canonicalize(lo, hi))


def mul(a: GF, b: GF) -> GF:
    return _reduce128(*_mul_wide(a, b))


def sqr(a: GF) -> GF:
    return mul(a, a)


def mul_const(a: GF, c: int) -> GF:
    """Multiply by a compile-time constant (broadcasts)."""
    c %= P
    b = GF(jnp.full(a.shape, c & MASK32, _u32), jnp.full(a.shape, c >> 32, _u32))
    return mul(a, b)


def add_const(a: GF, c: int) -> GF:
    c %= P
    b = GF(jnp.full(a.shape, c & MASK32, _u32), jnp.full(a.shape, c >> 32, _u32))
    return add(a, b)


def pow_const(a: GF, e: int) -> GF:
    """a^e for a compile-time integer exponent (static square-and-multiply)."""
    if e == 0:
        return ones(a.shape)
    e %= P - 1
    if e == 0:
        return ones(a.shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def exp7(a: GF) -> GF:
    """a^7 (Poseidon2 s-box): 2 squarings + 2 muls."""
    a2 = sqr(a)
    a3 = mul(a2, a)
    a4 = sqr(a2)
    return mul(a4, a3)


def inv(a: GF) -> GF:
    """a^(p-2).  p-2 = 0xFFFFFFFE_FFFFFFFF; static chain, branchless.

    inv(0) = 0 (same convention as plonky2's try_inverse users rely on the
    caller never passing 0; we define 0 -> 0 for total function semantics).
    """
    return pow_const(a, P - 2)


def select(cond, a: GF, b: GF) -> GF:
    """Elementwise cond ? a : b.  cond: bool array broadcastable to shape."""
    return GF(jnp.where(cond, a.lo, b.lo), jnp.where(cond, a.hi, b.hi))


def equal(a: GF, b: GF):
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GF):
    return (a.lo == 0) & (a.hi == 0)


# ---------------------------------------------------------------------------
# Structural ops (shape manipulation over the pair representation)
# ---------------------------------------------------------------------------


def concat(parts: Sequence[GF], axis=0) -> GF:
    return GF(
        jnp.concatenate([x.lo for x in parts], axis=axis),
        jnp.concatenate([x.hi for x in parts], axis=axis),
    )


def stack(parts: Sequence[GF], axis=0) -> GF:
    return GF(
        jnp.stack([x.lo for x in parts], axis=axis),
        jnp.stack([x.hi for x in parts], axis=axis),
    )


def take(a: GF, idx, axis=0) -> GF:
    return GF(jnp.take(a.lo, idx, axis=axis), jnp.take(a.hi, idx, axis=axis))


def dynamic_index(a: GF, idx) -> GF:
    """a[idx] along axis 0 with a traced scalar index."""
    return GF(
        jax.lax.dynamic_index_in_dim(a.lo, idx, 0, keepdims=False),
        jax.lax.dynamic_index_in_dim(a.hi, idx, 0, keepdims=False),
    )


def sum_axis(a: GF, axis=-1) -> GF:
    """Field sum along an axis via pairwise tree reduction (log depth)."""
    # Move target axis to front for a simple halving loop.
    lo = jnp.moveaxis(a.lo, axis, 0)
    hi = jnp.moveaxis(a.hi, axis, 0)
    x = GF(lo, hi)
    n = x.lo.shape[0]
    while n > 1:
        half = n // 2
        even = GF(x.lo[: 2 * half : 2], x.hi[: 2 * half : 2])
        odd = GF(x.lo[1 : 2 * half : 2], x.hi[1 : 2 * half : 2])
        red = add(even, odd)
        if n % 2:
            red = concat([red, GF(x.lo[n - 1 :], x.hi[n - 1 :])], axis=0)
        x = red
        n = x.lo.shape[0]
    return GF(x.lo[0], x.hi[0])


def dot(a: GF, b: GF, axis=-1) -> GF:
    """Field inner product along an axis."""
    return sum_axis(mul(a, b), axis=axis)


# ---------------------------------------------------------------------------
# Host-side golden helpers (python ints; used by tests and constant setup)
# ---------------------------------------------------------------------------


def host_add(a: int, b: int) -> int:
    return (a + b) % P


def host_mul(a: int, b: int) -> int:
    return (a * b) % P


def host_inv(a: int) -> int:
    return pow(a, P - 2, P) if a else 0


def host_pow(a: int, e: int) -> int:
    return pow(a, e, P)
