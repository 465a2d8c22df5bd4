"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1, as vectorized TPU arithmetic.

Representation: a single uint64 tensor per GF value (requires jax x64 mode,
enabled at import).  On CPU this lowers to native 64-bit ops; on TPU, XLA
emulates u64 as u32 pairs — the same limb decomposition we would write by
hand, but applied at lowering time so traced graphs stay ~4x smaller (compile
time on the prover's large fused graphs is the binding constraint).  Pallas
kernels in mp2_tpu.ops use explicit u32 limbs at the kernel boundary instead.

Full 64x64->128 products are decomposed into four 32x32 half-limb products
(exact in u64); reduction uses 2^64 = 2^32 - 1 and 2^96 = -1 (mod p).

Canonical-form invariant: all public functions take and return values in
[0, p).  This mirrors the role of plonky2's `GoldilocksField` in the
reference (pinned at /root/reference/mp2-common/src/lib.rs:36-47) but is an
original TPU-first implementation.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = (1 << 64) - (1 << 32) + 1  # 0xFFFFFFFF00000001
P64 = np.uint64(P)
EPSILON64 = np.uint64(0xFFFFFFFF)  # 2^64 mod p
MASK32 = 0xFFFFFFFF
M32 = np.uint64(MASK32)

TWO_ADICITY = 32
MULTIPLICATIVE_GROUP_GENERATOR = 7
POWER_OF_TWO_GENERATOR = pow(7, (P - 1) >> TWO_ADICITY, P)

_u64 = jnp.uint64
_u32 = jnp.uint32


@jax.tree_util.register_pytree_node_class
class GF:
    """A tensor of Goldilocks elements held as canonical uint64 values.

    Legacy pair construction GF(lo_u32, hi_u32) is still accepted; `.lo` /
    `.hi` expose u32 limb views (used at Pallas kernel boundaries).
    """

    __slots__ = ("v",)

    def __init__(self, v, hi=None):
        if hi is not None:
            v = v.astype(_u64) | (hi.astype(_u64) << np.uint64(32))
        self.v = v

    def tree_flatten(self):
        return ((self.v,), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # -- limb views ---------------------------------------------------------
    @property
    def lo(self):
        return (self.v & M32).astype(_u32)

    @property
    def hi(self):
        return (self.v >> np.uint64(32)).astype(_u32)

    @property
    def shape(self):
        return self.v.shape

    @property
    def ndim(self):
        return self.v.ndim

    def __len__(self):
        return self.v.shape[0]

    def __add__(self, other):
        return add(self, other)

    def __sub__(self, other):
        return sub(self, other)

    def __mul__(self, other):
        return mul(self, other)

    def __neg__(self):
        return neg(self)

    def __getitem__(self, idx):
        return GF(self.v[idx])

    def reshape(self, *shape):
        return GF(self.v.reshape(*shape))

    def astuple(self):
        return (self.lo, self.hi)

    def __repr__(self):
        return f"GF({self.v!r})"


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def from_u64(x: Union[int, Sequence[int], np.ndarray]) -> GF:
    """Host-side: build a GF tensor from python ints / numpy (mod p)."""
    arr = np.asarray(x, dtype=np.object_)
    if arr.shape == ():
        return GF(jnp.asarray(np.uint64(int(arr) % P)))
    flat = np.array([int(v) % P for v in arr.reshape(-1)], dtype=np.uint64)
    return GF(jnp.asarray(flat.reshape(arr.shape)))


def to_u64(x: GF) -> np.ndarray:
    return np.asarray(jax.device_get(x.v), dtype=np.uint64)


def zeros(shape=()) -> GF:
    return GF(jnp.zeros(shape, dtype=_u64))


def ones(shape=()) -> GF:
    return GF(jnp.ones(shape, dtype=_u64))


def full(shape, value: int) -> GF:
    return GF(jnp.full(shape, np.uint64(value % P), dtype=_u64))


def const(value: int) -> GF:
    return full((), value)


# ---------------------------------------------------------------------------
# Field ops (branchless u64)
# ---------------------------------------------------------------------------


def _canon(v):
    """Reduce a value < 2p (held in u64) into [0, p)."""
    ge = (v >= P64).astype(_u64)
    return v - ge * P64


def add(a: GF, b: GF) -> GF:
    s = a.v + b.v
    over = (s < a.v).astype(_u64)
    s = s + over * EPSILON64  # cannot re-overflow for canonical inputs
    return GF(_canon(s))


def sub(a: GF, b: GF) -> GF:
    d = a.v - b.v
    borrow = (a.v < b.v).astype(_u64)
    return GF(d - borrow * EPSILON64)


def neg(a: GF) -> GF:
    nz = (a.v != 0).astype(_u64)
    return GF(nz * (P64 - a.v))


def _mul_wide_u64(a, b):
    """(lo64, hi64) of the 128-bit product."""
    a0 = a & M32
    a1 = a >> np.uint64(32)
    b0 = b & M32
    b1 = b >> np.uint64(32)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    midc = (mid < p01).astype(_u64)
    lo = p00 + (mid << np.uint64(32))
    c2 = (lo < p00).astype(_u64)
    hi = p11 + (mid >> np.uint64(32)) + (midc << np.uint64(32)) + c2
    return lo, hi


def _reduce128(lo, hi):
    """lo + hi*2^64 mod p, using 2^64 = 2^32-1 and 2^96 = -1."""
    hi_lo = hi & M32
    hi_hi = hi >> np.uint64(32)
    t = (hi_lo << np.uint64(32)) - hi_lo  # hi_lo * (2^32 - 1), fits u64
    s = lo + t
    over = (s < lo).astype(_u64)
    s = s + over * EPSILON64
    s2 = s - hi_hi
    borrow = (s < hi_hi).astype(_u64)
    s2 = s2 - borrow * EPSILON64
    return _canon(s2)


def mul(a: GF, b: GF) -> GF:
    return GF(_reduce128(*_mul_wide_u64(a.v, b.v)))


def sqr(a: GF) -> GF:
    return mul(a, a)


def mul_const(a: GF, c: int) -> GF:
    c %= P
    return mul(a, GF(jnp.full(a.shape, np.uint64(c), _u64)))


def add_const(a: GF, c: int) -> GF:
    c %= P
    return add(a, GF(jnp.full(a.shape, np.uint64(c), _u64)))


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
    a2 = sqr(a)
    a3 = mul(a2, a)
    a4 = sqr(a2)
    return mul(a4, a3)


def inv(a: GF) -> GF:
    """a^(p-2); inv(0) = 0."""
    return pow_const(a, P - 2)


def select(cond, a: GF, b: GF) -> GF:
    return GF(jnp.where(cond, a.v, b.v))


def equal(a: GF, b: GF):
    return a.v == b.v


def is_zero(a: GF):
    return a.v == 0


# ---------------------------------------------------------------------------
# Structural ops
# ---------------------------------------------------------------------------


def concat(parts: Sequence[GF], axis=0) -> GF:
    return GF(jnp.concatenate([x.v for x in parts], axis=axis))


def stack(parts: Sequence[GF], axis=0) -> GF:
    return GF(jnp.stack([x.v for x in parts], axis=axis))


def take(a: GF, idx, axis=0) -> GF:
    return GF(jnp.take(a.v, idx, axis=axis))


def roll(a: GF, shift: int, axis=-1) -> GF:
    return GF(jnp.roll(a.v, shift, axis))


def transpose(a: GF, axes=None) -> GF:
    return GF(jnp.transpose(a.v, axes))


def expand_dims(a: GF, axis) -> GF:
    return GF(jnp.expand_dims(a.v, axis))


def broadcast_to(a: GF, shape) -> GF:
    return GF(jnp.broadcast_to(a.v, shape))


def set_index(a: GF, idx, value: GF) -> GF:
    return GF(a.v.at[idx].set(value.v))


def dynamic_index(a: GF, idx) -> GF:
    return GF(jax.lax.dynamic_index_in_dim(a.v, idx, 0, keepdims=False))


def sum_axis(a: GF, axis=-1) -> GF:
    """Field sum along an axis via pairwise tree reduction (log depth)."""
    v = jnp.moveaxis(a.v, axis, 0)
    x = GF(v)
    n = x.v.shape[0]
    while n > 1:
        half = n // 2
        red = add(GF(x.v[: 2 * half : 2]), GF(x.v[1 : 2 * half : 2]))
        if n % 2:
            red = GF(jnp.concatenate([red.v, x.v[n - 1 :]], axis=0))
        x = red
        n = x.v.shape[0]
    return GF(x.v[0])


def dot(a: GF, b: GF, axis=-1) -> GF:
    return sum_axis(mul(a, b), axis=axis)


# ---------------------------------------------------------------------------
# Host-side golden helpers
# ---------------------------------------------------------------------------


def host_add(a: int, b: int) -> int:
    return (a + b) % P


def host_mul(a: int, b: int) -> int:
    return (a * b) % P


def host_inv(a: int) -> int:
    return pow(a, P - 2, P) if a else 0


def host_pow(a: int, e: int) -> int:
    return pow(a, e, P)
