"""In-circuit 256-bit unsigned arithmetic as 8 x u32 big-endian limbs.

Role of the reference's `UInt256Target`/`CircuitBuilderU256`
(mp2-common/src/u256.rs:43-222): limbs are range-checked via bit
decomposition; comparisons run an LSB-to-MSB borrow chain with
range-checked limb differences; addition runs the dual carry chain.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from mp2_tpu.circuit.builder import CircuitBuilder, Target
from mp2_tpu.field.goldilocks import P
from mp2_tpu.utils.u256 import NUM_LIMBS, u256_to_fields

TWO32 = 1 << 32


@dataclass(frozen=True)
class U256Target:
    """8 u32 limb targets, big-endian (limbs[0] most significant)."""

    limbs: Tuple[Target, ...]

    def __post_init__(self):
        assert len(self.limbs) == NUM_LIMBS


def add_virtual_u256(b: CircuitBuilder, range_check: bool = True) -> U256Target:
    limbs = tuple(b.add_inputs(NUM_LIMBS))
    if range_check:
        for t in limbs:
            b.assert_u32(t)
    return U256Target(limbs)


def set_u256(inputs: dict, t: U256Target, value: int):
    """Fill a witness-inputs dict with the limb values."""
    for limb_t, v in zip(t.limbs, u256_to_fields(value)):
        inputs[limb_t] = v


def u256_constant(b: CircuitBuilder, value: int) -> U256Target:
    return U256Target(tuple(b.constant(v) for v in u256_to_fields(value)))


def u256_equal(b: CircuitBuilder, x: U256Target, y: U256Target) -> Target:
    acc = None
    for xi, yi in zip(x.limbs, y.limbs):
        e = b.is_equal(xi, yi)
        acc = e if acc is None else b.logic_and(acc, e)
    return acc


def u256_sub(
    b: CircuitBuilder, x: U256Target, y: U256Target
) -> Tuple[U256Target, Target]:
    """(x - y) mod 2^256 and the borrow-out bit, via the borrow chain
    d_i = x_i - y_i - borrow_in + 2^32 * borrow_out, d_i in [0, 2^32)."""
    borrow = b.zero()
    out: List[Target] = [None] * NUM_LIMBS
    # walk LSB -> MSB (limbs are big-endian)
    for i in range(NUM_LIMBS - 1, -1, -1):
        xi, yi = x.limbs[i], y.limbs[i]
        d = b.add_input()
        nb = b.add_input()

        def gen_pair(read, xi=xi, yi=yi, borrow=borrow):
            v = read(xi) - read(yi) - read(borrow)
            return v % TWO32, 1 if v < 0 else 0

        b.add_generator(d, lambda read, g=gen_pair: g(read)[0])
        b.add_generator(nb, lambda read, g=gen_pair: g(read)[1])
        b.decompose_bits(d, 32)
        b.decompose_bits(nb, 1)
        # x_i - y_i - borrow + 2^32*nb - d == 0
        lhs = b.sub(b.sub(xi, yi), borrow)
        lhs = b.add(lhs, b.mul_const(TWO32 % P, nb))
        lhs = b.sub(lhs, d)
        b.connect(lhs, b.zero())
        out[i] = d
        borrow = nb
    return U256Target(tuple(out)), borrow


def u256_less_than(b: CircuitBuilder, x: U256Target, y: U256Target) -> Target:
    """x < y as a boolean target (borrow-out of x - y)."""
    return u256_sub(b, x, y)[1]


def u256_is_zero(b: CircuitBuilder, x: U256Target) -> Target:
    acc = None
    for xi in x.limbs:
        z = b.is_zero(xi)
        acc = z if acc is None else b.logic_and(acc, z)
    return acc


def u256_from_bool(b: CircuitBuilder, bit: Target) -> U256Target:
    """Embed a boolean target as a u256 (value 0 or 1)."""
    z = b.zero()
    return U256Target(tuple([z] * (NUM_LIMBS - 1) + [bit]))


def u256_lte(b: CircuitBuilder, x: U256Target, y: U256Target) -> Target:
    return b.logic_not(u256_less_than(b, y, x))


def u256_add(
    b: CircuitBuilder, x: U256Target, y: U256Target
) -> Tuple[U256Target, Target]:
    """(x + y) mod 2^256 and the overflow bit, via the carry chain."""
    carry = b.zero()
    out: List[Target] = [None] * NUM_LIMBS
    for i in range(NUM_LIMBS - 1, -1, -1):
        xi, yi = x.limbs[i], y.limbs[i]
        s = b.add_input()
        nc = b.add_input()

        def gen_pair(read, xi=xi, yi=yi, carry=carry):
            v = read(xi) + read(yi) + read(carry)
            return v % TWO32, v >> 32

        b.add_generator(s, lambda read, g=gen_pair: g(read)[0])
        b.add_generator(nc, lambda read, g=gen_pair: g(read)[1])
        b.decompose_bits(s, 32)
        b.decompose_bits(nc, 1)
        # x_i + y_i + carry - 2^32*nc - s == 0
        lhs = b.add(b.add(xi, yi), carry)
        lhs = b.sub(lhs, b.mul_const(TWO32 % P, nc))
        lhs = b.sub(lhs, s)
        b.connect(lhs, b.zero())
        out[i] = s
        carry = nc
    return U256Target(tuple(out)), carry


def u256_select(
    b: CircuitBuilder, cond: Target, x: U256Target, y: U256Target
) -> U256Target:
    """cond ? x : y (cond boolean)."""
    out = []
    for xi, yi in zip(x.limbs, y.limbs):
        d = b.sub(xi, yi)
        out.append(b.mul_add(cond, d, yi))
    return U256Target(tuple(out))
