"""Quadratic extension GF(p^2) = GF(p)[X]/(X^2 - 7), vectorized (JAX).

The challenge/soundness field of the proving system (D = 2, matching the
reference's `F: Extendable<2>` pinning in /root/reference/mp2-common/src/lib.rs:36-42).
7 is a quadratic non-residue mod p (verified in tests), and is also the
multiplicative group generator, matching plonky2's QuadraticExtension<Goldilocks>.

Elements are pairs (c0, c1) of Goldilocks tensors: value = c0 + c1*X.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF, P

W = 7  # X^2 = 7

# X^p = X * 7^((p-1)/2) = -X  (7 is a non-residue), so frobenius negates c1.


class GF2(NamedTuple):
    c0: GF
    c1: GF

    @property
    def shape(self):
        return self.c0.shape

    def __add__(self, o):
        return add(self, o)

    def __sub__(self, o):
        return sub(self, o)

    def __mul__(self, o):
        return mul(self, o)

    def __getitem__(self, idx):
        return GF2(self.c0[idx], self.c1[idx])


def from_base(x: GF) -> GF2:
    return GF2(x, gl.zeros(x.shape))


def from_u64_pair(c0, c1) -> GF2:
    return GF2(gl.from_u64(c0), gl.from_u64(c1))


def to_u64_pair(x: GF2):
    return gl.to_u64(x.c0), gl.to_u64(x.c1)


def zeros(shape=()) -> GF2:
    return GF2(gl.zeros(shape), gl.zeros(shape))


def ones(shape=()) -> GF2:
    return GF2(gl.ones(shape), gl.zeros(shape))


def add(a: GF2, b: GF2) -> GF2:
    return GF2(gl.add(a.c0, b.c0), gl.add(a.c1, b.c1))


def sub(a: GF2, b: GF2) -> GF2:
    return GF2(gl.sub(a.c0, b.c0), gl.sub(a.c1, b.c1))


def neg(a: GF2) -> GF2:
    return GF2(gl.neg(a.c0), gl.neg(a.c1))


def mul(a: GF2, b: GF2) -> GF2:
    # (a0 + a1 X)(b0 + b1 X) = a0b0 + 7 a1b1 + (a0b1 + a1b0) X
    t00 = gl.mul(a.c0, b.c0)
    t11 = gl.mul(a.c1, b.c1)
    t01 = gl.mul(a.c0, b.c1)
    t10 = gl.mul(a.c1, b.c0)
    return GF2(gl.add(t00, gl.mul_const(t11, W)), gl.add(t01, t10))


def scalar_mul(a: GF2, s: GF) -> GF2:
    return GF2(gl.mul(a.c0, s), gl.mul(a.c1, s))


def sqr(a: GF2) -> GF2:
    return mul(a, a)


def conj(a: GF2) -> GF2:
    return GF2(a.c0, gl.neg(a.c1))


def inv(a: GF2) -> GF2:
    # norm = c0^2 - 7 c1^2 in GF(p); inv = conj / norm
    n = gl.sub(gl.sqr(a.c0), gl.mul_const(gl.sqr(a.c1), W))
    ninv = gl.inv(n)
    return GF2(gl.mul(a.c0, ninv), gl.mul(gl.neg(a.c1), ninv))


def pow_const(a: GF2, e: int) -> GF2:
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


def select(cond, a: GF2, b: GF2) -> GF2:
    return GF2(gl.select(cond, a.c0, b.c0), gl.select(cond, a.c1, b.c1))


def equal(a: GF2, b: GF2):
    return gl.equal(a.c0, b.c0) & gl.equal(a.c1, b.c1)


def stack(parts: Sequence[GF2], axis=0) -> GF2:
    return GF2(
        gl.stack([x.c0 for x in parts], axis),
        gl.stack([x.c1 for x in parts], axis),
    )


def sum_axis(a: GF2, axis=-1) -> GF2:
    return GF2(gl.sum_axis(a.c0, axis), gl.sum_axis(a.c1, axis))


# -- host golden helpers ----------------------------------------------------


def host_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 + W * a1 * b1) % P, (a0 * b1 + a1 * b0) % P)


def host_inv(a):
    a0, a1 = a
    n = (a0 * a0 - W * a1 * a1) % P
    ninv = pow(n, P - 2, P)
    return (a0 * ninv % P, (-a1) * ninv % P)


def host_pow(a, e: int):
    r = (1, 0)
    base = a
    while e:
        if e & 1:
            r = host_mul(r, base)
        base = host_mul(base, base)
        e >>= 1
    return r
