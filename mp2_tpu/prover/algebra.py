"""Algebra abstraction: gate constraints written once, evaluated in three
places — on the device over base-field LDE vectors (quotient computation), on
the host over GF(p^2) values (verification at zeta), and later in-circuit
(recursive verification targets).
"""

from __future__ import annotations

from typing import Any, Sequence

from mp2_tpu.field import ext2
from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF, P


class HostExtAlgebra:
    """Values are (c0, c1) python-int pairs in GF(p^2)."""

    zero = (0, 0)
    one = (1, 0)

    @staticmethod
    def constant(c: int):
        return (c % P, 0)

    @staticmethod
    def add(a, b):
        return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)

    @staticmethod
    def sub(a, b):
        return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)

    @staticmethod
    def mul(a, b):
        return ext2.host_mul(a, b)

    @staticmethod
    def mul_const(a, c: int):
        return (a[0] * c % P, a[1] * c % P)

    @staticmethod
    def add_const(a, c: int):
        return ((a[0] + c) % P, a[1])

    @classmethod
    def exp7(cls, a):
        a2 = cls.mul(a, a)
        a3 = cls.mul(a2, a)
        a4 = cls.mul(a2, a2)
        return cls.mul(a4, a3)


class DeviceAlgebra:
    """Values are GF tensors (base field), broadcast over the LDE domain.

    `vectorized = True` advertises the stacked-lane fast path: gates with
    many structurally-identical constraints (Poseidon2) evaluate them as
    (lanes, domain) tensors + constant-matrix products, collapsing the
    traced graph ~30x (XLA compile time is the binding constraint)."""

    vectorized = True

    def __init__(self, shape):
        self.shape = shape
        self.zero = gl.zeros(shape)
        self.one = gl.ones(shape)

    def constant(self, c: int):
        return gl.full(self.shape, c)

    @staticmethod
    def add(a, b):
        return gl.add(a, b)

    @staticmethod
    def sub(a, b):
        return gl.sub(a, b)

    @staticmethod
    def mul(a, b):
        return gl.mul(a, b)

    @staticmethod
    def mul_const(a, c: int):
        return gl.mul_const(a, c)

    @staticmethod
    def add_const(a, c: int):
        return gl.add_const(a, c)

    @staticmethod
    def exp7(a):
        return gl.exp7(a)

    # -- stacked-lane helpers (vectorized gate paths) -----------------------
    @staticmethod
    def stack(items):
        return gl.stack(list(items), axis=0)

    @staticmethod
    def unstack(v):
        return [v[i] for i in range(v.shape[0])]

    @staticmethod
    def matmul_const(A, v):
        """out[i, ...] = sum_j A[i][j] * v[j, ...] for an int matrix A."""
        import numpy as np

        m, k = len(A), len(A[0])
        A_gf = gl.from_u64(np.array(A, dtype=np.uint64).reshape(
            (m, k) + (1,) * (v.ndim - 1)
        ))
        prod = gl.mul(A_gf, GF(v.v[None]))
        return gl.sum_axis(prod, axis=1)

    @staticmethod
    def add_col_const(v, col):
        """v (k, ...) + per-lane constants col (k,)."""
        import numpy as np

        c = gl.from_u64(
            np.array(col, dtype=np.uint64).reshape((len(col),) + (1,) * (v.ndim - 1))
        )
        return gl.add(v, c)
