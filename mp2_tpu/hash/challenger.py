"""Duplex challenger: the Fiat-Shamir transcript of the proving system.

Mirrors plonky2's `Challenger` semantics (overwrite-mode duplex sponge,
output buffer popped from the end), which is what keeps every proof's
transcript deterministic and verifier-reproducible.  The observe/squeeze call
*pattern* is static per circuit shape, so the bookkeeping lives in Python
while the values are traced JAX GF tensors — the whole transcript jits.

Two variants:
  Challenger     — batched device version (GF tensors, any batch shape)
  HostChallenger — python-int golden model (verification, tests)
"""

from __future__ import annotations

from typing import List, Sequence

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF, P
from mp2_tpu.hash import poseidon2 as p2
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.hash.constants import RATE, WIDTH


class Challenger:
    """Batched duplex challenger over GF scalars of shape `batch`."""

    def __init__(self, batch=()):
        self.batch = batch
        self._state: List[GF] = [gl.zeros(batch) for _ in range(WIDTH)]
        self._input_buffer: List[GF] = []
        self._output_buffer: List[GF] = []

    def observe(self, x: GF):
        """Observe a single element (shape == batch) or a vector (..., n)."""
        if x.shape == self.batch:
            self._output_buffer = []
            self._input_buffer.append(x)
            if len(self._input_buffer) == RATE:
                self._duplex()
        else:
            assert x.shape[: len(self.batch)] == self.batch
            n = x.shape[-1]
            for i in range(n):
                self.observe(x[..., i])

    def observe_hash(self, h: GF):
        assert h.shape[-1] == 4
        self.observe(h)

    def _duplex(self):
        for j, x in enumerate(self._input_buffer):
            self._state[j] = x
        self._state = p2.permute_lanes(self._state)
        self._input_buffer = []
        self._output_buffer = list(self._state[:RATE])

    def get_challenge(self) -> GF:
        if self._input_buffer or not self._output_buffer:
            self._duplex()
        return self._output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[GF]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        from mp2_tpu.field.ext2 import GF2

        c0 = self.get_challenge()
        c1 = self.get_challenge()
        return GF2(c0, c1)


class HostChallenger:
    """Python-int golden model with identical semantics."""

    def __init__(self):
        self._state = [0] * WIDTH
        self._input_buffer: List[int] = []
        self._output_buffer: List[int] = []

    def observe(self, x):
        if isinstance(x, (list, tuple)):
            for v in x:
                self.observe(v)
            return
        self._output_buffer = []
        self._input_buffer.append(x % P)
        if len(self._input_buffer) == RATE:
            self._duplex()

    def _duplex(self):
        for j, x in enumerate(self._input_buffer):
            self._state[j] = x
        self._state = p2h.permute(self._state)
        self._input_buffer = []
        self._output_buffer = list(self._state[:RATE])

    def get_challenge(self) -> int:
        if self._input_buffer or not self._output_buffer:
            self._duplex()
        return self._output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c0 = self.get_challenge()
        c1 = self.get_challenge()
        return (c0, c1)
