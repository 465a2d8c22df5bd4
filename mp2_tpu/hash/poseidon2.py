"""Poseidon2 permutation, vectorized over arbitrary batch shapes (JAX).

State is a GF tensor of shape (..., 12); all lanes of the batch run the
permutation in lockstep on the VPU.  Bit-identical to the host golden model
(mp2_tpu.hash.poseidon2_host) — asserted in tests/test_poseidon2.py.

Design notes (TPU):
  * small-constant multiplications in the M4 block use add/double chains
    (an add is ~10 u32 VPU ops vs ~60 for a generic 64x64 field mul);
  * the internal-matrix sum term is a log-depth tree reduction;
  * for throughput-critical paths (Merkle levels, FRI leaf hashing) see the
    Pallas kernel in mp2_tpu.ops.poseidon2_pallas.
"""

from __future__ import annotations

from typing import List

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF
from mp2_tpu.hash.constants import RATE, ROUNDS_F, ROUNDS_P, WIDTH, load_table

_EXT_RC, _INT_RC, _INT_DIAG = load_table()


def _dbl(x: GF) -> GF:
    return gl.add(x, x)


def _apply_m4(c: List[GF]) -> List[GF]:
    """y = M4 @ c with M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]].

    Add-chain form (Poseidon2 reference optimization):
      t0 = c0 + c1; t1 = c2 + c3; t2 = 2*c1 + t1; t3 = 2*c3 + t0
      t4 = 4*t1 + t3; t5 = 4*t0 + t2; t6 = t3 + t5; t7 = t2 + t4
      result = (t6, t5, t7, t4)
    """
    c0, c1, c2, c3 = c
    t0 = gl.add(c0, c1)
    t1 = gl.add(c2, c3)
    t2 = gl.add(_dbl(c1), t1)
    t3 = gl.add(_dbl(c3), t0)
    t4 = gl.add(_dbl(_dbl(t1)), t3)
    t5 = gl.add(_dbl(_dbl(t0)), t2)
    t6 = gl.add(t3, t5)
    t7 = gl.add(t2, t4)
    return [t6, t5, t7, t4]


def _external_linear(lanes: List[GF]) -> List[GF]:
    chunks = [_apply_m4(lanes[i : i + 4]) for i in range(0, WIDTH, 4)]
    total = [
        gl.add(gl.add(chunks[0][i], chunks[1][i]), chunks[2][i]) for i in range(4)
    ]
    out = []
    for ch in chunks:
        out.extend(gl.add(ch[i], total[i]) for i in range(4))
    return out


def _internal_linear(lanes: List[GF]) -> List[GF]:
    # tree-sum of the 12 lanes
    acc = lanes
    while len(acc) > 1:
        nxt = [gl.add(acc[i], acc[i + 1]) for i in range(0, len(acc) - 1, 2)]
        if len(acc) % 2:
            nxt.append(acc[-1])
        acc = nxt
    s = acc[0]
    return [
        gl.add(s, gl.mul_const(lanes[i], (_INT_DIAG[i] - 1) % gl.P))
        for i in range(WIDTH)
    ]


def permute_lanes(lanes: List[GF]) -> List[GF]:
    """Permutation on 12 separate GF tensors (one per lane)."""
    assert len(lanes) == WIDTH
    st = _external_linear(lanes)
    half = ROUNDS_F // 2
    for r in range(half):
        st = [gl.exp7(gl.add_const(x, rc)) for x, rc in zip(st, _EXT_RC[r])]
        st = _external_linear(st)
    for r in range(ROUNDS_P):
        st = [gl.exp7(gl.add_const(st[0], _INT_RC[r]))] + st[1:]
        st = _internal_linear(st)
    for r in range(half, ROUNDS_F):
        st = [gl.exp7(gl.add_const(x, rc)) for x, rc in zip(st, _EXT_RC[r])]
        st = _external_linear(st)
    return st


def permute(state: GF) -> GF:
    """Permutation on a GF tensor of shape (..., 12)."""
    lanes = [state[..., i] for i in range(WIDTH)]
    out = permute_lanes(lanes)
    return gl.stack(out, axis=-1)


def hash_n_to_m_no_pad(inputs: GF, num_outputs: int) -> GF:
    """Sponge over shape (..., n) -> (..., num_outputs).

    n is static; absorption is overwrite-mode in chunks of RATE with no
    padding (plonky2 semantics; matches the host model).
    """
    n = inputs.shape[-1]
    batch = inputs.shape[:-1]
    state = [gl.zeros(batch) for _ in range(WIDTH)]
    for i in range(0, n, RATE):
        k = min(RATE, n - i)
        for j in range(k):
            state[j] = inputs[..., i + j]
        state = permute_lanes(state)
    outputs: List[GF] = []
    while True:
        for x in state[:RATE]:
            outputs.append(x)
            if len(outputs) == num_outputs:
                return gl.stack(outputs, axis=-1)
        state = permute_lanes(state)


def hash_no_pad(inputs: GF) -> GF:
    return hash_n_to_m_no_pad(inputs, 4)


def hash_or_noop(inputs: GF) -> GF:
    n = inputs.shape[-1]
    if n <= 4:
        pad = gl.zeros(inputs.shape[:-1] + (4 - n,))
        return gl.concat([inputs, pad], axis=-1)
    return hash_no_pad(inputs)


def two_to_one(left: GF, right: GF) -> GF:
    """(..., 4) x (..., 4) -> (..., 4)."""
    return hash_no_pad(gl.concat([left, right], axis=-1))
