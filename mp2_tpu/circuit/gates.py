"""Gate library: each row of the trace carries one gate instance.

Wide single-row gates in the plonky2 style (no next-row references — chained
structures like Poseidon permutations connect consecutive rows through the
routed-wire copy permutation).  Every gate implements `constraints(alg, ...)`
over the algebra abstraction so the same definition serves the device quotient
evaluation, the host verifier, and (later) the in-circuit verifier gadget.

Constraint degree budget: selector (1) x constraint (<= 7+1) must stay within
the quotient factor 8 (composition degree <= 9 with the permutation chunks).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

from mp2_tpu.field.goldilocks import P
from mp2_tpu.hash.constants import ROUNDS_F, ROUNDS_P, WIDTH, load_table
from mp2_tpu.hash.constants import M4

_EXT_RC, _INT_RC, _INT_DIAG = load_table()


class Gate:
    """Base gate: `name` keys the selector group."""

    name: str = "gate"
    degree: int = 1

    def num_constraints(self) -> int:
        raise NotImplementedError

    def constraints(self, alg, wires: Sequence, constants: Sequence, extras: Dict):
        """Return the list of constraint values (must vanish on gate rows)."""
        raise NotImplementedError


class NoopGate(Gate):
    name = "noop"

    def num_constraints(self):
        return 0

    def constraints(self, alg, wires, constants, extras):
        return []


class ArithmeticGate(Gate):
    """num_ops independent ops: out = c0 * x * y + c1 * z.

    Wires per op: [x, y, z, out]; shares the row's two constants (c0, c1)
    like plonky2's ArithmeticGate.
    """

    name = "arithmetic"
    degree = 3

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    def num_constraints(self):
        return self.num_ops

    def wires_for_op(self, i: int):
        base = 4 * i
        return base, base + 1, base + 2, base + 3

    def constraints(self, alg, wires, constants, extras):
        c0, c1 = constants[0], constants[1]
        out = []
        for i in range(self.num_ops):
            x, y, z, o = (wires[j] for j in self.wires_for_op(i))
            t = alg.mul(alg.mul(x, y), c0)
            t = alg.add(t, alg.mul(z, c1))
            out.append(alg.sub(o, t))
        return out


class ConstantGate(Gate):
    """num_ops wires pinned to per-row constants: w_i == const_i."""

    name = "constant"
    degree = 1

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    def num_constraints(self):
        return self.num_ops

    def constraints(self, alg, wires, constants, extras):
        return [alg.sub(wires[i], constants[i]) for i in range(self.num_ops)]


class PublicInputGate(Gate):
    """Wires 0..3 must equal the public-input hash (supplied at proving/
    verification time, not baked into the circuit)."""

    name = "public_input"
    degree = 1

    def num_constraints(self):
        return 4

    def constraints(self, alg, wires, constants, extras):
        pi_hash = extras["pi_hash"]  # 4 algebra values
        return [alg.sub(wires[i], pi_hash[i]) for i in range(4)]


def _m4_rows(alg, vals):
    return [
        _lin_comb(alg, [(M4[i][j], vals[j]) for j in range(4)]) for i in range(4)
    ]


def _lin_comb(alg, terms):
    acc = None
    for c, v in terms:
        t = v if c == 1 else alg.mul_const(v, c % P)
        acc = t if acc is None else alg.add(acc, t)
    return acc


def _external_linear_alg(alg, st):
    chunks = [_m4_rows(alg, st[i : i + 4]) for i in range(0, WIDTH, 4)]
    total = [
        alg.add(alg.add(chunks[0][i], chunks[1][i]), chunks[2][i]) for i in range(4)
    ]
    out = []
    for ch in chunks:
        out.extend(alg.add(ch[i], total[i]) for i in range(4))
    return out


def _internal_linear_alg(alg, st):
    s = st[0]
    for v in st[1:]:
        s = alg.add(s, v)
    return [
        alg.add(s, alg.mul_const(st[i], (_INT_DIAG[i] - 1) % P))
        for i in range(WIDTH)
    ]


class BitDecomposeGate(Gate):
    """num_ops values decomposed into `bits` boolean wires each (the range
    check primitive; role of the reference's U32RangeCheckGate).

    Wires per op: [value, b_0, ..., b_{bits-1}] (b_0 = LSB).
    Constraints: each bit boolean (b^2 - b), value = sum b_i 2^i.
    """

    name_prefix = "bit_decompose"
    degree = 2

    def __init__(self, num_ops: int, bits: int):
        self.num_ops = num_ops
        self.bits = bits
        self.name = f"{self.name_prefix}{bits}"

    def wires_for_op(self, i: int):
        base = (self.bits + 1) * i
        return base, list(range(base + 1, base + 1 + self.bits))

    def num_constraints(self):
        return self.num_ops * (self.bits + 1)

    def constraints(self, alg, wires, constants, extras):
        out = []
        for i in range(self.num_ops):
            v, bit_idx = self.wires_for_op(i)
            acc = None
            for k, bi in enumerate(bit_idx):
                b = wires[bi]
                out.append(alg.sub(alg.mul(b, b), b))  # booleanity
                term = alg.mul_const(b, 1 << k)
                acc = term if acc is None else alg.add(acc, term)
            out.append(alg.sub(wires[v], acc))
        return out


class IsZeroGate(Gate):
    """num_ops of: out = (x == 0), using a witness pseudo-inverse.

    Wires per op: [x, inv, out]; constraints: x*inv + out - 1 = 0 and
    x*out = 0 (so out=1 iff x=0, out=0 with inv=x^-1 otherwise).
    """

    name = "is_zero"
    degree = 2

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    def wires_for_op(self, i: int):
        return 3 * i, 3 * i + 1, 3 * i + 2

    def num_constraints(self):
        return 2 * self.num_ops

    def constraints(self, alg, wires, constants, extras):
        out = []
        for i in range(self.num_ops):
            x, inv, o = (wires[j] for j in self.wires_for_op(i))
            t = alg.add(alg.mul(x, inv), o)
            out.append(alg.sub(t, alg.constant(1)))
            out.append(alg.mul(x, o))
        return out


class Poseidon2FullRoundGate(Gate):
    """One external Poseidon2 round: out = M_E((in + rc)^7).

    Wires: [in_0..in_11, out_0..out_11]; rc from the row's 12 constants.
    `first` additionally applies the initial M_E to the raw inputs.
    """

    name_first = "p2_full_first"
    name_rest = "p2_full"
    degree = 7

    def __init__(self, first: bool):
        self.first = first
        self.name = self.name_first if first else self.name_rest

    def num_constraints(self):
        return WIDTH

    def constraints(self, alg, wires, constants, extras):
        inp = list(wires[:WIDTH])
        out = list(wires[WIDTH : 2 * WIDTH])
        if self.first:
            inp = _external_linear_alg(alg, inp)
        sboxed = [alg.exp7(alg.add(inp[i], constants[i])) for i in range(WIDTH)]
        mixed = _external_linear_alg(alg, sboxed)
        return [alg.sub(out[i], mixed[i]) for i in range(WIDTH)]


class Poseidon2PartialRoundGate(Gate):
    """One internal round: out = M_I(state with lane0 -> (lane0 + rc)^7)."""

    name = "p2_partial"
    degree = 7

    def num_constraints(self):
        return WIDTH

    def constraints(self, alg, wires, constants, extras):
        inp = list(wires[:WIDTH])
        out = list(wires[WIDTH : 2 * WIDTH])
        st = [alg.exp7(alg.add(inp[0], constants[0]))] + inp[1:]
        mixed = _internal_linear_alg(alg, st)
        return [alg.sub(out[i], mixed[i]) for i in range(WIDTH)]
