"""In-circuit u256 gadget: comparisons, equality, addition with carries."""

import random

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.circuit.gadgets.u256 import (
    add_virtual_u256,
    set_u256,
    u256_add,
    u256_equal,
    u256_less_than,
    u256_select,
)
from mp2_tpu.prover.config import test_config
from mp2_tpu.prover.prove import prove
from mp2_tpu.prover.verify import verify

rng = random.Random(77)


def _cmp_circuit():
    b = CircuitBuilder(test_config())
    x = add_virtual_u256(b)
    y = add_virtual_u256(b)
    lt = u256_less_than(b, x, y)
    eq = u256_equal(b, x, y)
    s, overflow = u256_add(b, x, y)
    b.register_public_input(lt)
    b.register_public_input(eq)
    b.register_public_inputs(list(s.limbs))
    b.register_public_input(overflow)
    return b.build(), x, y


DATA = None


def _data():
    global DATA
    if DATA is None:
        DATA = _cmp_circuit()
    return DATA


@pytest.mark.parametrize(
    "xv,yv",
    [
        (5, 9),
        (9, 5),
        (7, 7),
        (0, 0),
        ((1 << 256) - 1, 1),
        (1 << 255, (1 << 255) - 1),
        (123456789 << 128, 123456789 << 128),
    ],
)
def test_u256_semantics(xv, yv):
    data, x, y = _data()
    inputs = {}
    set_u256(inputs, x, xv)
    set_u256(inputs, y, yv)
    w = data.generate_witness(inputs)
    total = xv + yv
    want_limbs = [(total % (1 << 256)) >> (32 * (7 - i)) & 0xFFFFFFFF for i in range(8)]
    pis = (
        [1 if xv < yv else 0, 1 if xv == yv else 0]
        + want_limbs
        + [1 if total >> 256 else 0]
    )
    data.check_witness(w, pis)


def test_u256_prove_verify():
    data, x, y = _data()
    inputs = {}
    set_u256(inputs, x, 5)
    set_u256(inputs, y, 9)
    w = data.generate_witness(inputs)
    pis = [1, 0] + [0] * 7 + [14, 0]
    proof = prove(data, w, pis)
    assert verify(data, proof)
    # forged comparison result must fail
    proof2 = prove(data, w, pis)
    proof2.public_inputs = [0, 0] + [0] * 7 + [14, 0]
    assert not verify(data, proof2)


def test_u256_mul_divmod():
    from mp2_tpu.circuit.gadgets.u256 import u256_div_mod, u256_mul
    from mp2_tpu.utils.u256 import u256_to_fields

    b = CircuitBuilder(test_config())
    x = add_virtual_u256(b)
    y = add_virtual_u256(b)
    prod, ovf = u256_mul(b, x, y)
    q, r = u256_div_mod(b, x, y)
    b.register_public_inputs(list(prod.limbs))
    b.register_public_input(ovf)
    b.register_public_inputs(list(q.limbs))
    b.register_public_inputs(list(r.limbs))
    data = b.build()

    cases = [
        (7, 3),
        (12345678901234567890, 97),
        ((1 << 200) + 5, (1 << 100) + 11),
        ((1 << 255), (1 << 255) - 1),  # product overflows 2^256
        (42, 0),  # division by zero convention
    ]
    for xv, yv in cases:
        inputs = {}
        set_u256(inputs, x, xv)
        set_u256(inputs, y, yv)
        w = data.generate_witness(inputs)
        total = xv * yv
        want = (
            u256_to_fields(total % (1 << 256))
            + [1 if total >> 256 else 0]
            + u256_to_fields(xv // yv if yv else 0)
            + u256_to_fields(xv % yv if yv else 0)
        )
        data.check_witness(w, want)

    # prove + verify one case
    inputs = {}
    set_u256(inputs, x, 12345678901234567890)
    set_u256(inputs, y, 97)
    w = data.generate_witness(inputs)
    total = 12345678901234567890 * 97
    pis = (
        u256_to_fields(total)
        + [0]
        + u256_to_fields(12345678901234567890 // 97)
        + u256_to_fields(12345678901234567890 % 97)
    )
    proof = prove(data, w, pis)
    assert verify(data, proof)
