"""In-circuit EcGFp5 gadgets: bit-exact vs the host digest stack
(group_hashing counterpart: map_to_curve_point + point addition)."""

import numpy as np
import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.circuit.gadgets import gfp5 as qg
from mp2_tpu.circuit.gadgets.curve import (
    curve_add,
    curve_constant,
    curve_sum,
    curve_to_pi_targets,
    curve_zero,
    map_to_curve_point_circuit,
)
from mp2_tpu.field import gfp5
from mp2_tpu.field.ecgfp5 import Point
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import test_config


def _check(b, inputs, pis):
    data = b.build()
    w = data.generate_witness(inputs)
    data.check_witness(w, pis)
    return data


def test_quint_mul_inv_matches_host():
    b = CircuitBuilder(test_config())
    xs = b.add_inputs(5)
    ys = b.add_inputs(5)
    prod = qg.q_mul(b, tuple(xs), tuple(ys))
    inv = qg.q_inv(b, tuple(xs))
    b.register_public_inputs(list(prod) + list(inv))
    rng = np.random.default_rng(0)
    xv = tuple(int(v) for v in rng.integers(1, 2**63, 5))
    yv = tuple(int(v) for v in rng.integers(1, 2**63, 5))
    inputs = dict(zip(xs, xv))
    inputs.update(dict(zip(ys, yv)))
    want = list(gfp5.mul(xv, yv)) + list(gfp5.inv(xv))
    _check(b, inputs, want)


def test_curve_add_matches_host():
    p1 = p2h.map_to_curve_point([1, 2])
    p2 = p2h.map_to_curve_point([3, 4])
    cases = [
        (p1, p2),
        (p1, p1),            # doubling
        (p1, -p1),           # neutral result
        (Point.neutral(), p2),
        (p1, Point.neutral()),
        (Point.neutral(), Point.neutral()),
    ]
    b = CircuitBuilder(test_config())
    outs = []
    for a, c in cases:
        s = curve_add(b, curve_constant(b, a), curve_constant(b, c))
        outs.extend(curve_to_pi_targets(b, s))
    b.register_public_inputs(outs)
    want = []
    for a, c in cases:
        want.extend((a + c).to_fields())
    _check(b, {}, want)


def test_map_to_curve_matches_host():
    b = CircuitBuilder(test_config())
    ins = b.add_inputs(2)
    pt = map_to_curve_point_circuit(b, ins)
    b.register_public_inputs(curve_to_pi_targets(b, pt))
    vals = [7, 11]
    want = p2h.map_to_curve_point(vals).to_fields()
    _check(b, dict(zip(ins, vals)), want)


def test_digest_accumulation_matches_host():
    """Order-agnostic multiset digest: sum of mapped points in-circuit ==
    host add_points (the branch-circuit digest accumulation semantics)."""
    b = CircuitBuilder(test_config())
    ins = [b.add_inputs(2) for _ in range(3)]
    pts = [map_to_curve_point_circuit(b, i) for i in ins]
    total = curve_sum(b, pts)
    b.register_public_inputs(curve_to_pi_targets(b, total))
    vals = [[1, 2], [3, 4], [5, 6]]
    inputs = {}
    for ts, vs in zip(ins, vals):
        inputs.update(dict(zip(ts, vs)))
    want = Point.neutral()
    for vs in vals:
        want = want + p2h.map_to_curve_point(vs)
    _check(b, inputs, want.to_fields())
