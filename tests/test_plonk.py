"""End-to-end TP2 circuit engine: build -> witness -> prove -> verify."""

import random

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.field.goldilocks import P
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import test_config
from mp2_tpu.prover.prove import prove
from mp2_tpu.prover.verify import verify

rng = random.Random(5)


def _cubic_circuit():
    """Prove knowledge of x with x^3 + x + 5 == PI."""
    b = CircuitBuilder(test_config())
    xin = b.add_input()
    x2 = b.mul(xin, xin)
    x3 = b.mul(x2, xin)
    s = b.add(x3, xin)
    out = b.add_const(s, 5)
    b.register_public_input(out)
    data = b.build()
    return data, xin, out


def test_cubic_roundtrip():
    data, xin, out = _cubic_circuit()
    x_val = 3
    w = data.generate_witness({xin: x_val})
    pi = [(x_val**3 + x_val + 5) % P]
    data.check_witness(w, pi)
    proof = prove(data, w, pi)
    assert verify(data, proof)


def test_cubic_wrong_pi_rejected():
    data, xin, out = _cubic_circuit()
    w = data.generate_witness({xin: 3})
    bad_pi = [(3**3 + 3 + 5 + 1) % P]
    proof = prove(data, w, [(3**3 + 3 + 5) % P])
    proof.public_inputs = bad_pi
    assert not verify(data, proof)


def test_cubic_tampered_opening_rejected():
    data, xin, out = _cubic_circuit()
    w = data.generate_witness({xin: 3})
    pi = [(3**3 + 3 + 5) % P]
    proof = prove(data, w, pi)
    a, b2 = proof.openings.wires[0]
    proof.openings.wires[0] = ((a + 1) % P, b2)
    assert not verify(data, proof)


def test_poseidon_circuit_matches_host():
    cfg = test_config()
    b = CircuitBuilder(cfg)
    inputs = [rng.randrange(P) for _ in range(8)]
    in_targets = [b.constant(v) for v in inputs]
    out_targets = b.hash_no_pad(in_targets)
    b.register_public_inputs(out_targets)
    data = b.build()
    w = data.generate_witness({})
    want = list(p2h.hash_no_pad(inputs))
    data.check_witness(w, want)
    proof = prove(data, w, want)
    assert verify(data, proof)
    # wrong hash as PI must fail
    bad = [(want[0] + 1) % P] + want[1:]
    proof2 = prove(data, w, want)
    proof2.public_inputs = bad
    assert not verify(data, proof2)


import os as _os
import pytest as _pytest


@_pytest.mark.skipif(
    not _os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)
def test_production_config_proof():
    """Prove + verify at the PRODUCTION proof shape (default CircuitConfig:
    rate 1/8, cap_height 4, 28 query rounds, 16-bit grinding = ~100-bit FRI
    soundness) — not the lightened test_config."""
    from mp2_tpu.circuit.builder import CircuitBuilder
    from mp2_tpu.prover.config import CircuitConfig
    from mp2_tpu.prover.prove import prove
    from mp2_tpu.prover.verify import verify
    from mp2_tpu.hash import poseidon2_host as p2h

    cfg = CircuitConfig()
    assert cfg.fri.num_query_rounds == 28 and cfg.fri.proof_of_work_bits == 16
    b = CircuitBuilder(cfg)
    xs = b.add_inputs(2)
    h = b.hash_no_pad(xs)
    b.register_public_inputs(h + xs)
    data = b.build()
    vals = [123, 456]
    w = data.generate_witness(dict(zip(xs, vals)))
    pis = list(p2h.hash_no_pad(vals)) + vals
    proof = prove(data, w, pis)
    assert verify(data, proof)
    assert len(proof.fri.query_rounds) == 28
    bad = list(pis)
    bad[4] = 999
    proof.public_inputs = bad
    assert not verify(data, proof)
