"""Parameter persistence: deterministic builds, verifier-data round-trip,
verification from reloaded parameters (reference mp2-v1/src/api.rs:618-636)."""

import os
import tempfile

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.field.goldilocks import P
from mp2_tpu.prover import params as PP
from mp2_tpu.prover.config import test_config
from mp2_tpu.prover.prove import prove
from mp2_tpu.prover.verify import verify


def _build():
    b = CircuitBuilder(test_config())
    x = b.add_input()
    out = b.add_const(b.mul(x, x), 7)
    b.register_public_input(out)
    return b.build(), x


def test_deterministic_params():
    d1, _ = _build()
    d2, _ = _build()
    assert d1.circuit_digest == d2.circuit_digest
    assert PP.verifier_data_to_bytes(PP.verifier_data(d1)) == (
        PP.verifier_data_to_bytes(PP.verifier_data(d2))
    )


def test_verify_from_reloaded_params():
    data, x = _build()
    w = data.generate_witness({x: 5})
    pi = [(25 + 7) % P]
    proof = prove(data, w, pi)

    vd = PP.verifier_data_from_bytes(
        PP.verifier_data_to_bytes(PP.verifier_data(data))
    )
    assert vd.circuit_digest == data.circuit_digest
    assert verify(vd, proof)
    proof.public_inputs = [33]
    assert not verify(vd, proof)


def test_npz_roundtrip():
    data, _ = _build()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "params.npz")
        PP.save_fixed_columns(data, path)
        vd = PP.load_verifier_data(path)
        assert vd.circuit_digest == data.circuit_digest
        assert vd.fixed_cap_host == data.fixed_cap_host
