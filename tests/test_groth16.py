"""C++ BN254 Groth16 backend: pairing self-test + prove/verify roundtrip
binding revelation public inputs (groth16-framework role)."""

import pytest

from mp2_tpu import groth16


@pytest.fixture(scope="module")
def lib_ok():
    if not groth16.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_backend_available(lib_ok):
    # available() == True implies the pairing self-test passed:
    # r*G1 == O, r*G2 == O, bilinearity, non-degeneracy
    assert groth16.available()


def test_revelation_wrap_roundtrip(lib_ok):
    pis = [3, 1, 4, 1, 5, 9, 2, 6]
    bundle = groth16.wrap_revelation(pis)
    assert bundle.groth16_calldata is not None
    assert bundle.revelation_public_inputs == pis
    # deterministic binding commitment
    again = groth16.wrap_revelation(pis)
    assert again.groth16_calldata == bundle.groth16_calldata


def test_tampered_public_inputs_rejected(lib_ok):
    assert groth16.verify_tamper_rejected([3, 1, 4, 1, 5, 9, 2, 6])


def test_final_proof_bundle_uses_backend(lib_ok):
    b = groth16.FinalProofBundle.from_revelation([7, 8, 9])
    assert b.groth16_calldata is not None
