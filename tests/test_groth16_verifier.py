"""Full in-SNARK TP2 verifier: the R1CSBuilder adapter runs the one
canonical verifier gadget (recursion/verifier_gadget.verify_proof_circuit)
over emulated Goldilocks inside a BN254 R1CS — the reference's
gnark-plonky2-verifier role (gnark-utils/lib/lib.go)."""

import copy
import os

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import test_config
from mp2_tpu.prover.prove import prove
from mp2_tpu.prover.verify import verify

P = (1 << 64) - (1 << 32) + 1

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)


@pytest.fixture(scope="module")
def inner():
    """A tiny but structurally complete TP2 proof (hash gate + publics)."""
    cfg = test_config(
        fri=test_config().fri.__class__(
            rate_bits=3, cap_height=1, proof_of_work_bits=4, num_query_rounds=2
        ),
    )
    b = CircuitBuilder(cfg)
    xs = b.add_inputs(2)
    h = b.hash_no_pad(xs)
    b.register_public_inputs(h + xs)
    data = b.build()
    vals = [5, 7]
    w = data.generate_witness(dict(zip(xs, vals)))
    pis = list(p2h.hash_no_pad(vals)) + vals
    proof = prove(data, w, pis)
    assert verify(data, proof)
    return data, proof, pis


@slow
def test_tp2_verifier_r1cs_satisfied(inner):
    from mp2_tpu.groth16.r1cs_builder import build_tp2_verifier_r1cs

    data, proof, pis = inner
    r1cs, digest = build_tp2_verifier_r1cs(data, proof)
    assert r1cs.check()
    assert r1cs.num_public == len(pis)
    # publics are the proof's public inputs, in order
    assert r1cs.witness[1 : 1 + len(pis)] == [int(v) % P for v in pis]
    print(f"verifier R1CS: {len(r1cs.rows)} rows, {len(r1cs.witness)} wires")


@slow
def test_tp2_verifier_r1cs_rejects_tampered(inner):
    from mp2_tpu.groth16.r1cs_builder import build_tp2_verifier_r1cs

    data, proof, _ = inner
    bad = copy.deepcopy(proof)
    a, b_ = bad.openings.wires[0]
    bad.openings.wires[0] = ((a + 1) % P, b_)
    with pytest.raises((ValueError, AssertionError)):
        build_tp2_verifier_r1cs(data, bad)

    bad = copy.deepcopy(proof)
    bad.public_inputs = list(bad.public_inputs)
    bad.public_inputs[0] = (bad.public_inputs[0] + 1) % P
    with pytest.raises((ValueError, AssertionError)):
        build_tp2_verifier_r1cs(data, bad)


@slow
def test_tp2_verifier_groth16_roundtrip(inner):
    """The whole on-chain story in one test: TP2 proof -> in-SNARK verifier
    R1CS -> native BN254 Groth16 setup/prove/verify."""
    from mp2_tpu.groth16 import _run_r1cs, available

    if not available():
        pytest.skip("native bn254 backend not built")
    from mp2_tpu.groth16.r1cs_builder import build_tp2_verifier_r1cs

    data, proof, pis = inner
    r1cs, _ = build_tp2_verifier_r1cs(data, proof)
    assert _run_r1cs(r1cs, 42, False) == 0


@slow
def test_tp2_verifier_r1cs_production_shape():
    """VERDICT r3 item 3: the in-SNARK verifier R1CS built against a proof
    at the PRODUCTION CircuitConfig (rate 1/8, cap_height 4, 28 FRI query
    rounds, 16 PoW bits — the reference verifies production plonky2 shapes
    in gnark, gnark-utils/lib/lib.go:1-50).  Builds via the stamped
    Poseidon2 template and satisfaction-checks; sizes/times printed for
    STATUS."""
    import time

    from mp2_tpu.groth16.r1cs_builder import build_tp2_verifier_r1cs
    from mp2_tpu.prover.config import CircuitConfig

    cfg = CircuitConfig()  # production FRI soundness
    assert cfg.fri.num_query_rounds == 28 and cfg.fri.cap_height == 4

    b = CircuitBuilder(cfg)
    xs = b.add_inputs(2)
    h = b.hash_no_pad(xs)
    b.register_public_inputs(h + xs)
    data = b.build()
    vals = [5, 7]
    w = data.generate_witness(dict(zip(xs, vals)))
    pis = list(p2h.hash_no_pad(vals)) + vals
    t0 = time.perf_counter()
    proof = prove(data, w, pis)
    t_prove = time.perf_counter() - t0
    assert verify(data, proof)

    t0 = time.perf_counter()
    r1cs, _ = build_tp2_verifier_r1cs(data, proof)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    assert r1cs.check()
    t_check = time.perf_counter() - t0
    assert r1cs.witness[1 : 1 + len(pis)] == [int(v) % P for v in pis]
    print(
        f"PRODUCTION verifier R1CS: {len(r1cs.rows)} rows, "
        f"{len(r1cs.witness)} wires (inner prove {t_prove:.0f}s, "
        f"build {t_build:.0f}s, check {t_check:.0f}s)"
    )


@slow
def test_tp2_verifier_groth16_production():
    """The FULL on-chain story at the production proof shape (VERDICT r3
    item 3): a TP2 proof at the production CircuitConfig (rate 1/8,
    cap_height 4, 28 FRI query rounds, 16 PoW bits) -> the complete
    in-SNARK verifier R1CS (~102M rows) -> native BN254 Groth16
    setup/prove/verify through the zero-copy CSR intake.  Expect hours of
    wall time; run alone on an idle box."""
    import time

    from mp2_tpu.groth16 import _run_r1cs_csr, available
    from mp2_tpu.groth16.r1cs_builder import build_tp2_verifier_r1cs
    from mp2_tpu.prover.config import CircuitConfig

    if not available():
        pytest.skip("native bn254 backend not built")

    cfg = CircuitConfig()  # production FRI soundness
    assert cfg.fri.num_query_rounds == 28 and cfg.fri.cap_height == 4

    b = CircuitBuilder(cfg)
    xs = b.add_inputs(2)
    h = b.hash_no_pad(xs)
    b.register_public_inputs(h + xs)
    data = b.build()
    vals = [5, 7]
    w = data.generate_witness(dict(zip(xs, vals)))
    pis = list(p2h.hash_no_pad(vals)) + vals
    proof = prove(data, w, pis)
    assert verify(data, proof)

    t0 = time.perf_counter()
    r1cs, _ = build_tp2_verifier_r1cs(data, proof)
    t_build = time.perf_counter() - t0
    n_rows = len(r1cs.rows)
    t0 = time.perf_counter()
    rc = _run_r1cs_csr(r1cs, 42, False)
    t_g16 = time.perf_counter() - t0
    assert rc == 0, f"groth16 csr rc={rc}"
    print(
        f"PRODUCTION Groth16 wrap: {n_rows} rows, R1CS build {t_build:.0f}s, "
        f"setup+prove+verify {t_g16:.0f}s"
    )
