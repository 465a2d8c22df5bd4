"""Demo: the in-circuit universal verifier.

Proves a tiny inner circuit (h = H(x, y)), builds an OUTER circuit that
contains a complete verifier for that proof (transcript replay, zeta
identity, full FRI verification), and checks every outer constraint is
satisfied by the honest proof — then that a tampered proof is rejected.
Runs on CPU in a few minutes (constraint checking only; the outer prove
path is exercised by MP2_SLOW tests and the TPU bench).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import test_config
from mp2_tpu.prover.prove import prove
from mp2_tpu.prover.verify import verify
from mp2_tpu.recursion.verifier_gadget import (
    CommonData,
    add_virtual_proof,
    set_proof_witness,
    verify_proof_circuit,
)

P = (1 << 64) - (1 << 32) + 1


def main():
    cfg = test_config()
    t0 = time.time()
    bi = CircuitBuilder(cfg)
    xs = bi.add_inputs(2)
    h = bi.hash_no_pad(xs)
    bi.register_public_inputs(h + xs)
    inner = bi.build()
    vals = [5, 7]
    w = inner.generate_witness(dict(zip(xs, vals)))
    pis = list(p2h.hash_no_pad(vals)) + vals
    proof = prove(inner, w, pis)
    assert verify(inner, proof)
    print(f"inner proof (n={inner.n}) proved+verified ({time.time()-t0:.1f}s)")

    t0 = time.time()
    bo = CircuitBuilder(cfg)
    pt = add_virtual_proof(bo, CommonData.of(inner))
    cap = [[bo.constant(int(v)) for v in row] for row in inner.fixed_cap_host]
    verify_proof_circuit(bo, CommonData.of(inner), pt, cap)
    bo.register_public_inputs(pt.public_inputs)
    outer = bo.build()
    print(f"outer verifier circuit: n={outer.n} rows ({time.time()-t0:.1f}s)")

    t0 = time.time()
    inputs = {}
    set_proof_witness(inputs, pt, proof)
    wo = outer.generate_witness(inputs)
    outer.check_witness(wo, pis)
    print(f"outer constraints all satisfied by the honest proof "
          f"({time.time()-t0:.1f}s)")

    import copy

    bad = copy.deepcopy(proof)
    a, b = bad.openings.wires[0]
    bad.openings.wires[0] = ((a + 1) % P, b)
    try:
        inputs2 = {}
        set_proof_witness(inputs2, pt, bad)
        w2 = outer.generate_witness(inputs2)
        outer.check_witness(w2, pis)
        print("ERROR: tampered proof accepted")
    except (ValueError, AssertionError):
        print("tampered inner proof rejected: True")


if __name__ == "__main__":
    main()
