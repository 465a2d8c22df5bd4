import time

# the axon sitecustomize overrides JAX_PLATFORMS at interpreter start;
# force CPU the way tests/conftest.py does
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import test_config
from mp2_tpu.prover.fri import FriConfig
from mp2_tpu.prover.prove import prove
from mp2_tpu.prover.verify import verify
from mp2_tpu.recursion.verifier_gadget import (
    CommonData,
    add_virtual_proof,
    set_proof_witness,
    verify_proof_circuit,
)

cfg = test_config(
    fri=FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=2,
                  num_query_rounds=2)
)
t0 = time.time()
b = CircuitBuilder(cfg)
xs = b.add_inputs(2)
h = b.hash_no_pad(xs)
b.register_public_inputs(h + xs)
data = b.build()
print("inner build", round(time.time() - t0, 1), "n=", data.n, flush=True)
t0 = time.time()
vals = [5, 7]
w = data.generate_witness(dict(zip(xs, vals)))
pis = list(p2h.hash_no_pad(vals)) + vals
proof = prove(data, w, pis)
print("inner prove", round(time.time() - t0, 1), flush=True)
t0 = time.time()
common = CommonData.of(data)
b2 = CircuitBuilder(cfg)
pt = add_virtual_proof(b2, common)
cap = [[b2.constant(int(v)) for v in row] for row in data.fixed_cap_host]
verify_proof_circuit(b2, common, pt, cap)
b2.register_public_inputs(pt.public_inputs)
od = b2.build()
print("outer build", round(time.time() - t0, 1), "n=", od.n, flush=True)
t0 = time.time()
inputs = {}
set_proof_witness(inputs, pt, proof)
w2 = od.generate_witness(inputs)
print("outer witness", round(time.time() - t0, 1), flush=True)
t0 = time.time()
p2 = prove(od, w2, pis)
print("outer prove", round(time.time() - t0, 1), flush=True)
t0 = time.time()
assert verify(od, p2)
print("outer verify", round(time.time() - t0, 1), flush=True)
