"""Demo: TP2 prove+verify roundtrip through the public API.

Proves knowledge of x with x^3 + x + 5 == 35 (public input), then verifies.
Run: python demos/demo_prove.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax

jax.config.update("jax_platforms", "cpu")
os.makedirs(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.field.goldilocks import P
from mp2_tpu.prover.config import test_config
from mp2_tpu.prover.prove import prove
from mp2_tpu.prover.verify import verify

t0 = time.time()
b = CircuitBuilder(test_config())
x = b.add_input()
x3 = b.mul(b.mul(x, x), x)
out = b.add_const(b.add(x3, x), 5)
b.register_public_input(out)
data = b.build()
print(f"circuit built: n={data.n} rows, {data.num_gate_types} gate types "
      f"({time.time()-t0:.1f}s)")

t0 = time.time()
w = data.generate_witness({x: 3})
pi = [(3**3 + 3 + 5) % P]
proof = prove(data, w, pi)
print(f"proved x^3+x+5 == {pi[0]} ({time.time()-t0:.1f}s)")

t0 = time.time()
ok = verify(data, proof)
print(f"verify: {ok} ({time.time()-t0:.1f}s)")

bad = prove(data, w, pi)
bad.public_inputs = [36]
print(f"wrong public input rejected: {not verify(data, bad)}")
sys.exit(0 if ok else 1)
