"""Demo: Goldilocks field arithmetic through the public mp2_tpu API.

Run: JAX_PLATFORMS=cpu python demos/demo_field.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env

from mp2_tpu.field import goldilocks as gl

print(f"devices: {jax.devices()}")
P = gl.P
print(f"Goldilocks p = {P} = 2^64 - 2^32 + 1")

a_vals = [3, 1 << 40, P - 1, 1234567890123456789]
b_vals = [5, 1 << 30, P - 2, 9876543210987654321]
a, b = gl.from_u64(a_vals), gl.from_u64(b_vals)

t0 = time.time()
ops = {
    "a + b": (gl.add(a, b), [(x + y) % P for x, y in zip(a_vals, b_vals)]),
    "a - b": (gl.sub(a, b), [(x - y) % P for x, y in zip(a_vals, b_vals)]),
    "a * b": (gl.mul(a, b), [(x * y) % P for x, y in zip(a_vals, b_vals)]),
    "a^-1 ": (gl.inv(a), [pow(x, P - 2, P) for x in a_vals]),
}
ok = True
for name, (got_gf, want) in ops.items():
    got = [int(v) for v in gl.to_u64(got_gf)]
    status = "OK " if got == want else "FAIL"
    ok &= got == want
    print(f"  {name}: {status} {got}")

w = gl.POWER_OF_TWO_GENERATOR
print(f"2^32-th root of unity: {w}")
print(f"  w^(2^32) == 1: {pow(w, 1 << 32, P) == 1}")
print(f"elapsed {time.time()-t0:.2f}s")
sys.exit(0 if ok else 1)
