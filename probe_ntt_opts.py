"""NTT kernel option sweep on the real chip (VERDICT r5 item 1).

Each configuration runs in a SUBPROCESS (module-level TILE_R and kernel
selection are bound at import) and times the jitted 2^22 NTT exactly like
bench.py.  Configs probe: packed-pair stages (half the twiddle muls),
tile-height sweep, and the transpose-fused pipeline (zero XLA transposes)
at tile heights the Mosaic lowering accepts.

Run standalone (the only axon process): python probe_ntt_opts.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    ("baseline", {}),
    ("packed", {"MP2_NTT_PACKED": "1"}),
    ("tile16", {"MP2_NTT_TILE_R": "16"}),
    ("tile16_packed", {"MP2_NTT_TILE_R": "16", "MP2_NTT_PACKED": "1"}),
    ("tile32_packed", {"MP2_NTT_TILE_R": "32", "MP2_NTT_PACKED": "1"}),
    ("tile64_packed", {"MP2_NTT_TILE_R": "64", "MP2_NTT_PACKED": "1"}),
    ("fused_t_tile128", {"MP2_NTT_FUSED_T": "1", "MP2_NTT_TILE_R": "128"}),
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", %(repo)r + "/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF
from mp2_tpu.prover import ntt

LOG_N = int(os.environ.get("BENCH_LOG_N", "22"))
n = 1 << LOG_N
rng = np.random.default_rng(0)
x = GF(jnp.asarray(rng.integers(0, gl.P, size=(n,), dtype=np.uint64)))
fn = jax.jit(lambda v: ntt.ntt(v))

def sync(o):
    o.v.block_until_ready()
    np.asarray(jax.device_get(o.v[:1]))

sync(fn(x))  # compile+warm
# correctness spot check vs the host transform on a small prefix shape
xs = GF(x.v[:4096])
got = [int(v) for v in gl.to_u64(jax.jit(lambda v: ntt.ntt(v))(xs))]
want = ntt.host_ntt([int(v) for v in gl.to_u64(xs)])
assert got == [int(v) for v in want], "2^12 NTT mismatch under this config"
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(8):
        o = fn(x)
    sync(o)
    dt = (time.perf_counter() - t0) / 8
    best = dt if best is None else min(best, dt)
tiny = GF(jnp.arange(8, dtype=jnp.uint64))
tf = jax.jit(lambda v: gl.add_const(v, 1))
sync(tf(tiny))
d0 = time.perf_counter()
for _ in range(10):
    o = tf(tiny)
sync(o)
disp = (time.perf_counter() - d0) / 10
print(json.dumps({"wall_ms": round(best*1e3, 3),
                  "minus_dispatch_ms": round((best-disp)*1e3, 3),
                  "dispatch_ms": round(disp*1e3, 3)}))
"""


def main():
    results = {}
    for name, env in CONFIGS:
        e = dict(os.environ, **env)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", CHILD % {"repo": REPO}],
                           capture_output=True, text=True, env=e,
                           timeout=1500)
        line = next((ln for ln in reversed(r.stdout.splitlines())
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            results[name] = json.loads(line)
            results[name]["total_s"] = round(time.time() - t0, 1)
            print(f"{name:18s} {results[name]}", flush=True)
        else:
            tail = (r.stderr or r.stdout)[-300:]
            results[name] = {"error": tail}
            print(f"{name:18s} FAILED: {tail}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
