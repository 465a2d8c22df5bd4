"""Poseidon2 kernel option sweep on the real chip (VERDICT r5 item 1:
planar >= 30M perms/s).  Each config in a subprocess (TILE_L/_UNROLL are
import-time constants).  Times the PLANAR (per-lane) entry at 2^20 like
bench.py, plus the (B,12) entry for reference.

Run standalone (the only axon process): python probe_p2_opts.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    ("baseline", {}),
    ("unroll", {"MP2_P2_UNROLL": "1"}),
    ("tile256", {"MP2_P2_TILE_L": "256"}),
    ("tile1024", {"MP2_P2_TILE_L": "1024"}),
    ("tile2048", {"MP2_P2_TILE_L": "2048"}),
    ("tile1024_unroll", {"MP2_P2_TILE_L": "1024", "MP2_P2_UNROLL": "1"}),
    ("tile2048_unroll", {"MP2_P2_TILE_L": "2048", "MP2_P2_UNROLL": "1"}),
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
from mp2_tpu.hash import poseidon2 as p2
from mp2_tpu.hash import poseidon2_host as p2h

B = int(os.environ.get("BENCH_P2_BATCH", str(1 << 20)))
rng = np.random.default_rng(0)
states = GF(jnp.asarray(rng.integers(0, gl.P, size=(B, 12), dtype=np.uint64)))
lanes = [states[..., i] for i in range(12)]

def sync(o):
    v = o[0].v if isinstance(o, list) else o.v
    v.block_until_ready()
    np.asarray(jax.device_get(v.reshape(-1)[:1]))

# correctness: first 4 states vs host permutation
small = [GF(l.v[:8]) for l in lanes]
got = p2.permute_lanes(small)
want_rows = [p2h.permute([int(states.v[b, i]) for i in range(12)])
             for b in range(8)]
for i in range(12):
    col = [int(r[i]) for r in want_rows]
    assert [int(x) for x in gl.to_u64(got[i])] == col, "planar mismatch"

sync(p2.permute_lanes(lanes))  # compile+warm
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(8):
        o = p2.permute_lanes(lanes)
    sync(o)
    dt = (time.perf_counter() - t0) / 8
    best = dt if best is None else min(best, dt)
print(json.dumps({"planar_perms_per_s": int(B / best),
                  "planar_ms": round(best*1e3, 3)}))
"""


def main():
    results = {}
    for name, env in CONFIGS:
        e = dict(os.environ, **env)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", CHILD % {"repo": REPO}],
                           capture_output=True, text=True, env=e,
                           timeout=1200)
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
