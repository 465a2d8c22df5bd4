"""Sweep NTT pallas tile heights on the real TPU: run one subprocess per
MP2_NTT_TILE_R value and report the 2^22 forward-NTT wall time.

Usage:  python tools/ntt_sweep.py [tile_r ...]
"""

import json
import os
import subprocess
import sys

_CHILD = """
import os, sys, time
sys.path.insert(0, %(repo)r)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(%(repo)r, ".jax_cache")
)
import jax, jax.numpy as jnp
import numpy as np
from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF
from mp2_tpu.prover import ntt

n = 1 << 22
rng = np.random.default_rng(0)
x = GF(jnp.asarray(rng.integers(0, gl.P, size=(n,), dtype=np.uint64)))
fn = jax.jit(lambda v: ntt.ntt(v))

def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    np.asarray(jax.device_get(leaf[..., :1]))

t0 = time.perf_counter()
sync(fn(x))
compile_s = time.perf_counter() - t0
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(x)
    sync(out)
    dt = (time.perf_counter() - t0) / 3
    best = dt if best is None else min(best, dt)
print("RESULT", os.environ.get("MP2_NTT_TILE_R", "8"), round(best * 1e3, 3),
      "ms  (compile", round(compile_s, 1), "s)")
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tiles = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    for t in tiles:
        env = dict(os.environ, MP2_NTT_TILE_R=str(t))
        r = subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": repo}],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                break
        else:
            print(f"TILE_R={t} FAILED:", r.stderr.strip()[-400:], flush=True)


if __name__ == "__main__":
    main()
