"""A/B the NTT pipelines and tile heights on the attached accelerator —
in ONE process (short-lived TPU subprocesses have wedged the axon tunnel;
see the project memory note).

Usage:  python tools/ntt_sweep.py [log_n]
Sweeps: default fused pipeline vs transpose-fused (MP2_NTT_FUSED_T),
then tile heights via in-process TILE_R overrides (new batch sizes force
fresh traces, so the override is picked up per variant).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax

# honor an explicit CPU request even though the axon sitecustomize forces
# jax_platforms=axon,cpu at interpreter start
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def sync(out):
    out.block_until_ready()
    np.asarray(jax.device_get(out[..., :1]))


def bench(fn, x, iters=3, rounds=3):
    t0 = time.perf_counter()
    sync(fn(x))
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best, compile_s


def main():
    from mp2_tpu.field import goldilocks as gl
    from mp2_tpu.ops import ntt_pallas as NP

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, gl.P, size=(1, n), dtype=np.uint64))

    # each variant MUST be jitted: eager dispatch over the axon tunnel
    # costs ~100ms per inter-kernel reshape/concat, swamping the kernels
    variants = [
        ("fused", jax.jit(lambda v: NP.ntt_four_step_fused(v, False))),
        ("fused_t", jax.jit(lambda v: NP.ntt_four_step_fused_t(v, False))),
    ]
    results = {}
    for name, fn in variants:
        try:
            dt, comp = bench(fn, x)
            results[name] = dt
            print(f"RESULT {name} tile_r={NP.TILE_R} "
                  f"{dt * 1e3:.3f} ms (compile {comp:.1f}s)", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {e}", flush=True)

    # tile-height sweep on the better variant (fresh jit wrapper per
    # TILE_R — the wrapper would otherwise reuse the first trace and
    # ignore the override; the inner lru caches key on n_tiles so they
    # miss naturally)
    best = min(results, key=results.get) if results else "fused"
    raw = {
        "fused": lambda v: NP.ntt_four_step_fused(v, False),
        "fused_t": lambda v: NP.ntt_four_step_fused_t(v, False),
    }[best]
    for tile_r in (16, 32):
        NP.TILE_R = tile_r
        try:
            dt, comp = bench(jax.jit(raw), x)
            print(f"RESULT {best} tile_r={tile_r} "
                  f"{dt * 1e3:.3f} ms (compile {comp:.1f}s)", flush=True)
        except Exception as e:
            print(f"{best} tile_r={tile_r} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
