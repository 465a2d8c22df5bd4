"""Measure the hot kernels on the real chip (round-4 roofline work).

Run ONLY with an idle tunnel (concurrent axon clients wedge each other —
STATUS gaps note 5).  Usage:
    python tools/probe_kernels.py [ntt|p2|sweep|all]

Measures:
  * 2^22 NTT wall (packed vs per-row lazy kernel) with chained-marginal
    device-time estimates ((t_k - t_1)/(k-1) cancels the dispatch tax)
  * Poseidon2 perms/s (new 3-D tile layout) at several batch sizes
  * MP2_NTT_TILE_R sweep for the packed kernel
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def _init():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    d = jax.devices()[0]
    print("device:", d, flush=True)
    return jax


def _sync(out):
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    np.asarray(jax.device_get(leaf[..., :1]))


def _wall(fn, args, iters, rounds=3):
    _sync(fn(*args))
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def _chained(fn, x, ks=(1, 9)):
    """Marginal per-call device time: run k chained calls in ONE jit so
    dispatch is paid once; slope between the two k values is the device
    time per call."""
    import jax

    times = {}
    for k in ks:

        @jax.jit
        def chain(v, k=k):
            for _ in range(k):
                v = fn(v)
            return v

        times[k] = _wall(chain, (x,), iters=4)
    k0, k1 = ks
    return (times[k1] - times[k0]) / (k1 - k0), times


def probe_ntt():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mp2_tpu.field import goldilocks as gl
    from mp2_tpu.field.goldilocks import GF
    from mp2_tpu.prover import ntt

    rng = np.random.default_rng(0)
    n = 1 << 22
    x = GF(jnp.asarray(rng.integers(0, gl.P, size=(n,), dtype=np.uint64)))

    for packed in ("1", "0"):
        os.environ["MP2_NTT_PACKED"] = packed
        # new env -> new lru keys only via recompile; the compiled cache
        # keys ignore env, so clear them
        from mp2_tpu.ops import ntt_pallas as npall

        npall._compiled_fused_lazy.cache_clear()
        npall._compiled_fused_lazy_pk.cache_clear()
        fn = jax.jit(lambda v: ntt.ntt(v))
        w = _wall(fn, (x,), iters=8)
        marg, times = _chained(lambda v: ntt.ntt(v), x)
        print(
            f"ntt 2^22 packed={packed}: wall {w*1e3:.3f} ms, "
            f"marginal {marg*1e3:.3f} ms (chain times "
            f"{ {k: round(v*1e3,2) for k,v in times.items()} })",
            flush=True,
        )
    os.environ.pop("MP2_NTT_PACKED", None)


def probe_p2():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mp2_tpu.field import goldilocks as gl
    from mp2_tpu.field.goldilocks import GF
    from mp2_tpu.hash import poseidon2 as p2

    rng = np.random.default_rng(0)
    for logb in (18, 20):
        B = 1 << logb
        st = GF(
            jnp.asarray(rng.integers(0, gl.P, size=(B, 12), dtype=np.uint64))
        )
        w = _wall(p2.permute, (st,), iters=6)
        marg, times = _chained(p2.permute, st)
        print(
            f"poseidon2 B=2^{logb}: wall {w*1e3:.3f} ms = {B/w/1e6:.2f} M/s; "
            f"marginal {marg*1e3:.3f} ms = {B/marg/1e6:.2f} M/s",
            flush=True,
        )
        # planar (per-lane) entry: no transposes around the kernel
        lanes = [st[..., i] for i in range(12)]
        wp = _wall(lambda *ls: p2.permute_lanes(list(ls)), tuple(lanes),
                   iters=6)
        margp, _ = _chained(
            lambda ls: tuple(p2.permute_lanes(list(ls))), tuple(lanes)
        )
        print(
            f"poseidon2 planar B=2^{logb}: wall {wp*1e3:.3f} ms = "
            f"{B/wp/1e6:.2f} M/s; marginal {margp*1e3:.3f} ms = "
            f"{B/margp/1e6:.2f} M/s",
            flush=True,
        )


def probe_sweep():
    """TILE_R sweep for the packed kernel (needs fresh processes for the
    module-level TILE_R constant; done via env + subprocess)."""
    import subprocess

    for tile_r in (8, 16, 32):
        env = dict(os.environ, MP2_NTT_TILE_R=str(tile_r))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "ntt"],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        print(f"TILE_R={tile_r}:")
        print("  " + "\n  ".join(r.stdout.strip().splitlines()[-2:]))


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    _init()
    if what in ("ntt", "all"):
        probe_ntt()
    if what in ("p2", "all"):
        probe_p2()
    if what == "sweep":
        probe_sweep()
