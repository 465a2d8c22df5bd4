"""Micro-benchmark the gl_u32 primitive costs inside a pallas kernel on
the real chip: time vs op-count slope for mul_lazy / sq_lazy / add_lazy /
mul_pow2_lazy / pltpu.roll / select.  Directs the roofline work: tells us
which primitive actually bounds the NTT and Poseidon2 kernels.

Run only on an idle tunnel:  python tools/probe_ops.py
"""

import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mp2_tpu.ops import gl_u32 as K

R, N = 8, 2048  # one block
TILES = 64      # data = 64 blocks = 8.4M u32 per plane


def _body(op, k, lo, hi):
    for i in range(k):
        lo, hi = op(lo, hi, i)
    return lo, hi


OPS = {
    "mul_lazy": lambda lo, hi, i: K.mul_lazy(lo, hi, hi, lo),
    "sq_lazy": lambda lo, hi, i: K.sq_lazy(lo, hi),
    "add_lazy": lambda lo, hi, i: K.add_lazy(lo, hi, hi, lo),
    "mul_pow2v": lambda lo, hi, i: K.mul_pow2_lazy(
        lo, hi, jnp.broadcast_to((lo[:1] & jnp.uint32(63)), lo.shape)
    ),
    "roll": lambda lo, hi, i: (
        pltpu.roll(lo, 1 + (i % 7), 1), pltpu.roll(hi, 2 + (i % 5), 1)
    ),
    "select": lambda lo, hi, i: (
        jnp.where((lo & jnp.uint32(1)) == 0, lo, hi),
        jnp.where((hi & jnp.uint32(1)) == 0, hi, lo),
    ),
    "mul32": lambda lo, hi, i: (lo * hi, hi + lo),
    "hwmul_pair": lambda lo, hi, i: K.mul32_wide(lo, hi),
}


def _kern(op, k):
    def kernel(x_ref, o_ref):
        lo = x_ref[:R]
        hi = x_ref[R:]
        lo, hi = _body(OPS[op], k, lo, hi)
        o_ref[:R] = lo
        o_ref[R:] = hi

    return kernel


def _compiled(op, k):
    return pl.pallas_call(
        _kern(op, k),
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((2 * R, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (2 * R, N), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((TILES * 2 * R, N), jnp.uint32),
    )


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    np.asarray(jax.device_get(leaf[..., :1]))


def _wall(fn, x, iters=6, rounds=3):
    _sync(fn(x))
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        _sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 2**32, size=(TILES * 2 * R, N), dtype=np.uint32)
    )
    elems = TILES * R * N
    with jax.enable_x64(False):
        for op in OPS:
            ks = (2, 18) if op not in ("mul_lazy", "mul_pow2v") else (2, 10)
            ts = {}
            for k in ks:
                fn = jax.jit(lambda v, op=op, k=k: _compiled(op, k)(v))
                ts[k] = _wall(fn, x)
            slope = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
            per_elem_ns = slope / elems * 1e9
            rate = elems / slope / 1e9 if slope > 0 else float("inf")
            print(
                f"{op:12s}: {slope*1e6:8.1f} us/op-pass  "
                f"{rate:7.1f} Gop/s  ({per_elem_ns*1000:.3f} ps/elem)",
                flush=True,
            )


if __name__ == "__main__":
    main()
