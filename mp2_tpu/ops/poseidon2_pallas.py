"""Pallas TPU kernel: batched Poseidon2 permutation.

Layout (round-4 rework): the batch axis is folded to a (8, L) trailing
pair so EVERY elementwise op in the round functions runs on full
(8, 128)-tiled registers.  The previous layout kept state as (12, B) —
partial-round sboxes then computed on (1, B) slices and the external
layer on (3, B) slices, wasting 7/8 resp. 5/8 of the VPU sublanes
(measured ~30% utilization).  With state as (12, 8, L) the same math
runs on (1, 8, L)/(3, 8, L) shapes — all full tiles.

lo/hi u32 limb planes are stacked into one (24, 8, TILE_L) block per
grid step (8*TILE_L batch elements), processed entirely in VMEM — all 30
rounds run with no HBM round-trips.  Field math is the lazy u32-pair
dialect (ops/gl_u32.py): non-canonical intermediates, one
canonicalization at kernel exit.

Rounds are rolled with lax.fori_loop over round-constant tables passed
as kernel inputs, keeping the Mosaic program small.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mp2_tpu.hash.constants import ROUNDS_F, ROUNDS_P, WIDTH, load_table
from mp2_tpu.ops import gl_u32 as K

_EXT_RC, _INT_RC, _INT_DIAG = load_table()

import os

# lanes per block; batch elements per grid step = 8 * TILE_L.
# Default 128: chip sweep r5 — planar perms/s at 2^20: 18.1M (512 r4
# default) / 20.9M (256) / 25.4M (128); 1024+ regress (VMEM pressure
# starves the 30-round pipeline), 2048 collapses to 4.9M.
TILE_L = int(os.environ.get("MP2_P2_TILE_L", "128"))
# unroll the round loops instead of lax.fori_loop (bigger Mosaic program,
# lets the scheduler software-pipeline across rounds)
_UNROLL = os.environ.get("MP2_P2_UNROLL", "0") != "0"


def _split_table(vals):
    arr = np.asarray(vals, dtype=np.object_)
    flat = np.array([int(v) for v in arr.reshape(-1)], dtype=np.uint64)
    lo = (flat & 0xFFFFFFFF).astype(np.uint32).reshape(arr.shape)
    hi = (flat >> 32).astype(np.uint32).reshape(arr.shape)
    return lo, hi


_EXT_LO, _EXT_HI = _split_table(_EXT_RC)  # (8, 12)
_INT_LO, _INT_HI = _split_table(_INT_RC)  # (22,)
_DIAG1_LO, _DIAG1_HI = _split_table([(d - 1) % K.P for d in _INT_DIAG])  # (12,)


def _dbl(lo, hi):
    return K.add_lazy(lo, hi, lo, hi)


def _external(lo, hi):
    """External linear layer M_E = circ(2*M4, M4, M4) on (12, *bt) limb
    planes (bt = any trailing batch dims); the whole layer runs in the
    LAZY dialect — only the kernel output is canonicalized."""
    bt = lo.shape[1:]
    rl = lo.reshape((3, 4) + bt)
    rh = hi.reshape((3, 4) + bt)
    rows = [(rl[:, i], rh[:, i]) for i in range(4)]  # 4 x (3, *bt)
    c0, c1, c2, c3 = rows
    t0 = K.add_lazy(*c0, *c1)
    t1 = K.add_lazy(*c2, *c3)
    t2 = K.add_lazy(*_dbl(*c1), *t1)
    t3 = K.add_lazy(*_dbl(*c3), *t0)
    t4 = K.add_lazy(*_dbl(*_dbl(*t1)), *t3)
    t5 = K.add_lazy(*_dbl(*_dbl(*t0)), *t2)
    t6 = K.add_lazy(*t3, *t5)
    t7 = K.add_lazy(*t2, *t4)
    m = [t6, t5, t7, t4]  # output positions, each (3, *bt)
    tot = []
    for i in range(4):
        a = K.add_lazy(m[i][0][0], m[i][1][0], m[i][0][1], m[i][1][1])
        tot.append(K.add_lazy(*a, m[i][0][2], m[i][1][2]))
    out_l = []
    out_h = []
    for c in range(3):
        for i in range(4):
            s = K.add_lazy(m[i][0][c], m[i][1][c], *tot[i])
            out_l.append(s[0])
            out_h.append(s[1])
    return jnp.stack(out_l), jnp.stack(out_h)


_PROBE_NOMUL = os.environ.get("MP2_P2_PROBE_NOMUL", "0") != "0"


def _internal(lo, hi, dlo, dhi):
    slo, shi = lo[0], hi[0]
    for i in range(1, WIDTH):
        slo, shi = K.add_lazy(slo, shi, lo[i], hi[i])
    if _PROBE_NOMUL:  # perf probe ONLY: wrong math, measures the mul share
        ml, mh = K.add_lazy(lo, hi, dlo, dhi)
    else:
        ml, mh = K.mul_lazy(lo, hi, dlo, dhi)  # (12, *bt) x (12, 1, L) bcast
    return K.add_lazy(
        ml, mh,
        jnp.broadcast_to(slo, ml.shape), jnp.broadcast_to(shi, mh.shape),
    )


def _kernel(st_ref, ext_ref, int_ref, diag_ref, out_ref):
    """State block (24, 8, TILE_L): rows 0:12 lo planes, 12:24 hi planes.
    Round-constant tables are 2-D over lanes and broadcast up:
      ext_ref  (ROUNDS_F, 32, TILE_L): [r, i, :] = rc lo; [r, 16+i, :] = hi
      int_ref  (ROUNDS_P, 8, TILE_L):  [r, 0, :] = lo; [r, 1, :] = hi
      diag_ref (32, TILE_L): rows 0:12 = (mu_i - 1) lo; 16:28 = hi
    """
    lo = st_ref[:WIDTH]
    hi = st_ref[WIDTH:]
    half = ROUNDS_F // 2
    dlo = diag_ref[0:WIDTH, :][:, None, :]  # (12, 1, L)
    dhi = diag_ref[16 : 16 + WIDTH, :][:, None, :]

    lo, hi = _external(lo, hi)

    def full_round(r, carry):
        lo, hi = carry
        rc = ext_ref[r]  # (32, L)
        sl, sh = K.add_lazy(
            lo, hi,
            rc[0:WIDTH][:, None, :], rc[16 : 16 + WIDTH][:, None, :],
        )
        sl, sh = K.exp7_lazy(sl, sh)
        return _external(sl, sh)

    def partial_round(r, carry):
        lo, hi = carry
        rc = int_ref[r]  # (8, L)
        s0l, s0h = K.add_lazy(
            lo[0:1], hi[0:1], rc[0:1][:, None, :], rc[1:2][:, None, :]
        )
        e0l, e0h = K.exp7_lazy(s0l, s0h)
        lo = jnp.concatenate([e0l, lo[1:]], axis=0)
        hi = jnp.concatenate([e0h, hi[1:]], axis=0)
        return _internal(lo, hi, dlo, dhi)

    if _UNROLL:
        carry = (lo, hi)
        for r in range(half):
            carry = full_round(r, carry)
        for r in range(ROUNDS_P):
            carry = partial_round(r, carry)
        for r in range(half, ROUNDS_F):
            carry = full_round(r, carry)
        lo, hi = carry
    else:
        lo, hi = jax.lax.fori_loop(0, half, full_round, (lo, hi))
        lo, hi = jax.lax.fori_loop(0, ROUNDS_P, partial_round, (lo, hi))
        lo, hi = jax.lax.fori_loop(half, ROUNDS_F, full_round, (lo, hi))
    lo, hi = K.canon_lazy(lo, hi)
    out_ref[:WIDTH] = lo
    out_ref[WIDTH:] = hi


@lru_cache(maxsize=None)
def _tables():
    ext = np.zeros((ROUNDS_F, 32, TILE_L), dtype=np.uint32)
    for r in range(ROUNDS_F):
        ext[r, 0:WIDTH] = _EXT_LO[r][:, None]
        ext[r, 16 : 16 + WIDTH] = _EXT_HI[r][:, None]
    intt = np.zeros((ROUNDS_P, 8, TILE_L), dtype=np.uint32)
    intt[:, 0] = _INT_LO[:, None]
    intt[:, 1] = _INT_HI[:, None]
    diag = np.zeros((32, TILE_L), dtype=np.uint32)
    diag[0:WIDTH] = _DIAG1_LO[:, None]
    diag[16 : 16 + WIDTH] = _DIAG1_HI[:, None]
    return ext, intt, diag


@lru_cache(maxsize=None)
def _compiled(n_tiles: int, interpret: bool = False):
    return pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (2 * WIDTH, 8, TILE_L), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ROUNDS_F, 32, TILE_L), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ROUNDS_P, 8, TILE_L), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (32, TILE_L), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (2 * WIDTH, 8, TILE_L), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (2 * WIDTH, n_tiles * 8, TILE_L), jnp.uint32
        ),
        interpret=interpret,
    )


def _permute_impl(states_v: jax.Array, interpret: bool) -> jax.Array:
    """(B, 12) u64 -> (B, 12) u64 (pads B up to 8*TILE_L blocks)."""
    B = states_v.shape[0]
    per_block = 8 * TILE_L
    n_tiles = -(-B // per_block)
    padded = n_tiles * per_block
    x = jnp.pad(states_v, ((0, padded - B), (0, 0)))
    xt = x.T  # (12, padded)
    lo = (xt & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (xt >> np.uint64(32)).astype(jnp.uint32)
    st = jnp.concatenate([lo, hi], axis=0)  # (24, padded)
    # (24, padded) -> (24, n_tiles*8, TILE_L): batch index b = t*8*L + s*L + l
    st = st.reshape(2 * WIDTH, n_tiles * 8, TILE_L)
    extrc, intrc, diag = _tables()
    # The kernel is pure u32; trace it with x64 disabled (the framework
    # enables x64 globally for the u64 field representation, and Mosaic
    # cannot legalize stray i64 index/literal types).
    with jax.enable_x64(False):
        out = _compiled(n_tiles, interpret)(
            st, jnp.asarray(extrc), jnp.asarray(intrc), jnp.asarray(diag)
        )
    out = out.reshape(2 * WIDTH, padded)
    out64 = out[:WIDTH].astype(jnp.uint64) | (
        out[WIDTH:].astype(jnp.uint64) << np.uint64(32)
    )
    return out64.T[:B]


@jax.jit
def permute_batch_u64(states_v: jax.Array) -> jax.Array:
    """(B, 12) u64 -> (B, 12) u64 via the Pallas kernel."""
    return _permute_impl(states_v, interpret=False)


def permute_batch_u64_interpret(states_v):
    """Interpreter-mode variant (CPU correctness tests)."""
    return _permute_impl(states_v, interpret=True)


def _permute_lanes_impl(lanes_v, interpret: bool):
    """12 separate (B,) u64 lane arrays -> 12 (B,) u64 lane arrays.

    Planar fast path: the (B, 12) API pays two (B,12)<->(12,B)
    transposes per call (state-interleaved <-> plane-major); measured
    ~half the wall time at 2^20 on v5e.  Per-lane inputs are ALREADY
    plane-major, so packing here is limb-split + stack + free reshape —
    no transpose at all.  This is the prover's layout (merkle leaf /
    sponge lanes), so the hot path uses this entry.
    """
    B = lanes_v[0].shape[0]
    per_block = 8 * TILE_L
    n_tiles = -(-B // per_block)
    padded = n_tiles * per_block
    pad = padded - B
    planes = []
    for v in lanes_v:  # lo planes first, then hi, matching the kernel
        planes.append((v & np.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    for v in lanes_v:
        planes.append((v >> np.uint64(32)).astype(jnp.uint32))
    st = jnp.stack(planes)  # (24, B)
    if pad:
        st = jnp.pad(st, ((0, 0), (0, pad)))
    st = st.reshape(2 * WIDTH, n_tiles * 8, TILE_L)
    extrc, intrc, diag = _tables()
    with jax.enable_x64(False):
        out = _compiled(n_tiles, interpret)(
            st, jnp.asarray(extrc), jnp.asarray(intrc), jnp.asarray(diag)
        )
    out = out.reshape(2 * WIDTH, padded)[:, :B]
    return [
        out[i].astype(jnp.uint64)
        | (out[WIDTH + i].astype(jnp.uint64) << np.uint64(32))
        for i in range(WIDTH)
    ]


@jax.jit
def permute_lanes_u64(lanes_v):
    """Tuple/list of 12 (B,) u64 arrays -> list of 12 (B,) u64 arrays."""
    return _permute_lanes_impl(list(lanes_v), interpret=False)


def permute_lanes_u64_interpret(lanes_v):
    """Interpreter-mode variant (CPU correctness tests)."""
    return _permute_lanes_impl(list(lanes_v), interpret=True)
