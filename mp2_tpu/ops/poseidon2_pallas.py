"""Pallas TPU kernel: batched Poseidon2 permutation.

Layout: state transposed to (12, B) so the batch rides the 128-lane axis;
lo/hi u32 limb planes are stacked into one (24, TILE_B) block per grid step,
processed entirely in VMEM — all 30 rounds run with no HBM round-trips
(the XLA path materializes inter-round states; this kernel is the
speed-of-light version of the Merkle/leaf-hash hot loop).

Rounds are rolled with lax.fori_loop over round-constant tables passed as
kernel inputs, keeping the Mosaic program small.
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

TILE_B = 512


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
    """(12, T) external linear layer M_E = circ(2*M4, M4, M4); the whole
    layer runs in the LAZY dialect (non-canonical u64 pairs congruent
    mod p) — only the kernel output is canonicalized."""
    T = lo.shape[-1]
    rl = lo.reshape(3, 4, T)
    rh = hi.reshape(3, 4, T)
    rows = [(rl[:, i], rh[:, i]) for i in range(4)]  # 4 x (3, T)
    c0, c1, c2, c3 = rows
    t0 = K.add_lazy(*c0, *c1)
    t1 = K.add_lazy(*c2, *c3)
    t2 = K.add_lazy(*_dbl(*c1), *t1)
    t3 = K.add_lazy(*_dbl(*c3), *t0)
    t4 = K.add_lazy(*_dbl(*_dbl(*t1)), *t3)
    t5 = K.add_lazy(*_dbl(*_dbl(*t0)), *t2)
    t6 = K.add_lazy(*t3, *t5)
    t7 = K.add_lazy(*t2, *t4)
    m = [t6, t5, t7, t4]  # output positions, each (3, T)
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


def _internal(lo, hi, dlo, dhi):
    slo, shi = lo[0], hi[0]
    for i in range(1, WIDTH):
        slo, shi = K.add_lazy(slo, shi, lo[i], hi[i])
    ml, mh = K.mul_lazy(lo, hi, dlo, dhi)  # (12, T) x (12, 1) broadcast
    return K.add_lazy(
        ml, mh,
        jnp.broadcast_to(slo, ml.shape), jnp.broadcast_to(shi, mh.shape),
    )


def _kernel(st_ref, ext_ref, int_ref, diag_ref, out_ref):
    """Round constants are pre-broadcast with ROUNDS on the leading dim
    (dynamic leading-dim indexing is unrestricted in Mosaic):
      ext_ref  (ROUNDS_F, 32, TILE_B): [r, i, :] = rc lo; [r, 16+i, :] = hi
      int_ref  (ROUNDS_P, 8, TILE_B):  [r, 0, :] = lo; [r, 1, :] = hi
      diag_ref (32, TILE_B): rows 0:12 = (mu_i - 1) lo; 16:28 = hi
    """
    lo = st_ref[: WIDTH, :]
    hi = st_ref[WIDTH :, :]
    half = ROUNDS_F // 2
    dlo = diag_ref[0:WIDTH, :]  # (12, T)
    dhi = diag_ref[16 : 16 + WIDTH, :]

    lo, hi = _external(lo, hi)

    def full_round(r, carry):
        lo, hi = carry
        rc = ext_ref[r]  # (32, T)
        sl, sh = K.add_lazy(lo, hi, rc[0:WIDTH], rc[16 : 16 + WIDTH])
        sl, sh = K.exp7_lazy(sl, sh)
        return _external(sl, sh)

    def partial_round(r, carry):
        lo, hi = carry
        rc = int_ref[r]  # (8, T)
        s0l, s0h = K.add_lazy(lo[0:1, :], hi[0:1, :], rc[0:1], rc[1:2])
        e0l, e0h = K.exp7_lazy(s0l, s0h)
        lo = jnp.concatenate([e0l, lo[1:]], axis=0)
        hi = jnp.concatenate([e0h, hi[1:]], axis=0)
        return _internal(lo, hi, dlo, dhi)

    lo, hi = jax.lax.fori_loop(0, half, full_round, (lo, hi))
    lo, hi = jax.lax.fori_loop(0, ROUNDS_P, partial_round, (lo, hi))
    lo, hi = jax.lax.fori_loop(half, ROUNDS_F, full_round, (lo, hi))
    lo, hi = K.canon_lazy(lo, hi)
    out_ref[: WIDTH, :] = lo
    out_ref[WIDTH :, :] = hi


@lru_cache(maxsize=None)
def _tables():
    ext = np.zeros((ROUNDS_F, 32, TILE_B), dtype=np.uint32)
    for r in range(ROUNDS_F):
        ext[r, 0:WIDTH] = _EXT_LO[r][:, None]
        ext[r, 16 : 16 + WIDTH] = _EXT_HI[r][:, None]
    intt = np.zeros((ROUNDS_P, 8, TILE_B), dtype=np.uint32)
    intt[:, 0] = _INT_LO[:, None]
    intt[:, 1] = _INT_HI[:, None]
    diag = np.zeros((32, TILE_B), dtype=np.uint32)
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
                (2 * WIDTH, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ROUNDS_F, 32, TILE_B), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ROUNDS_P, 8, TILE_B), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((32, TILE_B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * WIDTH, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * WIDTH, n_tiles * TILE_B), jnp.uint32),
        interpret=interpret,
    )


@jax.jit
def permute_batch_u64(states_v: jax.Array) -> jax.Array:
    """(B, 12) u64 -> (B, 12) u64 via the Pallas kernel (pads B to TILE_B)."""
    B = states_v.shape[0]
    n_tiles = -(-B // TILE_B)
    padded = n_tiles * TILE_B
    x = jnp.pad(states_v, ((0, padded - B), (0, 0)))
    xt = x.T  # (12, padded)
    lo = (xt & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (xt >> np.uint64(32)).astype(jnp.uint32)
    st = jnp.concatenate([lo, hi], axis=0)  # (24, padded)
    extrc, intrc, diag = _tables()
    # The kernel is pure u32; trace it with x64 disabled (the framework
    # enables x64 globally for the u64 field representation, and Mosaic
    # cannot legalize stray i64 index/literal types).
    with jax.enable_x64(False):
        out = _compiled(n_tiles)(
            st, jnp.asarray(extrc), jnp.asarray(intrc), jnp.asarray(diag)
        )
    out64 = out[:WIDTH].astype(jnp.uint64) | (
        out[WIDTH:].astype(jnp.uint64) << np.uint64(32)
    )
    return out64.T[:B]


def permute_batch_u64_interpret(states_v):
    """Interpreter-mode variant (CPU correctness tests)."""
    B = states_v.shape[0]
    n_tiles = -(-B // TILE_B)
    padded = n_tiles * TILE_B
    x = jnp.pad(states_v, ((0, padded - B), (0, 0)))
    xt = x.T
    lo = (xt & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (xt >> np.uint64(32)).astype(jnp.uint32)
    st = jnp.concatenate([lo, hi], axis=0)
    extrc, intrc, diag = _tables()
    out = _compiled(n_tiles, interpret=True)(
        st, jnp.asarray(extrc), jnp.asarray(intrc), jnp.asarray(diag)
    )
    out64 = out[:WIDTH].astype(jnp.uint64) | (
        out[WIDTH:].astype(jnp.uint64) << np.uint64(32)
    )
    return out64.T[:B]
