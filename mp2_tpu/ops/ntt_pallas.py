"""Pallas TPU kernel: batched small NTT (all butterfly stages in VMEM).

The four-step NTT decomposes a 2^22 transform into batched 2^11 transforms
(prover/ntt.py); the XLA path materializes every butterfly stage to HBM.
This kernel runs ALL log2(n) stages on a (TILE_R, n) tile inside VMEM:

  stage s (bit-reversed DIT, span h = 2^s):
      y   = x * tw_s          (tw = 1 on even positions, w^(p mod h) on odd)
      out = where((p >> s) even,  x + roll(y, -h),  roll(x, +h) - y)

Rolls are intra-VMEM lane rotations; per-stage twiddle vectors and the
final scaling row (n^-1 for inverse) are table rows with static indices.
Stages are unrolled (log2(n) <= 12 keeps the Mosaic program small).
Field math is the u32-pair dialect (ops/gl_u32.py); the kernel is traced
under enable_x64(False) like the Poseidon2 kernel.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mp2_tpu.ops import gl_u32 as K

P = K.P
TILE_R = 8


@lru_cache(maxsize=None)
def _tables(log_n: int, inverse: bool):
    """(log_n + 1, n) twiddle rows (stage s; last row = final scaling)."""
    from mp2_tpu.prover import ntt as ntt_mod

    n = 1 << log_n
    rows = np.ones((log_n + 1, n), dtype=np.uint64)
    for s in range(log_n):
        m = 1 << (s + 1)
        h = 1 << s
        w = ntt_mod._root_of_unity(s + 1)
        if inverse:
            w = pow(w, P - 2, P)
        # odd positions (p mod m) >= h get w^(p mod h)
        pw = [pow(w, j, P) for j in range(h)]
        for p in range(n):
            if (p % m) >= h:
                rows[s, p] = pw[p % h]
    if inverse:
        rows[log_n, :] = pow(n, P - 2, P)
    lo = (rows & 0xFFFFFFFF).astype(np.uint32)
    hi = (rows >> 32).astype(np.uint32)
    return lo, hi


def _make_kernel(log_n: int):
    n = 1 << log_n

    def kernel(x_ref, twlo_ref, twhi_ref, out_ref):
        lo = x_ref[:TILE_R, :]
        hi = x_ref[TILE_R:, :]
        lane = jax.lax.broadcasted_iota(jnp.uint32, (TILE_R, n), 1)
        for s in range(log_n):
            h = 1 << s
            twl = twlo_ref[s, :][None, :]
            twh = twhi_ref[s, :][None, :]
            yl, yh = K.mul(lo, hi, jnp.broadcast_to(twl, lo.shape),
                           jnp.broadcast_to(twh, hi.shape))
            # e-side: x + y rolled left by h; o-side: x rolled right by h - y
            yl_l = pltpu.roll(yl, -h, 1)
            yh_l = pltpu.roll(yh, -h, 1)
            xl_r = pltpu.roll(lo, h, 1)
            xh_r = pltpu.roll(hi, h, 1)
            al, ah = K.add(lo, hi, yl_l, yh_l)
            # subtraction mod p: a - b = a + (p - b)
            nbl, nbh = _neg(yl, yh)
            bl, bh = K.add(xl_r, xh_r, nbl, nbh)
            is_low = ((lane >> s) & jnp.uint32(1)) == jnp.uint32(0)
            lo = jnp.where(is_low, al, bl)
            hi = jnp.where(is_low, ah, bh)
        # final scaling row (1s for forward, n^-1 for inverse)
        twl = twlo_ref[log_n, :][None, :]
        twh = twhi_ref[log_n, :][None, :]
        lo, hi = K.mul(lo, hi, jnp.broadcast_to(twl, lo.shape),
                       jnp.broadcast_to(twh, hi.shape))
        out_ref[:TILE_R, :] = lo
        out_ref[TILE_R:, :] = hi

    return kernel


def _neg(lo, hi):
    """p - x (for canonical x; maps 0 -> 0)."""
    nz = ((lo | hi) != 0).astype(jnp.uint32)
    dl, b0 = K.subb(K.P_LO * nz, lo)
    dh = K.P_HI * nz - hi - b0
    return dl, dh


@lru_cache(maxsize=None)
def _compiled(log_n: int, n_tiles: int, inverse: bool):
    n = 1 << log_n
    return pl.pallas_call(
        _make_kernel(log_n),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2 * TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 2 * TILE_R, n), jnp.uint32),
    )


def ntt_stages_bitrev_input(xv: jax.Array, inverse: bool) -> jax.Array:
    """All butterfly stages on (B, n) u64 values ALREADY in bit-reversed
    order; returns natural-order transform (scaled by n^-1 if inverse)."""
    B, n = xv.shape
    log_n = n.bit_length() - 1
    pad_rows = (-B) % TILE_R
    x = jnp.pad(xv, ((0, pad_rows), (0, 0)))
    rows = x.shape[0]
    n_tiles = rows // TILE_R
    lo = (x & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (x >> np.uint64(32)).astype(jnp.uint32)
    # interleave tiles: (n_tiles, 2*TILE_R, n) where each tile = [lo;hi]
    lo_t = lo.reshape(n_tiles, TILE_R, n)
    hi_t = hi.reshape(n_tiles, TILE_R, n)
    st = jnp.concatenate([lo_t, hi_t], axis=1).reshape(n_tiles * 2 * TILE_R, n)
    twlo, twhi = _tables(log_n, inverse)
    with jax.enable_x64(False):
        out = _compiled(log_n, n_tiles, inverse)(
            st, jnp.asarray(twlo), jnp.asarray(twhi)
        )
    out_t = out.reshape(n_tiles, 2 * TILE_R, n)
    out_lo = out_t[:, :TILE_R].reshape(rows, n)
    out_hi = out_t[:, TILE_R:].reshape(rows, n)
    res = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << np.uint64(32))
    return res[:B]
