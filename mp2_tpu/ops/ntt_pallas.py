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

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mp2_tpu.ops import gl_u32 as K

P = K.P
# tile height (rows per grid step); larger tiles amortize twiddle loads and
# grid overhead at the cost of VMEM (tile bytes = 2*TILE_R*n*4).
# Device default 32: chip sweep r5 (probe_ntt_opts) measured 2^22 NTT device
# time 4.54 ms (TILE_R=8) / 4.34 (16) / 3.81 (32, packed) / 4.23 (64, packed).
# CPU/interpret default stays 8: the interpret path expands the tile body
# into one XLA-CPU program whose optimization time explodes superlinearly
# with tile height (a 2^10 fused call at TILE_R=32 hangs >10 min in
# compile; the same shape at 8 compiles in seconds).


def _default_tile_r() -> int:
    import jax as _jax

    try:
        plat = _jax.devices()[0].platform
    except Exception:  # backend init failure: act like CPU
        plat = "cpu"
    return 8 if plat == "cpu" else 32


_TILE_R_ENV = os.environ.get("MP2_NTT_TILE_R")
TILE_R = int(_TILE_R_ENV) if _TILE_R_ENV else _default_tile_r()


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


def _bitrev_fix(lo, hi, log_n):
    """In-VMEM lane bit-reversal permutation via bit-pair swap rolls:
    swapping index bits (a, b) moves elements by +-d = 2^b - 2^a, realized
    as two circular rolls + selects (no gather needed)."""
    n = lo.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, lo.ndim - 1)
    for a in range(log_n // 2):
        b_ = log_n - 1 - a
        d = (1 << b_) - (1 << a)
        bit_a = (lane >> a) & jnp.uint32(1)
        bit_b = (lane >> b_) & jnp.uint32(1)
        mask_recv_hi = (bit_b == 1) & (bit_a == 0)  # receives from p - d
        mask_recv_lo = (bit_b == 0) & (bit_a == 1)  # receives from p + d
        out = []
        for limb in (lo, hi):
            fwd = pltpu.roll(limb, d, limb.ndim - 1)       # out[i] = x[i-d]
            bwd = pltpu.roll(limb, n - d, limb.ndim - 1)   # out[i] = x[i+d]
            out.append(
                jnp.where(mask_recv_hi, fwd, jnp.where(mask_recv_lo, bwd, limb))
            )
        lo, hi = out
    return lo, hi


@lru_cache(maxsize=None)
def _stage_modes(log_n: int, inverse: bool):
    """Per-stage twiddle classification for the lazy kernel.

    Goldilocks: 2 has order 192 (2^96 == -1), so every root of order
    dividing 192 is a power of two — stages with span h <= 32 (order
    m <= 64) have ALL twiddles in {2^t}.  Returns (exps, modes) where
    exps is a (log_n, n) uint32 exponent table (rows meaningful only for
    'pow2' stages) and modes[s] in {'skip', 'pow2', 'mul'} ('skip' =
    stage 0, all twiddles are 1)."""
    from mp2_tpu.prover import ntt as ntt_mod

    n = 1 << log_n
    pow2 = {pow(2, t, P): t for t in range(192)}
    exps = np.zeros((log_n, n), dtype=np.uint32)
    modes = []
    for s in range(log_n):
        m = 1 << (s + 1)
        h = 1 << s
        w = ntt_mod._root_of_unity(s + 1)
        if inverse:
            w = pow(w, P - 2, P)
        pw = [pow(w, j, P) for j in range(h)]
        if all(v == 1 for v in pw):
            modes.append("skip")
        elif os.environ.get("MP2_NTT_NO_POW2"):
            modes.append("mul")  # probe knob: generic mul everywhere
        elif all(v in pow2 for v in pw):
            te = [pow2[v] for v in pw]
            for p_ in range(n):
                if (p_ % m) >= h:
                    exps[s, p_] = te[p_ % h]
            modes.append("pow2")
        else:
            modes.append("mul")
    return exps, tuple(modes)


@lru_cache(maxsize=None)
def _tables_merged(log_n: int, inverse: bool):
    """Merged twiddle rows for the PACKED stage formulation: row s holds
    w^(p mod h) at EVERY lane (not 1 on the even group), because after
    packing the odd-half elements of two independent rows into one full
    vector, every lane multiplies by the stage twiddle of its (p mod h)
    offset.  Row log_n = final scaling (as in _tables).  Also returns the
    merged pow2 exponent table for the shift-mul stages."""
    from mp2_tpu.prover import ntt as ntt_mod

    n = 1 << log_n
    pow2 = {pow(2, t, P): t for t in range(192)}
    rows = np.ones((log_n + 1, n), dtype=np.uint64)
    exps = np.zeros((log_n, n), dtype=np.uint32)
    for s in range(log_n):
        h = 1 << s
        w = ntt_mod._root_of_unity(s + 1)
        if inverse:
            w = pow(w, P - 2, P)
        pw = [pow(w, j, P) for j in range(h)]
        for p in range(n):
            v = pw[p % h]
            rows[s, p] = v
            if v in pow2:
                exps[s, p] = pow2[v]
    if inverse:
        rows[log_n, :] = pow(n, P - 2, P)
    lo = (rows & 0xFFFFFFFF).astype(np.uint32)
    hi = (rows >> 32).astype(np.uint32)
    return lo, hi, exps


def _dit_body_lazy_pk(loA, hiA, loB, hiB, twlo_ref, twhi_ref, exp_ref,
                      log_n: int, modes, apply_scale: bool):
    """PACKED lazy tile body: processes TWO independent row groups (A, B)
    per stage with ONE twiddle multiply.

    In the per-row formulation every lane is multiplied by the stage
    twiddle even though it is 1 on the even half — half the mul work is
    wasted.  Here the odd-half elements of A (rolled onto the even-group
    lanes) and the odd-half elements of B (in place) are packed into one
    full vector, multiplied once by the merged table w^(p mod h)
    (_tables_merged), then unpacked into both butterflies:

      m        = where(bit_s==0, roll(A, -h), B)   # pack
      y        = m * w^(p mod h)                   # ONE mul for 2 rows
      outA     = where(bit_s==0, A + y,        roll(A, h) - roll(y, h))
      outB     = where(bit_s==0, B + roll(y,-h), roll(B, h) - y)

    (for A the products already sit on the even-group lanes; for B on the
    odd-group lanes).  Generic-mul cost per element per stage drops from
    1 to 1/2; bit-exact with _dit_body_lazy (same lazy dialect)."""
    n = 1 << log_n
    rows = loA.shape[0]
    loA, hiA = _bitrev_fix(loA, hiA, log_n)
    loB, hiB = _bitrev_fix(loB, hiB, log_n)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (rows, n), 1)
    for s in range(log_n):
        h = 1 << s
        is_low = ((lane >> s) & jnp.uint32(1)) == jnp.uint32(0)
        ml = jnp.where(is_low, pltpu.roll(loA, n - h, 1), loB)
        mh = jnp.where(is_low, pltpu.roll(hiA, n - h, 1), hiB)
        if modes[s] == "skip":
            yl, yh = ml, mh
        elif modes[s] == "pow2":
            e = exp_ref[s, :][None, :]
            yl, yh = K.mul_pow2_lazy(ml, mh, jnp.broadcast_to(e, ml.shape))
        else:
            twl = twlo_ref[s, :][None, :]
            twh = twhi_ref[s, :][None, :]
            yl, yh = K.mul_lazy(ml, mh, jnp.broadcast_to(twl, ml.shape),
                                jnp.broadcast_to(twh, mh.shape))
        # A: t values sit on the even-group lanes of y
        aAl, aAh = K.add_lazy(loA, hiA, yl, yh)
        bAl, bAh = K.sub_lazy(pltpu.roll(loA, h, 1), pltpu.roll(hiA, h, 1),
                              pltpu.roll(yl, h, 1), pltpu.roll(yh, h, 1))
        # B: t values sit on the odd-group lanes of y
        aBl, aBh = K.add_lazy(loB, hiB, pltpu.roll(yl, n - h, 1),
                              pltpu.roll(yh, n - h, 1))
        bBl, bBh = K.sub_lazy(pltpu.roll(loB, h, 1), pltpu.roll(hiB, h, 1),
                              yl, yh)
        loA = jnp.where(is_low, aAl, bAl)
        hiA = jnp.where(is_low, aAh, bAh)
        loB = jnp.where(is_low, aBl, bBl)
        hiB = jnp.where(is_low, aBh, bBh)
    if apply_scale:
        twl = twlo_ref[log_n, :][None, :]
        twh = twhi_ref[log_n, :][None, :]
        loA, hiA = K.mul_lazy(loA, hiA, jnp.broadcast_to(twl, loA.shape),
                              jnp.broadcast_to(twh, hiA.shape))
        loB, hiB = K.mul_lazy(loB, hiB, jnp.broadcast_to(twl, loB.shape),
                              jnp.broadcast_to(twh, hiB.shape))
    return loA, hiA, loB, hiB


def _make_fused_kernel_lazy_pk(log_n: int, with_twiddle: bool, modes,
                               apply_scale: bool, canon_out: bool):
    """Packed-pair lazy fused tile kernel (TILE_R rows split into two
    groups of TILE_R//2; see _dit_body_lazy_pk)."""
    R2 = TILE_R // 2

    def kernel(*refs):
        if with_twiddle:
            x_ref, twlo_ref, twhi_ref, exp_ref, blo_ref, bhi_ref, out_ref = refs
        else:
            x_ref, twlo_ref, twhi_ref, exp_ref, out_ref = refs
        loA = x_ref[:R2, :]
        loB = x_ref[R2:TILE_R, :]
        hiA = x_ref[TILE_R : TILE_R + R2, :]
        hiB = x_ref[TILE_R + R2 :, :]
        loA, hiA, loB, hiB = _dit_body_lazy_pk(
            loA, hiA, loB, hiB, twlo_ref, twhi_ref, exp_ref, log_n, modes,
            apply_scale,
        )
        lo = jnp.concatenate([loA, loB], axis=0)
        hi = jnp.concatenate([hiA, hiB], axis=0)
        if with_twiddle:
            lo, hi = K.mul_lazy(lo, hi, blo_ref[:TILE_R, :],
                                bhi_ref[:TILE_R, :])
        if canon_out:
            lo, hi = K.canon_lazy(lo, hi)
        out_ref[:TILE_R, :] = lo
        out_ref[TILE_R:, :] = hi

    return kernel


@lru_cache(maxsize=None)
def _compiled_fused_lazy_pk(log_n: int, n_tiles: int, with_twiddle: bool,
                            tiles_per_batch: int, inverse: bool,
                            apply_scale: bool, canon_out: bool,
                            interpret: bool = False):
    n = 1 << log_n
    _, modes = _stage_modes(log_n, inverse)
    specs = [
        pl.BlockSpec((2 * TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if with_twiddle:
        specs += [
            pl.BlockSpec(
                (TILE_R, n),
                lambda i: (i % tiles_per_batch, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_R, n),
                lambda i: (i % tiles_per_batch, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    return pl.pallas_call(
        _make_fused_kernel_lazy_pk(log_n, with_twiddle, modes, apply_scale,
                                   canon_out),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (2 * TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 2 * TILE_R, n), jnp.uint32),
        interpret=interpret,
    )


def _dit_body_lazy(lo, hi, twlo_ref, twhi_ref, exp_ref, log_n: int,
                   modes, apply_scale: bool):
    """Lazy-dialect tile body: in-VMEM bitrev + all DIT stages with
    non-canonical intermediates (values congruent mod p in [0, 2^64)).
    Stage 0 skips its all-ones twiddle mul; power-of-two stages use
    shift-based muls; the caller canonicalizes once at the end."""
    n = 1 << log_n
    rows = lo.shape[0]
    lo, hi = _bitrev_fix(lo, hi, log_n)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (rows, n), 1)
    for s in range(log_n):
        h = 1 << s
        if modes[s] == "skip":
            yl, yh = lo, hi
        elif modes[s] == "pow2":
            e = exp_ref[s, :][None, :]
            yl, yh = K.mul_pow2_lazy(
                lo, hi, jnp.broadcast_to(e, lo.shape)
            )
        else:
            twl = twlo_ref[s, :][None, :]
            twh = twhi_ref[s, :][None, :]
            yl, yh = K.mul_lazy(lo, hi, jnp.broadcast_to(twl, lo.shape),
                                jnp.broadcast_to(twh, hi.shape))
        yl_l = pltpu.roll(yl, n - h, 1)
        yh_l = pltpu.roll(yh, n - h, 1)
        xl_r = pltpu.roll(lo, h, 1)
        xh_r = pltpu.roll(hi, h, 1)
        al, ah = K.add_lazy(lo, hi, yl_l, yh_l)
        bl, bh = K.sub_lazy(xl_r, xh_r, yl, yh)
        is_low = ((lane >> s) & jnp.uint32(1)) == jnp.uint32(0)
        lo = jnp.where(is_low, al, bl)
        hi = jnp.where(is_low, ah, bh)
    if apply_scale:
        twl = twlo_ref[log_n, :][None, :]
        twh = twhi_ref[log_n, :][None, :]
        lo, hi = K.mul_lazy(lo, hi, jnp.broadcast_to(twl, lo.shape),
                            jnp.broadcast_to(twh, hi.shape))
    return lo, hi


def _make_fused_kernel_lazy(log_n: int, with_twiddle: bool, modes,
                            apply_scale: bool, canon_out: bool):
    """Lazy fused tile kernel: bitrev + stages (+ optional per-element
    twiddle block + scale row), canonicalizing only when canon_out (the
    last pass of the pipeline)."""

    def kernel(*refs):
        if with_twiddle:
            x_ref, twlo_ref, twhi_ref, exp_ref, blo_ref, bhi_ref, out_ref = refs
        else:
            x_ref, twlo_ref, twhi_ref, exp_ref, out_ref = refs
        lo = x_ref[:TILE_R, :]
        hi = x_ref[TILE_R:, :]
        lo, hi = _dit_body_lazy(
            lo, hi, twlo_ref, twhi_ref, exp_ref, log_n, modes, apply_scale
        )
        if with_twiddle:
            lo, hi = K.mul_lazy(lo, hi, blo_ref[:TILE_R, :],
                                bhi_ref[:TILE_R, :])
        if canon_out:
            lo, hi = K.canon_lazy(lo, hi)
        out_ref[:TILE_R, :] = lo
        out_ref[TILE_R:, :] = hi

    return kernel


@lru_cache(maxsize=None)
def _compiled_fused_lazy(log_n: int, n_tiles: int, with_twiddle: bool,
                         tiles_per_batch: int, inverse: bool,
                         apply_scale: bool, canon_out: bool,
                         interpret: bool = False):
    n = 1 << log_n
    _, modes = _stage_modes(log_n, inverse)
    specs = [
        pl.BlockSpec((2 * TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if with_twiddle:
        specs += [
            pl.BlockSpec(
                (TILE_R, n),
                lambda i: (i % tiles_per_batch, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_R, n),
                lambda i: (i % tiles_per_batch, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    return pl.pallas_call(
        _make_fused_kernel_lazy(log_n, with_twiddle, modes, apply_scale,
                                canon_out),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (2 * TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 2 * TILE_R, n), jnp.uint32),
        interpret=interpret,
    )


def _dit_body(lo, hi, twlo_ref, twhi_ref, log_n: int):
    """Shared tile body: in-VMEM bitrev + all DIT stages + scale row."""
    n = 1 << log_n
    rows = lo.shape[0]
    lo, hi = _bitrev_fix(lo, hi, log_n)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (rows, n), 1)
    for s in range(log_n):
        h = 1 << s
        twl = twlo_ref[s, :][None, :]
        twh = twhi_ref[s, :][None, :]
        yl, yh = K.mul(lo, hi, jnp.broadcast_to(twl, lo.shape),
                       jnp.broadcast_to(twh, hi.shape))
        yl_l = pltpu.roll(yl, n - h, 1)
        yh_l = pltpu.roll(yh, n - h, 1)
        xl_r = pltpu.roll(lo, h, 1)
        xh_r = pltpu.roll(hi, h, 1)
        al, ah = K.add(lo, hi, yl_l, yh_l)
        nbl, nbh = _neg(yl, yh)
        bl, bh = K.add(xl_r, xh_r, nbl, nbh)
        is_low = ((lane >> s) & jnp.uint32(1)) == jnp.uint32(0)
        lo = jnp.where(is_low, al, bl)
        hi = jnp.where(is_low, ah, bh)
    twl = twlo_ref[log_n, :][None, :]
    twh = twhi_ref[log_n, :][None, :]
    return K.mul(lo, hi, jnp.broadcast_to(twl, lo.shape),
                 jnp.broadcast_to(twh, hi.shape))


def _make_fused_kernel(log_n: int, with_twiddle: bool):
    """Natural-order-input NTT tile kernel: in-VMEM bitrev + all DIT stages
    (+ optional per-element twiddle block + scale row)."""

    def kernel(*refs):
        if with_twiddle:
            x_ref, twlo_ref, twhi_ref, blo_ref, bhi_ref, out_ref = refs
        else:
            x_ref, twlo_ref, twhi_ref, out_ref = refs
        lo = x_ref[:TILE_R, :]
        hi = x_ref[TILE_R:, :]
        lo, hi = _dit_body(lo, hi, twlo_ref, twhi_ref, log_n)
        if with_twiddle:
            lo, hi = K.mul(lo, hi, blo_ref[:TILE_R, :], bhi_ref[:TILE_R, :])
        out_ref[:TILE_R, :] = lo
        out_ref[TILE_R:, :] = hi

    return kernel


def _make_fused_kernel_t(log_n: int, with_twiddle: bool, transpose_out: bool):
    """Transpose-fused tile kernel: the (n, TILE_R) input block is a
    COLUMN slab of the operand matrix, transposed in VMEM instead of via
    an HBM round-trip between the four-step passes; with `transpose_out`
    the result is stored back as a column slab too (pass 2), so NO
    host/XLA transposes remain in the whole pipeline.

    STATUS (measured 2026-08-18 on TPU v5e): interpret-mode bit-exact,
    but REJECTED by the real Mosaic lowering — block last-two dims must
    be divisible by (8, 128) and the column slab is (n, TILE_R=8).
    Making it legal needs TILE_R=128 column slabs (~8 MB VMEM per grid
    step), and the XLA transposes it would save measure <1 ms of the
    ~10-20 ms pipeline, so the default pipeline stays `fused`; this is
    kept as the documented experiment behind MP2_NTT_FUSED_T=1."""

    def kernel(*refs):
        if with_twiddle:
            (lo_ref, hi_ref, twlo_ref, twhi_ref, blo_ref, bhi_ref,
             olo_ref, ohi_ref) = refs
        else:
            lo_ref, hi_ref, twlo_ref, twhi_ref, olo_ref, ohi_ref = refs
        lo = jnp.transpose(lo_ref[...])  # (TILE_R, n)
        hi = jnp.transpose(hi_ref[...])
        lo, hi = _dit_body(lo, hi, twlo_ref, twhi_ref, log_n)
        if with_twiddle:
            lo, hi = K.mul(lo, hi, blo_ref[...], bhi_ref[...])
        if transpose_out:
            olo_ref[...] = jnp.transpose(lo)
            ohi_ref[...] = jnp.transpose(hi)
        else:
            olo_ref[...] = lo
            ohi_ref[...] = hi

    return kernel


@lru_cache(maxsize=None)
def _compiled_fused(log_n: int, n_tiles: int, with_twiddle: bool,
                    tiles_per_batch: int, interpret: bool = False):
    n = 1 << log_n
    specs = [
        pl.BlockSpec((2 * TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if with_twiddle:
        # one (n2, n1) table shared by every batch element: block row
        # selected modulo the per-batch tile count
        specs += [
            pl.BlockSpec(
                (TILE_R, n),
                lambda i: (i % tiles_per_batch, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_R, n),
                lambda i: (i % tiles_per_batch, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    return pl.pallas_call(
        _make_fused_kernel(log_n, with_twiddle),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (2 * TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 2 * TILE_R, n), jnp.uint32),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _tables_unit_scale(log_n: int, inverse: bool):
    """Stage twiddles with a UNIT final-scale row (the 1/n scaling of a
    full inverse transform is applied once, in the second pass)."""
    lo, hi = _tables(log_n, inverse)
    lo = lo.copy(); hi = hi.copy()
    lo[log_n, :] = 1
    hi[log_n, :] = 0
    return lo, hi


@lru_cache(maxsize=None)
def _tables_full_scale(log_n: int, inverse: bool, full_log: int):
    """Stage twiddles whose final row scales by (2^full_log)^-1."""
    lo, hi = _tables(log_n, inverse)
    if inverse:
        lo = lo.copy(); hi = hi.copy()
        inv_n = pow(1 << full_log, P - 2, P)
        lo[log_n, :] = inv_n & 0xFFFFFFFF
        hi[log_n, :] = inv_n >> 32
    return lo, hi


@lru_cache(maxsize=None)
def _mid_twiddles_u32(log_n: int, inverse: bool):
    """w^(k1*j2) as (n2, n1) u32 pairs for the fused first pass."""
    from mp2_tpu.prover import ntt as ntt_mod

    tw = ntt_mod._four_step_twiddles(log_n, inverse)  # (n1, n2) u64
    twt = np.ascontiguousarray(tw.T)  # (n2, n1)
    return (twt & 0xFFFFFFFF).astype(np.uint32), (twt >> 32).astype(np.uint32)


def _run_fused(lo, hi, log_n, tables, tw_pair, tiles_per_batch=1,
               inverse=False, apply_scale=False, canon_out=True):
    """One fused pass over (R, n) u32 limb planes.

    Default path is the LAZY kernel (non-canonical intermediates, stage-0
    mul skipped, pow2 twiddle stages as shift-muls); MP2_NTT_LAZY=0
    reverts to the always-canonical round-2 kernel.  With the lazy
    kernel, inputs may be any u64 pair congruent to the value and the
    output is canonical only when canon_out."""
    R, n = lo.shape
    assert R % TILE_R == 0, "row count must align to the tile height"
    n_tiles = R // TILE_R
    lo_t = lo.reshape(n_tiles, TILE_R, n)
    hi_t = hi.reshape(n_tiles, TILE_R, n)
    st = jnp.concatenate([lo_t, hi_t], axis=1).reshape(n_tiles * 2 * TILE_R, n)
    twlo, twhi = tables
    interpret = jax.devices()[0].platform == "cpu"
    lazy = os.environ.get("MP2_NTT_LAZY", "1") != "0"
    # packed-pair stages default ON (r5 chip sweep: 3.81 ms device at
    # TILE_R=32 vs 4.54 baseline; NOTE it is slightly WORSE at TILE_R=8)
    packed = (
        lazy
        and TILE_R % 2 == 0
        and os.environ.get("MP2_NTT_PACKED", "1") == "1"
    )
    with jax.enable_x64(False):
        if packed:
            mlo, mhi, mexps = _tables_merged(log_n, inverse)
            # the caller's table variant only changes the scale row
            mlo = mlo.copy(); mhi = mhi.copy()
            mlo[log_n] = twlo[log_n]
            mhi[log_n] = twhi[log_n]
            args = [st, jnp.asarray(mlo), jnp.asarray(mhi),
                    jnp.asarray(mexps)]
            if tw_pair is not None:
                args += [jnp.asarray(tw_pair[0]), jnp.asarray(tw_pair[1])]
            out = _compiled_fused_lazy_pk(
                log_n, n_tiles, tw_pair is not None, tiles_per_batch,
                inverse, apply_scale, canon_out, interpret
            )(*args)
        elif lazy:
            exps, _ = _stage_modes(log_n, inverse)
            args = [st, jnp.asarray(twlo), jnp.asarray(twhi),
                    jnp.asarray(exps)]
            if tw_pair is not None:
                args += [jnp.asarray(tw_pair[0]), jnp.asarray(tw_pair[1])]
            out = _compiled_fused_lazy(
                log_n, n_tiles, tw_pair is not None, tiles_per_batch,
                inverse, apply_scale, canon_out, interpret
            )(*args)
        else:
            args = [st, jnp.asarray(twlo), jnp.asarray(twhi)]
            if tw_pair is not None:
                args += [jnp.asarray(tw_pair[0]), jnp.asarray(tw_pair[1])]
            out = _compiled_fused(
                log_n, n_tiles, tw_pair is not None, tiles_per_batch,
                interpret
            )(*args)
    out_t = out.reshape(n_tiles, 2 * TILE_R, n)
    return (
        out_t[:, :TILE_R].reshape(R, n),
        out_t[:, TILE_R:].reshape(R, n),
    )


@lru_cache(maxsize=None)
def _compiled_fused_t(log_n: int, m: int, n_tiles: int, with_twiddle: bool,
                      transpose_out: bool, interpret: bool = False):
    """Transpose-fused pass over a (B*?, ?) u32 plane pair.

    Input planes have shape (B*n, m) column-slab layout (n = transform
    length); blocks are (n, TILE_R) column slabs; tiles_per_batch =
    m // TILE_R.  Output is (TILE_R, n) row blocks (pass 1) or (n, TILE_R)
    column slabs again (pass 2, transpose_out)."""
    n = 1 << log_n
    tpb = m // TILE_R
    col_spec = pl.BlockSpec(
        (n, TILE_R), lambda i: (i // tpb, i % tpb), memory_space=pltpu.VMEM
    )
    specs = [
        col_spec, col_spec,
        pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((log_n + 1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if with_twiddle:
        specs += [
            pl.BlockSpec((TILE_R, n), lambda i: (i % tpb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, n), lambda i: (i % tpb, 0),
                         memory_space=pltpu.VMEM),
        ]
    if transpose_out:
        out_spec = col_spec
        out_rows = (n_tiles // tpb) * n
        out_shape = (out_rows, m)
    else:
        out_spec = pl.BlockSpec(
            (TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = (n_tiles * TILE_R, n)
    return pl.pallas_call(
        _make_fused_kernel_t(log_n, with_twiddle, transpose_out),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            jax.ShapeDtypeStruct(out_shape, jnp.uint32),
        ],
        interpret=interpret,
    )


def _run_fused_t(lo, hi, log_n, m, tables, tw_pair, transpose_out):
    """One transpose-fused pass: planes (B*n, m) column-slab layout."""
    n = 1 << log_n
    rows, cols = lo.shape
    assert cols == m and rows % n == 0 and m % TILE_R == 0
    n_tiles = (rows // n) * (m // TILE_R)
    twlo, twhi = tables
    args = [lo, hi, jnp.asarray(twlo), jnp.asarray(twhi)]
    if tw_pair is not None:
        args += [jnp.asarray(tw_pair[0]), jnp.asarray(tw_pair[1])]
    interpret = jax.devices()[0].platform == "cpu"
    with jax.enable_x64(False):
        out_lo, out_hi = _compiled_fused_t(
            log_n, m, n_tiles, tw_pair is not None, transpose_out, interpret
        )(*args)
    return out_lo, out_hi


def ntt_four_step_fused_t(xv: jax.Array, inverse: bool) -> jax.Array:
    """Fully-fused four-step NTT: the matrix transposes between (and
    around) the two butterfly passes happen INSIDE the pallas kernels as
    VMEM tile transposes — zero XLA transpose/concatenate round-trips
    through HBM.  Enable via MP2_NTT_FUSED_T=1 (prover/ntt.py)."""
    B, n = xv.shape
    log_n = n.bit_length() - 1
    log1 = log_n // 2
    log2 = log_n - log1
    n1, n2 = 1 << log1, 1 << log2

    # natural layout (B, n1, n2) = column slabs of length n1 per batch
    lo = (xv & np.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(B * n1, n2)
    hi = (xv >> np.uint64(32)).astype(jnp.uint32).reshape(B * n1, n2)
    # pass 1: column transforms (length n1) + mid twiddle -> (B*n2, n1)
    a_lo, a_hi = _run_fused_t(
        lo, hi, log1, n2, _tables_unit_scale(log1, inverse),
        _mid_twiddles_u32(log_n, inverse), transpose_out=False,
    )
    # pass 2: row transforms (length n2), stored back transposed so the
    # flat output order is y[k1 + n1*k2]
    c_lo, c_hi = _run_fused_t(
        a_lo, a_hi, log2, n1, _tables_full_scale(log2, inverse, log_n),
        None, transpose_out=True,
    )
    y_lo = c_lo.reshape(B, n)
    y_hi = c_hi.reshape(B, n)
    return y_lo.astype(jnp.uint64) | (y_hi.astype(jnp.uint64) << np.uint64(32))


def ntt_four_step_fused(xv: jax.Array, inverse: bool) -> jax.Array:
    """Fused four-step NTT on (B, n) u64 natural-order vectors: two pallas
    passes (in-VMEM bitrev + stages; twiddle fused into pass 1) linked by
    u32-plane transposes — no host gathers, no u64 emulation round-trips."""
    B, n = xv.shape
    log_n = n.bit_length() - 1
    log1 = log_n // 2
    log2 = log_n - log1
    n1, n2 = 1 << log1, 1 << log2

    lo = (xv & np.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(B, n1, n2)
    hi = (xv >> np.uint64(32)).astype(jnp.uint32).reshape(B, n1, n2)
    # pass 1: column transforms (length n1) + mid twiddle
    lo_t = jnp.swapaxes(lo, 1, 2).reshape(B * n2, n1)
    hi_t = jnp.swapaxes(hi, 1, 2).reshape(B * n2, n1)
    mtl, mth = _mid_twiddles_u32(log_n, inverse)
    a_lo, a_hi = _run_fused(
        lo_t, hi_t, log1, _tables_unit_scale(log1, inverse), (mtl, mth),
        tiles_per_batch=n2 // TILE_R,
        inverse=inverse, apply_scale=False, canon_out=False,
    )
    # pass 2: row transforms (length n2), full 1/n scale when inverse
    b_lo = jnp.swapaxes(a_lo.reshape(B, n2, n1), 1, 2).reshape(B * n1, n2)
    b_hi = jnp.swapaxes(a_hi.reshape(B, n2, n1), 1, 2).reshape(B * n1, n2)
    c_lo, c_hi = _run_fused(
        b_lo, b_hi, log2, _tables_full_scale(log2, inverse, log_n), None,
        inverse=inverse, apply_scale=inverse, canon_out=True,
    )
    # output order: y[k1 + n1 k2] = C[k1, k2] transposed
    y_lo = jnp.swapaxes(c_lo.reshape(B, n1, n2), 1, 2).reshape(B, n)
    y_hi = jnp.swapaxes(c_hi.reshape(B, n1, n2), 1, 2).reshape(B, n)
    return y_lo.astype(jnp.uint64) | (y_hi.astype(jnp.uint64) << np.uint64(32))


def ntt_full(xv: jax.Array, inverse: bool) -> jax.Array:
    """Complete single-pass NTT on (B, n) u64 NATURAL-order vectors for
    n that fits one VMEM tile row (512 <= n <= 2^14): in-VMEM bitrev +
    all stages in the lazy packed kernel, canonical natural-order output
    (scaled by n^-1 when inverse).  Replaces the host-gather bitrev +
    always-canonical kernel on the mid-size path (prover/ntt._ntt_small),
    which is the shape class the batched tree-node prover hits."""
    B, n = xv.shape
    log_n = n.bit_length() - 1
    pad_rows = (-B) % TILE_R
    x = jnp.pad(xv, ((0, pad_rows), (0, 0)))
    lo = (x & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (x >> np.uint64(32)).astype(jnp.uint32)
    out_lo, out_hi = _run_fused(
        lo, hi, log_n, _tables(log_n, inverse), None,
        inverse=inverse, apply_scale=inverse, canon_out=True,
    )
    res = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << np.uint64(32))
    return res[:B]


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
