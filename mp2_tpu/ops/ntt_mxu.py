"""Goldilocks NTT on the MXU: mixed-radix matmul NTT over int8 limb planes.

Why: the TPU's FLOPs live in the int8/bf16 systolic array, not the VPU, but
a radix-2 butterfly NTT is pure VPU work.  A radix-R stage of the
mixed-radix Cooley-Tukey NTT is a *contraction with the R-point DFT matrix*
— i.e. a matmul — so with R in {128, 256} the whole 2^22 transform becomes
three MXU matmul stages plus elementwise twiddles.  Field elements (< 2^64)
split into 8 little-endian bytes; the field matmul becomes exact
int8 x int8 -> int32 matmuls recombined mod p with byte-position weights.

Derivation (generalized four-step / mixed radix, N = R_1 * ... * R_L,
n = sum_i n_i*S_i with S_i = N/(R_1..R_i), k = sum_i k_i*T_i with
T_i = R_1..R_{i-1}):

    X[k] = sum over n_L .. n_1 of x * prod_i w^(S_i * n_i * kappa_i)

where kappa_i = sum_{j<=i} k_j T_j (terms with j > i vanish since
S_i*T_j = 0 mod N).  Stage i therefore: multiply by the twiddle
w^(S_i * kappa_{i-1} * n_i), then contract n_i against the R_i-point DFT
matrix F_i[k_i, n_i] = (w^(N/R_i))^(k_i n_i), and fold k_i into the row
index as kappa_i = k_i*T_i + kappa_{i-1}.

int8 mechanics (all exact):
- Signed-offset trick: MXU int8 is signed but bytes are [0,255].  With
  s = b - 128 both operands become signed planes; since
  sum_m 2^(8m) * 128 = 128*0x0101..01 = const, the offsets contribute only
  rank-1 corrections: a constant per output row (row sums of the DFT
  matrix) plus (column sums of the data) * const — O(N) work.
- Plane convolution as ONE dot: the 15 byte-position planes
  P_p = sum_{l+m=p} Fs_m . Xs_l come from a single dot with the
  block-structured constant lhs F'[(p,k),(l,n)] = fs_{p-l}[k,n],
  contracting over (l,n).  |P_p| <= 8*128*128*R < 2^26, int32-safe.
- Recombination in u64 lanes: the 15 planes (offset to non-negative,
  < 2^27) assemble into three < 2^59.1 chunks A + B*2^40 + C*2^80,
  reduced with two constant field muls — no 128-bit intermediates.

Role in the reference: plonky2's CPU `fft` (dep plonky2 0.2.2; every prover
call, SURVEY.md §2.9 "intra-proof parallelism").  Original TPU-first design.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF, P

_u64 = jnp.uint64
_M32 = np.uint64(0xFFFFFFFF)
_EPS = np.uint64(0xFFFFFFFF)  # 2^64 mod p
_P64 = np.uint64(P)

# byte-plane weights
W_BYTE = 0x0101010101010101  # sum_m 2^(8m)
C128W = (128 * W_BYTE) % P
OFF = 1 << 26  # makes P_p + OFF non-negative (|P_p| < 2^26)
OFFW2 = (OFF * sum(1 << (8 * p) for p in range(15))) % P
POW2_40 = pow(2, 40, P)
POW2_80 = pow(2, 80, P)


# ---------------------------------------------------------------------------
# numpy-exact Goldilocks helpers (table precompute; mirrors field.goldilocks)
# ---------------------------------------------------------------------------


def _np_modmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod p on uint64 arrays, exact (wrapping u64 partials)."""
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    a0, a1 = a & _M32, a >> np.uint64(32)
    b0, b1 = b & _M32, b >> np.uint64(32)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    midc = (mid < p01).astype(np.uint64)
    lo = p00 + (mid << np.uint64(32))
    c2 = (lo < p00).astype(np.uint64)
    hi = p11 + (mid >> np.uint64(32)) + (midc << np.uint64(32)) + c2
    # reduce 128-bit (lo, hi): 2^64 = 2^32 - 1, 2^96 = -1 (mod p)
    hi_lo = hi & _M32
    hi_hi = hi >> np.uint64(32)
    t = (hi_lo << np.uint64(32)) - hi_lo
    s = lo + t
    over = (s < lo).astype(np.uint64)
    s = s + over * _EPS
    s2 = s - hi_hi
    borrow = (s < hi_hi).astype(np.uint64)
    s2 = s2 - borrow * _EPS
    ge = (s2 >= _P64).astype(np.uint64)
    return s2 - ge * _P64


@lru_cache(maxsize=None)
def _wpow_full(log_n: int, inverse: bool) -> np.ndarray:
    """All n powers of the order-n root (doubling construction, O(n))."""
    from mp2_tpu.prover.ntt import _root_of_unity

    w = _root_of_unity(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    out = np.empty(1 << log_n, dtype=np.uint64)
    out[0] = 1
    size = 1
    wk = w  # w^size
    for _ in range(log_n):
        out[size : 2 * size] = _np_modmul(out[:size], np.uint64(wk))
        wk = wk * wk % P
        size *= 2
    return out


def radix_plan(log_n: int) -> tuple:
    """Split log_n into balanced factors of at most 8 (radix <= 256)."""
    if log_n == 0:
        return ()
    parts = -(-log_n // 8)
    base, rem = divmod(log_n, parts)
    return tuple([base + 1] * rem + [base] * (parts - rem))


@lru_cache(maxsize=None)
def _stage_consts(log_n: int, inverse: bool, plan: tuple = ()):
    """Per-stage (R, K, S, F_big int8 (15R,8R), CF u64 (R,), W u64 (K,R)|None)."""
    plan = plan or radix_plan(log_n)
    assert sum(plan) == log_n and all(1 <= b <= 8 for b in plan)
    n = 1 << log_n
    wpow = _wpow_full(log_n, inverse)
    stages = []
    K = 1
    S = n
    for i, bits in enumerate(plan):
        R = 1 << bits
        S //= R
        # DFT matrix of the stage: F[k, m] = (w^(n/R))^(k*m)
        k_idx = np.arange(R, dtype=np.int64)
        F = wpow[(np.outer(k_idx, k_idx) % R) * (n // R)]
        # signed byte planes fs_m = byte_m(F) - 128, block lhs for the
        # plane convolution: F_big[p, k, l, m] = fs_{p-l}[k, m]
        fs = [
            (((F >> np.uint64(8 * m)) & np.uint64(0xFF)).astype(np.int16) - 128)
            .astype(np.int8)
            for m in range(8)
        ]
        F_big = np.zeros((15, R, 8, R), dtype=np.int8)
        for p in range(15):
            for l in range(8):
                if 0 <= p - l < 8:
                    F_big[p, :, l, :] = fs[p - l]
        F_big = F_big.reshape(15 * R, 8 * R)
        # per-output-row constant: C128W*rowsum(F) - R*C128W^2  (mod p)
        row_f = F.astype(object).sum(axis=1) % P
        cf = np.array(
            [(C128W * int(r) - R * C128W * C128W) % P for r in row_f],
            dtype=np.uint64,
        )
        # twiddle w^(S_i * kappa * n_i) for kappa < K (skipped at stage 1;
        # S is already S_i = N/(R_1..R_i) after the division above)
        if i == 0:
            W = None
        else:
            kap = np.arange(K, dtype=np.int64)[:, None]
            ni = np.arange(R, dtype=np.int64)[None, :]
            W = wpow[(kap * ni * S) % n]
        stages.append((R, K, S, F_big, cf, W))
        K *= R
    return tuple(stages)


def _decompose(x):
    """u64 (B,K,R,S) -> signed byte planes (8R, B*K*S) int8, index (l, n)."""
    b, k, r, s = x.shape
    planes = [
        (((x >> np.uint64(8 * l)) & np.uint64(0xFF)).astype(jnp.int32) - 128).astype(
            jnp.int8
        )
        for l in range(8)
    ]
    st = jnp.stack(planes, axis=0)  # (8, B, K, R, S)
    st = jnp.transpose(st, (0, 3, 1, 2, 4))  # (8, R, B, K, S)
    return st.reshape(8 * r, b * k * s)


def _recombine(planes, cf, col_term):
    """planes (15,R,B,K,S) int32 + corrections -> GF (R,B,K,S)."""
    v = (planes + np.int32(OFF)).astype(_u64)
    sh8, sh16, sh24, sh32 = (np.uint64(s) for s in (8, 16, 24, 32))

    def chunk(i):
        return (
            v[i]
            + (v[i + 1] << sh8)
            + (v[i + 2] << sh16)
            + (v[i + 3] << sh24)
            + (v[i + 4] << sh32)
        )

    t = GF(chunk(0))
    t = gl.add(t, gl.mul_const(GF(chunk(5)), POW2_40))
    t = gl.add(t, gl.mul_const(GF(chunk(10)), POW2_80))
    t = gl.add_const(t, -OFFW2)
    t = gl.add(t, GF(jnp.asarray(cf)[:, None, None, None]))
    t = gl.add(t, col_term)
    return t


def ntt_mxu_flat(x, inverse: bool = False, plan: tuple = ()):
    """Transform rows of x ((B, n) uint64, canonical) -> (B, n) uint64.

    Natural-order in, natural-order out; matches prover.ntt.ntt exactly
    (including the 1/n scaling when inverse).
    """
    bsz, n = x.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    for R, K, S, F_big, cf, W in _stage_consts(log_n, inverse, plan):
        x = x.reshape(bsz, K, R, S)
        if W is not None:
            x = gl.mul(GF(x), GF(jnp.asarray(W)[None, :, :, None])).v
        col = gl.sum_axis(GF(x), axis=2)  # (B, K, S)
        col_term = gl.mul_const(col, C128W)
        rhs = _decompose(x)
        out = lax.dot_general(
            jnp.asarray(F_big),
            rhs,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        g = _recombine(out.reshape(15, R, bsz, K, S), cf, col_term)
        x = jnp.transpose(g.v, (1, 0, 2, 3)).reshape(bsz, R * K, S)
    x = x.reshape(bsz, n)
    if inverse:
        x = gl.mul_const(GF(x), pow(n, P - 2, P)).v
    return x
