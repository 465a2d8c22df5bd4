"""Poseidon2 permutation, vectorized over arbitrary batch shapes (JAX).

State is a GF tensor of shape (..., 12); all lanes of the batch run the
permutation in lockstep on the VPU.  Bit-identical to the host golden model
(mp2_tpu.hash.poseidon2_host) — asserted in tests/test_poseidon2.py.

Design notes (TPU/XLA):
  * rounds are rolled into lax.fori_loop with the constant tables as gathered
    arrays — keeps the traced graph small (fast compiles) while XLA unrolls/
    pipelines as it sees fit;
  * the M4 block acts on shape (..., 3, 4) so the three 4-lane chunks fold
    into the batch — one add-chain serves all chunks;
  * small-constant multiplies use add/double chains (an add is ~10 u32 VPU
    ops vs ~60 for a generic 64x64 field mul);
  * jit per batch shape, with batch canonicalized to flat power-of-two sizes
    by the sponge wrappers to bound the number of compilations.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF
from mp2_tpu.hash.constants import RATE, ROUNDS_F, ROUNDS_P, WIDTH, load_table

_EXT_RC, _INT_RC, _INT_DIAG = load_table()


def _const_table(vals) -> GF:
    arr = np.asarray(vals, dtype=np.object_)
    return gl.from_u64(arr)


# (8, 12), (22,), (12,) constant tables as GF tensors.
_EXT_RC_T = _const_table(_EXT_RC)
_INT_RC_T = _const_table(_INT_RC)
_INT_DIAG_M1_T = _const_table([(d - 1) % gl.P for d in _INT_DIAG])


def _dbl(x: GF) -> GF:
    return gl.add(x, x)


def _external_linear(state: GF) -> GF:
    """M_E = circ(2*M4, M4, M4) acting on (..., 12)."""
    batch = state.shape[:-1]
    c = state.reshape(batch + (3, 4))
    c0, c1, c2, c3 = (c[..., i] for i in range(4))
    # M4 add-chain (Poseidon2 reference optimization), chunk dim in batch:
    t0 = gl.add(c0, c1)
    t1 = gl.add(c2, c3)
    t2 = gl.add(_dbl(c1), t1)
    t3 = gl.add(_dbl(c3), t0)
    t4 = gl.add(_dbl(_dbl(t1)), t3)
    t5 = gl.add(_dbl(_dbl(t0)), t2)
    t6 = gl.add(t3, t5)
    t7 = gl.add(t2, t4)
    m = gl.stack([t6, t5, t7, t4], axis=-1)  # (..., 3, 4)
    # add the sum of the three chunks to each chunk
    s01 = gl.add(m[..., 0, :], m[..., 1, :])
    total = gl.add(s01, m[..., 2, :])  # (..., 4)
    out = gl.add(m, GF(total.v[..., None, :]))
    return out.reshape(batch + (WIDTH,))


def _sum_lanes(state: GF) -> GF:
    """Field sum over the last axis (12 lanes), log-depth."""
    x = state
    # 12 -> 6 -> 3 -> (2+1) -> 1
    while x.shape[-1] > 1:
        n = x.shape[-1]
        half = n // 2
        red = gl.add(x[..., 0 : 2 * half : 2], x[..., 1 : 2 * half : 2])
        if n % 2:
            red = gl.concat([red, x[..., n - 1 :]], axis=-1)
        x = red
    return x[..., 0]


def _internal_linear(state: GF) -> GF:
    s = _sum_lanes(state)
    scaled = gl.mul(state, _INT_DIAG_M1_T)
    return gl.add(scaled, GF(s.v[..., None]))


def _permute_impl(state: GF) -> GF:
    half = ROUNDS_F // 2
    st = _external_linear(state)

    def full_round(r, st, offset):
        rc = _EXT_RC_T[r + offset]
        st = gl.exp7(gl.add(st, rc))
        return _external_linear(st)

    def partial_round(r, st):
        rc = _INT_RC_T[r]
        x0 = gl.exp7(gl.add(st[..., 0], rc))
        st = GF(st.v.at[..., 0].set(x0.v))
        return _internal_linear(st)

    st = jax.lax.fori_loop(0, half, lambda r, s: full_round(r, s, 0), st)
    st = jax.lax.fori_loop(0, ROUNDS_P, partial_round, st)
    st = jax.lax.fori_loop(0, half, lambda r, s: full_round(r, s, half), st)
    return st


_permute_jit = jax.jit(_permute_impl)

# Pallas fast path: used on TPU backends for large batches (bit-exact with
# the XLA path; ~5x faster on v5e).  Set MP2_NO_PALLAS=1 to disable.
_PALLAS_MIN_BATCH = 1024
# "ok" gates the stacked (B,12) entry; "planar_ok" gates the per-lane
# entry separately, so a planar-only trace failure degrades to the
# stacked kernel instead of all the way to the XLA path (ADVICE r4).
_pallas_state = {"checked": False, "ok": False, "planar_ok": True}


def _pallas_available() -> bool:
    import os

    if _pallas_state["checked"]:
        return _pallas_state["ok"]
    _pallas_state["checked"] = True
    if os.environ.get("MP2_NO_PALLAS"):
        _pallas_state["ok"] = False
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    _pallas_state["ok"] = plat not in ("cpu",)
    return _pallas_state["ok"]


def permute(state: GF) -> GF:
    """Permutation on a GF tensor of shape (..., 12)."""
    batch = state.shape[:-1]
    n = 1
    for d in batch:
        n *= d
    if n >= _PALLAS_MIN_BATCH and _pallas_available():
        try:
            from mp2_tpu.ops.poseidon2_pallas import permute_batch_u64

            flat = state.v.reshape(n, WIDTH)
            out = permute_batch_u64(flat)
            return GF(out.reshape(state.v.shape))
        except Exception:
            _pallas_state["ok"] = False  # fall back permanently
    return _permute_jit(state)


def permute_lanes(lanes: List[GF]) -> List[GF]:
    """Permutation on 12 separate GF tensors (one per lane).

    Per-lane tensors are already plane-major, which is the Pallas
    kernel's native layout — the planar entry skips the two
    (B,12)<->(12,B) transposes the stacked API pays (~2x wall at 2^20
    on v5e), so this is the prover's hot entry (sponge / merkle lanes).
    """
    batch = lanes[0].shape
    n = 1
    for d in batch:
        n *= d
    if (
        n >= _PALLAS_MIN_BATCH
        and _pallas_available()
        and _pallas_state["planar_ok"]
    ):
        try:
            from mp2_tpu.ops.poseidon2_pallas import permute_lanes_u64

            flat = [x.v.reshape(n) for x in lanes]
            out = permute_lanes_u64(flat)
            return [GF(o.reshape(batch)) for o in out]
        except Exception:
            _pallas_state["planar_ok"] = False  # stacked path still usable
    out = permute(gl.stack(lanes, axis=-1))
    return [out[..., i] for i in range(WIDTH)]


def _sponge_impl(inputs: GF, num_outputs: int) -> GF:
    n = inputs.shape[-1]
    batch = inputs.shape[:-1]
    state = [gl.zeros(batch) for _ in range(WIDTH)]
    for i in range(0, n, RATE):
        k = min(RATE, n - i)
        for j in range(k):
            state[j] = inputs[..., i + j]
        state = [s for s in _permute_lanes_list(state)]
    outputs: List[GF] = []
    while True:
        for x in state[:RATE]:
            outputs.append(x)
            if len(outputs) == num_outputs:
                return gl.stack(outputs, axis=-1)
        state = [s for s in _permute_lanes_list(state)]


def _permute_lanes_list(lanes: List[GF]) -> List[GF]:
    return permute_lanes(lanes)


_sponge_jit_cache = {}


def hash_n_to_m_no_pad(inputs: GF, num_outputs: int) -> GF:
    """Sponge over shape (..., n) -> (..., num_outputs).

    n is static; absorption is overwrite-mode in chunks of RATE with no
    padding (plonky2 semantics; matches the host model).  Jitted per input
    shape so the per-lane absorb slicing traces once.
    """
    key = (inputs.v.shape, num_outputs)
    fn = _sponge_jit_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda x, m=num_outputs: _sponge_impl(x, m))
        _sponge_jit_cache[key] = fn
    return fn(inputs)


def hash_no_pad(inputs: GF) -> GF:
    return hash_n_to_m_no_pad(inputs, 4)


def hash_or_noop(inputs: GF) -> GF:
    n = inputs.shape[-1]
    if n <= 4:
        pad = gl.zeros(inputs.shape[:-1] + (4 - n,))
        return gl.concat([inputs, pad], axis=-1)
    return hash_no_pad(inputs)


def two_to_one(left: GF, right: GF) -> GF:
    """(..., 4) x (..., 4) -> (..., 4)."""
    return hash_no_pad(gl.concat([left, right], axis=-1))
