"""Device-mesh utilities: the multi-chip compute path of the prover.

Axes (SURVEY.md §2.9 mapping of the reference's parallelism constructs):
  dp — data-parallel over independent proofs/witnesses (the map phase; the
       reference farms these to its worker network as serialized inputs)
  mp — model/tensor-parallel within one proof: wire columns, NTT butterfly
       halves, Merkle levels (the reference's rayon intra-proof parallelism,
       re-architected as XLA collectives over ICI)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import GF
from mp2_tpu.hash import poseidon2 as p2
from mp2_tpu.prover import fri as fri_mod
from mp2_tpu.prover import ntt


def make_mesh(n_devices: Optional[int] = None, mp_size: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if mp_size is None:
        mp_size = 2 if n % 2 == 0 else 1
    dp = n // mp_size
    return Mesh(np.array(devs[: dp * mp_size]).reshape(dp, mp_size), ("dp", "mp"))


def sharded_leaf_commit(mesh: Mesh):
    """Build the sharded batched-commitment step over (dp, mp):
    input (B, W, n) u64 witness batch, B sharded over dp, W over mp."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("dp", "mp", None),),
        out_specs=(P("dp"), P()),
        check_vma=False,
    )
    def step(wv):
        w = GF(wv)
        coeffs = ntt.intt(w)
        lde = ntt.lde(coeffs, 1)
        rev = fri_mod.bit_reverse(lde)
        full = jax.lax.all_gather(rev.v, "mp", axis=1, tiled=True)
        leaves = GF(jnp.swapaxes(full, 1, 2))
        digests = p2.hash_or_noop(leaves)
        caps = p2.two_to_one(digests[:, 0::2], digests[:, 1::2])
        gathered = jax.lax.all_gather(caps.v, "dp", axis=0, tiled=True)
        acc = GF(gathered[0, :, 0])
        for i in range(1, gathered.shape[0]):
            acc = gl.add(acc, GF(gathered[i, :, 0]))
        return caps.v, acc.v

    return jax.jit(step)


def sharded_ntt(mesh: Mesh):
    """Batched NTT with the batch sharded over ALL devices (dp x mp flattened):
    each chip transforms its slice of independent polynomials.  The
    cross-chip single-large-NTT (four-step with all_to_all over mp) is the
    next scale-out milestone."""

    flat = Mesh(mesh.devices.reshape(-1), ("b",))

    @partial(
        jax.shard_map, mesh=flat, in_specs=(P("b", None),), out_specs=P("b", None)
    )
    def step(xv):
        return ntt.ntt(GF(xv)).v

    return jax.jit(step)


def sharded_quotient(mesh: Mesh, data):
    """Quotient evaluation sharded over the LDE DOMAIN axis on mp (SURVEY
    §2.9 intra-proof parallelism): the quotient body is pointwise in the
    domain (prove._make_quotient_body — the z-rotation, the only
    cross-position access, is hoisted to the caller where XLA inserts the
    collective permute), so each chip evaluates every gate constraint and
    permutation term on its domain slice with NO collectives in the body.

    Returns fn(fixed_lde, wire_lde, zs_lde, betas, gammas, alphas,
    pi_hash) -> (nc, big) u64, bit-identical to the single-chip
    quotient."""
    from mp2_tpu.prover.prove import (
        _lde_tables,
        _make_quotient_body,
        _z_rotations,
    )

    body = _make_quotient_body(data)
    cfg = data.config
    x_t, zh_inv_t, l0_t = _lde_tables(data.log_n, cfg.fri.rate_bits)
    flat = Mesh(mesh.devices.reshape(-1), ("mp",))

    col = P(None, "mp")  # (C, big): domain axis sharded
    vec = P("mp")
    rep = P()

    @partial(
        jax.shard_map,
        mesh=flat,
        in_specs=(col, col, col, col, vec, vec, vec, rep, rep, rep, rep),
        out_specs=col,
        check_vma=False,
    )
    def shard_body(f, w, z, zn, x, zi, l0, be, ga, al, ph):
        return body(
            GF(f), GF(w), GF(z), GF(zn), GF(x), GF(zi), GF(l0),
            GF(be), GF(ga), GF(al), GF(ph),
        ).v

    def fn(fixed_lde, wire_lde, zs_lde, betas, gammas, alphas, pi_hash):
        zs_next = _z_rotations(data, GF(zs_lde))  # global roll: XLA collective
        return shard_body(
            fixed_lde, wire_lde, zs_lde, zs_next.v,
            jnp.asarray(x_t), jnp.asarray(zh_inv_t), jnp.asarray(l0_t),
            betas, gammas, alphas, pi_hash,
        )

    return jax.jit(fn)


def sharded_fri_fold(mesh: Mesh):
    """One arity-2 FRI fold with the (bit-reversed) codeword sharded over
    ALL devices: rev order makes fold partners ADJACENT, so each chip
    folds its contiguous slice locally (inv_2x table sharded to match) —
    zero collectives per fold round.

    Returns fn(c0, c1, beta0, beta1, inv2x) -> (c0', c1') halves of the
    folded codeword, bit-identical to fri.fold_codeword."""
    from mp2_tpu.field import ext2

    flat = Mesh(mesh.devices.reshape(-1), ("mp",))

    @partial(
        jax.shard_map,
        mesh=flat,
        in_specs=(P("mp"), P("mp"), P(), P(), P("mp")),
        out_specs=(P("mp"), P("mp")),
        check_vma=False,
    )
    def step(c0, c1, b0, b1, inv2x):
        v = ext2.GF2(GF(c0), GF(c1))
        beta = ext2.GF2(GF(b0), GF(b1))
        out = fri_mod.fold_codeword(v, beta, GF(inv2x))
        return out.c0.v, out.c1.v

    return jax.jit(step)
