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
