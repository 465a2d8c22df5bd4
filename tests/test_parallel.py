"""Map-reduce scheduler + device-mesh sharded steps (8 virtual devices)."""

import numpy as np

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.parallel.mesh import make_mesh, sharded_leaf_commit, sharded_ntt
from mp2_tpu.parallel.scheduler import BatchedPoseidonProver, MapReduceScheduler
from mp2_tpu.prover import ntt
from mp2_tpu.ryhope.sbbst import Sbbst
from mp2_tpu.ryhope.updatetree import UpdateTree


def test_scheduler_batches_levels():
    t = Sbbst(n=15)
    paths = [t.ascendance(k) for k in [1, 3, 5, 7, 9, 11, 13, 15]]
    ut = UpdateTree.from_paths(paths)
    prover = BatchedPoseidonProver()
    sched = MapReduceScheduler(prover)

    def classify(key):
        l, r = t.children(key)
        kind = "leaf" if l is None and r is None else "node"
        return kind, [key, 0, 0]

    proofs, stats = sched.run(ut.into_workplan(), classify)
    assert len(proofs) == 15
    # 8 leaves in the first level, then 4, 2, 1
    assert stats.per_level_sizes == [8, 4, 2, 1]
    # one device dispatch per (level, circuit) group
    assert prover.dispatches == stats.batches == 4
    assert stats.max_batch == 8


def test_sharded_ntt_matches_single_device():
    mesh = make_mesh(8)
    B, n = 16, 64
    rng = np.random.default_rng(3)
    x = rng.integers(0, gl.P, size=(B, n), dtype=np.uint64)
    import jax.numpy as jnp

    out_sharded = np.asarray(sharded_ntt(mesh)(jnp.asarray(x)))
    out_local = gl.to_u64(ntt.ntt(gl.from_u64(x)))
    assert (out_sharded == out_local).all()


def test_sharded_leaf_commit_runs():
    mesh = make_mesh(8)
    dp, mp = mesh.devices.shape
    B, W, n = 2 * dp, 8 * mp, 32
    rng = np.random.default_rng(4)
    import jax.numpy as jnp

    wires = jnp.asarray(rng.integers(0, gl.P, size=(B, W, n), dtype=np.uint64))
    caps, acc = sharded_leaf_commit(mesh)(wires)
    assert caps.shape == (B, n, 4)
    assert acc.shape == (n,)
