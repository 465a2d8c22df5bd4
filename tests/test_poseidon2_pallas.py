"""Interpret-mode equivalence tests for the Pallas Poseidon2 kernel.

The fast suite runs on CPU where the pallas fast path is disabled at
runtime (ops dispatch checks the platform), so without these tests a
kernel regression would only surface on real TPU hardware.  The
interpreter executes the same kernel program (same layout, same lazy
u32-pair math) element-for-element.

Reference role: plonky2 Poseidon2 permutation (mp2-common pins
poseidon2_plonky2 — /root/reference/mp2-common/src/lib.rs:36-47); tables
here are the repo's own deterministic set (hash/constants.py).
"""

import numpy as np
import pytest

from mp2_tpu.field.goldilocks import P
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.ops.poseidon2_pallas import TILE_L, permute_batch_u64_interpret


@pytest.mark.parametrize("batch", [1, 8 * TILE_L, 8 * TILE_L + 37])
def test_kernel_matches_host_golden(batch):
    rng = np.random.default_rng(batch)
    st = rng.integers(0, P, size=(batch, 12), dtype=np.uint64)
    out = np.asarray(permute_batch_u64_interpret(st))
    assert out.shape == st.shape
    for i in {0, batch // 2, batch - 1}:
        exp = p2h.permute([int(v) for v in st[i]])
        assert [int(v) for v in out[i]] == [int(v) for v in exp]


@pytest.mark.parametrize("batch", [8 * TILE_L, 1024 + 37])
def test_planar_lanes_match_stacked(batch):
    """permute_lanes_u64 (planar, no-transpose pack) == (B,12) API."""
    from mp2_tpu.ops.poseidon2_pallas import permute_lanes_u64_interpret

    rng = np.random.default_rng(7 + batch)
    st = rng.integers(0, P, size=(batch, 12), dtype=np.uint64)
    want = np.asarray(permute_batch_u64_interpret(st))
    got = np.stack(
        [
            np.asarray(o)
            for o in permute_lanes_u64_interpret([st[:, i] for i in range(12)])
        ],
        axis=1,
    )
    np.testing.assert_array_equal(got, want)


def test_kernel_matches_xla_path():
    """The XLA permute path and the kernel agree on a full batch."""
    from mp2_tpu.field import goldilocks as gl
    from mp2_tpu.hash.poseidon2 import _permute_jit

    rng = np.random.default_rng(0)
    st = rng.integers(0, P, size=(1024, 12), dtype=np.uint64)
    out_k = np.asarray(permute_batch_u64_interpret(st))
    out_x = np.asarray(_permute_jit(gl.from_u64(st)).v)
    np.testing.assert_array_equal(out_k, out_x)
