"""Poseidon2: JAX vectorized vs host golden model; sponge semantics."""

import random

import pytest
import numpy as np

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import P
from mp2_tpu.hash import poseidon2 as p2
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.hash.constants import M4, WIDTH

rng = random.Random(11)


def test_m4_add_chain_matches_matrix():
    # the add-chain in the JAX impl must equal the explicit M4 product
    for _ in range(20):
        c = [rng.randrange(P) for _ in range(4)]
        want = [sum(M4[i][j] * c[j] for j in range(4)) % P for i in range(4)]
        got = p2h._apply_m4(c)
        assert got == want


def test_permute_jax_matches_host():
    batch = 16
    states = [[rng.randrange(P) for _ in range(WIDTH)] for _ in range(batch)]
    want = [p2h.permute(s) for s in states]
    x = gl.from_u64(np.array(states, dtype=object))
    got = gl.to_u64(p2.permute(x))
    assert [[int(v) for v in row] for row in got] == want


def test_permute_diffusion():
    s0 = [0] * WIDTH
    s1 = [1] + [0] * (WIDTH - 1)
    o0, o1 = p2h.permute(s0), p2h.permute(s1)
    assert o0 != o1
    assert all(a != b for a, b in zip(o0, o1))  # full diffusion


def test_sponge_matches_host():
    for n in [1, 4, 7, 8, 9, 16, 21]:
        inputs = [rng.randrange(P) for _ in range(n)]
        want = p2h.hash_no_pad(inputs)
        x = gl.from_u64(inputs)
        got = tuple(int(v) for v in gl.to_u64(p2.hash_no_pad(x)))
        assert got == want, f"n={n}"


def test_sponge_batched():
    batch, n = 8, 11
    rows = [[rng.randrange(P) for _ in range(n)] for _ in range(batch)]
    want = [p2h.hash_no_pad(r) for r in rows]
    x = gl.from_u64(np.array(rows, dtype=object))
    got = gl.to_u64(p2.hash_no_pad(x))
    assert [tuple(int(v) for v in row) for row in got] == want


def test_two_to_one_and_noop():
    l = [rng.randrange(P) for _ in range(4)]
    r = [rng.randrange(P) for _ in range(4)]
    want = p2h.two_to_one(tuple(l), tuple(r))
    got = tuple(
        int(v) for v in gl.to_u64(p2.two_to_one(gl.from_u64(l), gl.from_u64(r)))
    )
    assert got == want
    # hash_or_noop on short input = zero-padded identity
    short = [5, 6]
    assert p2h.hash_or_noop(short) == (5, 6, 0, 0)
    got = tuple(int(v) for v in gl.to_u64(p2.hash_or_noop(gl.from_u64(short))))
    assert got == (5, 6, 0, 0)


def test_empty_hash():
    assert p2h.empty_poseidon_hash() == (0, 0, 0, 0)


def test_hash_to_int():
    h = p2h.hash_no_pad([1, 2, 3])
    n = p2h.hash_to_int(h)
    assert n == (h[0] & ((1 << 64) - 1)) + ((h[1] & ((1 << 64) - 1)) << 64)
    assert n < 1 << 128


def test_map_to_curve_point():
    pt = p2h.map_to_curve_point([1, 2, 3, 4])
    assert pt.is_valid() and not pt.is_neutral
    # deterministic
    assert p2h.map_to_curve_point([1, 2, 3, 4]) == pt
    assert p2h.map_to_curve_point([1, 2, 3, 5]) != pt


@pytest.mark.skipif(
    not __import__("os").environ.get("MP2_SLOW"),
    reason="set MP2_SLOW=1 for prove-heavy tests",
)
def test_pluggable_tables_full_pipeline():
    """The 'tables are pluggable' claim (BASELINE.md): swapping in a
    SECOND deterministic Poseidon2 table set (MP2_P2_DOMAIN=v2-test) and
    re-running params build -> prove -> host-verify works end-to-end, and
    produces a different transcript — evidencing that dropping in the
    canonical poseidon2_plonky2 tables later is a constants-only change
    (every consumer reads through hash/constants.load_table)."""
    import os
    import subprocess
    import sys

    prog = (
        "from mp2_tpu.circuit.builder import CircuitBuilder\n"
        "from mp2_tpu.hash import poseidon2_host as p2h\n"
        "from mp2_tpu.prover.config import test_config\n"
        "from mp2_tpu.prover.prove import prove\n"
        "from mp2_tpu.prover.verify import verify\n"
        "b = CircuitBuilder(test_config())\n"
        "xs = b.add_inputs(2)\n"
        "h = b.hash_no_pad(xs)\n"
        "b.register_public_inputs(h)\n"
        "data = b.build()\n"
        "vals = [5, 7]\n"
        "w = data.generate_witness(dict(zip(xs, vals)))\n"
        "pis = list(p2h.hash_no_pad(vals))\n"
        "proof = prove(data, w, pis)\n"
        "assert verify(data, proof)\n"
        "print('HASH', pis[0])\n"
    )
    outs = {}
    for domain in ("v1", "v2-test"):
        env = dict(
            os.environ, MP2_P2_DOMAIN=domain, JAX_PLATFORMS="cpu",
            JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache",
        )
        r = subprocess.run(
            [sys.executable, "-c", prog], env=env,
            capture_output=True, text=True, timeout=2400,
        )
        assert r.returncode == 0, f"{domain} pipeline failed:\n{r.stderr[-2000:]}"
        outs[domain] = [
            line for line in r.stdout.splitlines() if line.startswith("HASH")
        ][0]
    # different table sets => different sponge outputs (and both verified)
    assert outs["v1"] != outs["v2-test"]
