"""FRI prove/verify roundtrip + soundness-ish negative tests."""

import random

import numpy as np
import pytest

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.ext2 import GF2
from mp2_tpu.field.goldilocks import P
from mp2_tpu.hash.challenger import Challenger, HostChallenger
from mp2_tpu.prover import fri, ntt
from mp2_tpu.prover.merkle import MerkleTree

rng = random.Random(99)

CFG = fri.FriConfig(
    rate_bits=2, cap_height=1, proof_of_work_bits=4, num_query_rounds=12
)
DEG_BITS = 4  # polynomial degree bound 2^4
FINAL_BITS = 1  # fold down to degree 2
LOG_N = DEG_BITS + CFG.rate_bits


def _setup(coeff_c0=None, coeff_c1=None):
    n_deg = 1 << DEG_BITS
    c0 = coeff_c0 if coeff_c0 is not None else [rng.randrange(P) for _ in range(n_deg)]
    c1 = coeff_c1 if coeff_c1 is not None else [rng.randrange(P) for _ in range(n_deg)]
    # LDE of both components, bit-reversed
    e0 = ntt.lde(gl.from_u64(c0), CFG.rate_bits)
    e1 = ntt.lde(gl.from_u64(c1), CFG.rate_bits)
    evals_rev = fri.bit_reverse_ext(GF2(e0, e1))
    # a single initial oracle holding the components as a 2-wide matrix
    leaves = gl.stack([evals_rev.c0, evals_rev.c1], axis=-1)
    tree = MerkleTree(leaves, cap_height=1)
    return (c0, c1), evals_rev, tree


def _expected_eval(idx, leaves):
    row = leaves[0]
    return (int(row[0]), int(row[1]))


def _prove(evals_rev, tree):
    ch = Challenger()
    ch.observe(tree.cap.reshape((-1,)))
    return fri.prove(ch, evals_rev, [tree], CFG, FINAL_BITS)


def _verify(proof, cap_host):
    hch = HostChallenger()
    for row in cap_host:
        hch.observe([int(x) for x in row])
    return fri.verify(
        hch, proof, [cap_host], CFG, FINAL_BITS, LOG_N, _expected_eval
    )


def _cap_host(tree):
    return [tuple(int(x) for x in row) for row in gl.to_u64(tree.cap)]


def test_fri_roundtrip():
    _, evals_rev, tree = _setup()
    proof = _prove(evals_rev, tree)
    assert _verify(proof, _cap_host(tree))
    # structure sanity
    assert len(proof.commit_caps) == LOG_N - CFG.rate_bits - FINAL_BITS
    assert len(proof.final_poly) == 1 << FINAL_BITS
    assert len(proof.query_rounds) == CFG.num_query_rounds


def test_fri_rejects_tampered_final_poly():
    _, evals_rev, tree = _setup()
    proof = _prove(evals_rev, tree)
    proof.final_poly[0] = ((proof.final_poly[0][0] + 1) % P, proof.final_poly[0][1])
    assert not _verify(proof, _cap_host(tree))


def test_fri_rejects_tampered_query_value():
    _, evals_rev, tree = _setup()
    proof = _prove(evals_rev, tree)
    qr = proof.query_rounds[0]
    a, b = qr.steps[0].pair
    qr.steps[0].pair = (((a[0] + 1) % P, a[1]), b)
    assert not _verify(proof, _cap_host(tree))


def test_fri_rejects_wrong_cap():
    _, evals_rev, tree = _setup()
    proof = _prove(evals_rev, tree)
    bad_cap = [(1, 2, 3, 4)] * len(_cap_host(tree))
    assert not _verify(proof, bad_cap)


def test_fri_rejects_high_degree():
    # claim degree 2^DEG_BITS but use a polynomial of full lde degree
    n = 1 << LOG_N
    vals0 = [rng.randrange(P) for _ in range(n)]  # random = high degree w.h.p.
    vals1 = [rng.randrange(P) for _ in range(n)]
    evals_rev = fri.bit_reverse_ext(
        GF2(gl.from_u64(vals0), gl.from_u64(vals1))
    )
    leaves = gl.stack([evals_rev.c0, evals_rev.c1], axis=-1)
    tree = MerkleTree(leaves, cap_height=1)
    ch = Challenger()
    ch.observe(tree.cap.reshape((-1,)))
    with pytest.raises(AssertionError):
        # the honest prover refuses (degree check); a malicious prover would
        # be caught by the query checks instead
        fri.prove(ch, evals_rev, [tree], CFG, FINAL_BITS)
