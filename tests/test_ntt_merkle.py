"""NTT/LDE and Merkle-cap tests vs host golden models."""

import random

import jax
import numpy as np

from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.goldilocks import P
from mp2_tpu.prover import merkle, ntt

rng = random.Random(3)


def rand_vec(n):
    return [rng.randrange(P) for _ in range(n)]


def test_ntt_matches_host():
    for log_n in [0, 1, 2, 4, 6, 8]:
        n = 1 << log_n
        vals = rand_vec(n)
        want = ntt.host_ntt(vals)
        got = [int(v) for v in gl.to_u64(ntt.ntt(gl.from_u64(vals)))]
        assert got == want, f"n={n}"


def test_ntt_roundtrip():
    n = 256
    vals = rand_vec(n)
    x = gl.from_u64(vals)
    back = gl.to_u64(ntt.intt(ntt.ntt(x)))
    assert [int(v) for v in back] == vals


def test_ntt_batched_jit():
    n, b = 64, 8
    rows = [rand_vec(n) for _ in range(b)]
    x = gl.from_u64(np.array(rows, dtype=object))
    f = jax.jit(ntt.ntt)
    got = gl.to_u64(f(x))
    for i in range(b):
        assert [int(v) for v in got[i]] == ntt.host_ntt(rows[i])


def test_ntt_is_evaluation():
    # NTT output k = p(w^k)
    n = 32
    coeffs = rand_vec(n)
    w = ntt._root_of_unity(5)
    got = [int(v) for v in gl.to_u64(ntt.ntt(gl.from_u64(coeffs)))]
    for k in [0, 1, 7, 31]:
        assert got[k] == ntt.host_eval_poly(coeffs, pow(w, k, P))


def test_coset_lde():
    n, rate = 16, 2
    coeffs = rand_vec(n)
    out = [int(v) for v in gl.to_u64(ntt.lde(gl.from_u64(coeffs), rate))]
    big_n = n << rate
    w = ntt._root_of_unity(big_n.bit_length() - 1)
    g = gl.MULTIPLICATIVE_GROUP_GENERATOR
    for k in [0, 1, 5, big_n - 1]:
        x = g * pow(w, k, P) % P
        assert out[k] == ntt.host_eval_poly(coeffs, x)
    # coset roundtrip
    back = gl.to_u64(ntt.coset_intt(ntt.coset_ntt(gl.from_u64(coeffs))))
    assert [int(v) for v in back] == coeffs


def test_merkle_matches_host_and_verifies():
    n, w = 16, 6
    rows = [rand_vec(w) for _ in range(n)]
    dev = merkle.MerkleTree(gl.from_u64(np.array(rows, dtype=object)), cap_height=1)
    host = merkle.HostMerkleTree(rows, cap_height=1)
    got_cap = [tuple(int(x) for x in r) for r in gl.to_u64(dev.cap)]
    assert got_cap == [tuple(c) for c in host.cap]

    cap = got_cap
    for index in [0, 3, 7, 15]:
        leaf, sibs = dev.open(index)
        assert [int(x) for x in leaf] == rows[index]
        assert merkle.verify_merkle_proof(leaf, index, sibs, cap)
        # tampered leaf must fail
        bad = list(leaf)
        bad[0] = (bad[0] + 1) % P
        assert not merkle.verify_merkle_proof(bad, index, sibs, cap)


def test_merkle_narrow_leaves_noop():
    # width <= 4: leaf digest is the padded row itself
    n = 8
    rows = [rand_vec(3) for _ in range(n)]
    dev = merkle.MerkleTree(gl.from_u64(np.array(rows, dtype=object)), cap_height=0)
    leaf0 = [int(v) for v in gl.to_u64(dev.digest_levels[0][0])]
    assert leaf0 == rows[0] + [0]


def test_challenger_device_matches_host():
    from mp2_tpu.hash.challenger import Challenger, HostChallenger

    obs = rand_vec(13)
    hc = HostChallenger()
    hc.observe(obs)
    want = hc.get_n_challenges(3)
    hc.observe([5])
    want.append(hc.get_challenge())

    dc = Challenger()
    dc.observe(gl.from_u64(obs))
    got = [int(gl.to_u64(c)) for c in dc.get_n_challenges(3)]
    dc.observe(gl.from_u64(5))
    got.append(int(gl.to_u64(dc.get_challenge())))
    assert got == want
