"""keccak256, RLP, and MPT trie vs known Ethereum vectors."""

import random

from mp2_tpu.utils.keccak import _keccak256_py, keccak256
from mp2_tpu.utils.rlp import decode, encode, encode_int
from mp2_tpu.utils.trie import MPT, verify_proof

rng = random.Random(31)


def test_keccak_vectors():
    # canonical Ethereum keccak256 vectors
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    assert (
        keccak256(b"The quick brown fox jumps over the lazy dog").hex()
        == "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15"
    )
    # rate-boundary input (exactly one block) must differ from off-by-one
    assert keccak256(b"a" * 136) != keccak256(b"a" * 135)
    # python fallback == dispatcher
    data = bytes(rng.randrange(256) for _ in range(1000))
    assert keccak256(data) == _keccak256_py(data)


def test_rlp_roundtrip():
    cases = [
        b"",
        b"\x00",
        b"\x7f",
        b"\x80",
        b"dog",
        b"x" * 55,
        b"y" * 56,
        b"z" * 1000,
        [],
        [b"cat", b"dog"],
        [b"a", [b"b", [b"c", []]]],
        [b"k" * 60, [b"v" * 100]],
    ]
    for c in cases:
        assert decode(encode(c)) == c
    # known encodings
    assert encode(b"dog").hex() == "83646f67"
    assert encode([b"cat", b"dog"]).hex() == "c88363617483646f67"
    assert encode_int(0) == b"\x80"
    assert encode_int(15) == b"\x0f"
    assert encode_int(1024).hex() == "820400"


def test_mpt_single_and_proof():
    t = MPT(secure=True)
    t.insert(b"key1", b"value1")
    root = t.root_hash()
    proof = t.get_proof(b"key1")
    assert verify_proof(root, b"key1", proof) == b"value1"


def test_mpt_many_keys():
    t = MPT(secure=True)
    kvs = {}
    for i in range(100):
        k = i.to_bytes(32, "big")
        v = bytes([i % 250 + 1]) * (1 + i % 40)
        kvs[k] = v
        t.insert(k, v)
    root = t.root_hash()
    for k, v in list(kvs.items())[::7]:
        assert t.get(k) == v
        proof = t.get_proof(k)
        assert verify_proof(root, k, proof) == v
        assert len(proof) >= 2  # branch + leaf at minimum for 100 keys
    # tampered proof fails
    k = list(kvs)[0]
    proof = t.get_proof(k)
    bad = [proof[0][:-1] + bytes([proof[0][-1] ^ 1])] + proof[1:]
    try:
        verify_proof(root, k, bad)
        assert False, "tampered proof accepted"
    except AssertionError as e:
        assert "mismatch" in str(e) or "path" in str(e)


def test_mpt_storage_trie_shape():
    """Shape of a real storage trie: slot -> rlp(value), secure keys."""
    t = MPT(secure=True)
    slot0 = (0).to_bytes(32, "big")
    value = encode_int(0x1234)
    t.insert(slot0, value)
    for i in range(1, 20):
        t.insert(i.to_bytes(32, "big"), encode_int(i * 1000))
    proof = t.get_proof(slot0)
    assert verify_proof(t.root_hash(), slot0, proof) == value
