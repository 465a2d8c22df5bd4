"""In-circuit keccak-256 vs the host implementation (the MPT/block-header
hash of the extraction circuits, mp2-common/src/keccak.rs role)."""

import numpy as np

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.circuit.gadgets.keccak import (
    bits_to_u32s,
    keccak256_fixed,
    set_bytes,
)
from mp2_tpu.prover.config import test_config
from mp2_tpu.utils.keccak import keccak256


def _bits_of_digest(d: bytes):
    bits = []
    for byte in d:
        for k in range(8):
            bits.append((byte >> k) & 1)
    return bits


def test_keccak256_single_block_matches_host():
    msg = bytes(range(64))
    b = CircuitBuilder(test_config())
    byte_ts = b.add_inputs(len(msg))
    out_bits = keccak256_fixed(b, byte_ts)
    packed = bits_to_u32s(b, out_bits)
    b.register_public_inputs(packed)
    data = b.build()

    inputs = {}
    set_bytes(inputs, byte_ts, msg)
    w = data.generate_witness(inputs)
    digest = keccak256(msg)
    want_bits = _bits_of_digest(digest)
    want_packed = [
        sum(bit << k for k, bit in enumerate(want_bits[i : i + 32]))
        for i in range(0, 256, 32)
    ]
    data.check_witness(w, want_packed)


def test_keccak256_two_blocks_matches_host():
    msg = bytes((7 * i + 3) % 256 for i in range(150))  # > 136: two blocks
    b = CircuitBuilder(test_config())
    byte_ts = b.add_inputs(len(msg))
    out_bits = keccak256_fixed(b, byte_ts)
    packed = bits_to_u32s(b, out_bits)
    b.register_public_inputs(packed)
    data = b.build()

    inputs = {}
    set_bytes(inputs, byte_ts, msg)
    w = data.generate_witness(inputs)
    want_bits = _bits_of_digest(keccak256(msg))
    want_packed = [
        sum(bit << k for k, bit in enumerate(want_bits[i : i + 32]))
        for i in range(0, 256, 32)
    ]
    data.check_witness(w, want_packed)
