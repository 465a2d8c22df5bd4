"""MPT node circuits: in-circuit keccak binding + RLP parsing + digest
extraction vs the host extraction layer (values_extraction leaf/branch)."""

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.extraction import storage_key as SK
from mp2_tpu.extraction import values as V
from mp2_tpu.extraction.columns import simple_column
from mp2_tpu.extraction.mpt_circuits import (
    NUM_MPT_PIS,
    build_branch_circuit,
    build_leaf_single_circuit,
    host_key_nibbles,
    host_leaf_s,
    mpt_pi_values,
)
from mp2_tpu.prover.config import test_config
from mp2_tpu.utils import rlp
from mp2_tpu.utils.keccak import keccak256
from mp2_tpu.utils.trie import MPT, verify_proof
from mp2_tpu.utils.u256 import left_pad32

ADDR = bytes(range(20))
CHAIN_ID = 1


@pytest.fixture(scope="module")
def fixture():
    """A struct slot spanning 3 EVM words: one full-word column per word
    (each word is its own trie leaf at pad32(slot + w))."""
    from mp2_tpu.extraction.columns import ColumnInfo

    slot = 3
    table = [
        ColumnInfo(
            slot=slot,
            identifier=V.identifier_for_value_column(
                slot, 0, 256, w, ADDR, CHAIN_ID
            ),
            byte_offset=0, bit_offset=0, length=256, evm_word=w,
        )
        for w in range(3)
    ]
    value_id = table[0].identifier
    trie = MPT(secure=True)
    entries = {}
    for w in range(3):
        loc = SK.simple_slot_location(slot, evm_word=w)
        val = 10**18 + w + 1  # large enough that leaves are hash-referenced
        trie.insert(loc, rlp.encode_int(val))
        entries[loc] = val
    return trie, table, value_id, entries


def test_leaf_single_circuit_matches_host(fixture):
    trie, table, value_id, entries = fixture
    loc = next(iter(entries))
    proof = trie.get_proof(loc)
    leaf_body = proof[-1]
    value_rlp = verify_proof(trie.root_hash(), loc, proof)
    value = left_pad32(rlp.decode(value_rlp))

    key_nibs = host_key_nibbles(loc)
    s = host_leaf_s(leaf_body)
    mc = build_leaf_single_circuit(table, value_id)
    inputs = {}
    mc.assign(inputs, leaf_body, key_nibs)
    dv = V.compute_leaf_single_values_digest(table, [value_id], value)
    dm = V.compute_leaf_single_metadata_digest(table)
    pis = mpt_pi_values(keccak256(leaf_body), dv, dm, 1, key_nibs, s)
    w = mc.data.generate_witness(inputs)
    mc.data.check_witness(w, pis)

    # forged value digest must fail
    bad = mpt_pi_values(
        keccak256(leaf_body),
        V.compute_leaf_single_values_digest(
            table, [value_id], left_pad32(b"\x01")
        ),
        dm, 1, key_nibs, s,
    )
    with pytest.raises(AssertionError):
        mc.data.check_witness(w, bad)

    # the key is BAKED to this word's location: a leaf at a DIFFERENT
    # storage word cannot prove under this circuit
    other_loc = [l for l in entries if l != loc][0]
    other_body = trie.get_proof(other_loc)[-1]
    inputs = {}
    mc.assign(inputs, other_body)
    with pytest.raises((ValueError, AssertionError)):
        w2 = mc.data.generate_witness(inputs)
        mc.data.check_witness(
            w2,
            mpt_pi_values(
                keccak256(other_body), dv, dm, 1, key_nibs,
                host_leaf_s(other_body),
            ),
        )
    # and claiming someone else's key nibbles is rejected up front
    with pytest.raises(AssertionError):
        mc.assign({}, other_body, host_key_nibbles(other_loc))


class _Stub:
    def __init__(self, b, n):
        self.ts = b.add_inputs(n)

    def pis(self):
        return list(self.ts)

    def assign(self, inputs, vals):
        for t, v in zip(self.ts, vals):
            inputs[t] = int(v)


def test_branch_circuit_matches_host(fixture):
    trie, table, value_id, entries = fixture
    # find a branch with >= 2 hash children among the proofs
    locs = list(entries)
    proofs = {loc: trie.get_proof(loc) for loc in locs}
    branch_body = proofs[locs[0]][0]
    assert branch_body[0] >= 0xF7 or branch_body[0] >= 0xC0
    # children of the branch that are proof leaf bodies
    children, child_keys = [], []
    for loc in locs:
        pr = proofs[loc]
        if len(pr) >= 2 and pr[0] == branch_body:
            children.append(pr[1])
            child_keys.append(host_key_nibbles(loc))
    assert len(children) >= 2, "fixture must share a root branch"
    children, child_keys = children[:2], child_keys[:2]

    # host-side expected PIs per child (leaf outputs)
    child_vals = []
    for body, knibs in zip(children, child_keys):
        items = rlp.decode(body)
        value = left_pad32(rlp.decode(items[1]))
        dv = V.compute_leaf_single_values_digest(table, [value_id], value)
        dm = V.compute_leaf_single_metadata_digest(table)
        child_vals.append(
            mpt_pi_values(keccak256(body), dv, dm, 1, knibs,
                          host_leaf_s(body))
        )

    # find each child's nibble slot in the branch
    branch_items = rlp.decode(branch_body)
    slots = []
    for body in children:
        h = keccak256(body)
        slots.append(next(i for i, it in enumerate(branch_items) if it == h))

    b = CircuitBuilder(test_config())
    stubs = [_Stub(b, NUM_MPT_PIS) for _ in range(2)]
    build = build_branch_circuit(2, None, max_len=272)
    assign = build(b, [s.pis() for s in stubs])
    data = b.build()

    inputs = {}
    assign(inputs, branch_body, slots, child_keys[0])
    for s, vals in zip(stubs, child_vals):
        s.assign(inputs, vals)

    from mp2_tpu.field.ecgfp5 import Point

    dv_total = Point.from_fields(child_vals[0][8:19]) + Point.from_fields(
        child_vals[1][8:19]
    )
    dm = Point.from_fields(child_vals[0][19:30])
    s_new = host_leaf_s(children[0]) - 1
    want = mpt_pi_values(
        keccak256(branch_body), dv_total, dm, 2, child_keys[0], s_new
    )
    w = data.generate_witness(inputs)
    data.check_witness(w, want)

    # swapping the two slot witnesses breaks the key-nibble consumption
    inputs = {}
    assign(inputs, branch_body, slots[::-1], child_keys[0])
    for s, vals in zip(stubs, child_vals):
        s.assign(inputs, vals)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, want)


def test_extension_circuit_matches_host(fixture):
    """Extension node passes digests through and binds the child hash."""
    from mp2_tpu.extraction.mpt_circuits import build_extension_circuit_body

    trie, table, value_id, entries = fixture
    loc = next(iter(entries))
    proof = trie.get_proof(loc)
    leaf_body = proof[-1]
    child_hash = keccak256(leaf_body)
    # synthesize an extension node referencing the leaf
    ext_body = rlp.encode([b"\x00\x01", child_hash])

    items = rlp.decode(leaf_body)
    value = left_pad32(rlp.decode(items[1]))
    dv = V.compute_leaf_single_values_digest(table, [value_id], value)
    dm = V.compute_leaf_single_metadata_digest(table)
    # ext path b"\x00\x01" consumes nibbles [0, 1]; craft a child key whose
    # segment [0, 2) matches and claim the child consumed everything below
    key = [0, 1] + [7] * 62
    child_pis = mpt_pi_values(child_hash, dv, dm, 1, key, 2)

    b = CircuitBuilder(test_config())
    stub = _Stub(b, NUM_MPT_PIS)
    assign = __import__(
        "mp2_tpu.extraction.mpt_circuits", fromlist=["x"]
    ).build_extension_circuit_body(b, stub.pis(), 69)
    data = b.build()
    inputs = {}
    assign(inputs, ext_body)
    stub.assign(inputs, child_pis)
    want = mpt_pi_values(keccak256(ext_body), dv, dm, 1, key, 0)
    w = data.generate_witness(inputs)
    data.check_witness(w, want)

    # an extension whose path disagrees with the child's key segment fails
    bad_key = [5, 5] + [7] * 62
    inputs = {}
    assign(inputs, ext_body)
    stub.assign(inputs, mpt_pi_values(child_hash, dv, dm, 1, bad_key, 2))
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(
            w, mpt_pi_values(keccak256(ext_body), dv, dm, 1, bad_key, 0)
        )


slow = pytest.mark.skipif(
    not __import__("os").environ.get("MP2_SLOW"),
    reason="set MP2_SLOW=1 for prove-heavy tests",
)


@slow
def test_values_extraction_recursive_set(fixture):
    """leaf -> branch proved RECURSIVELY under the extraction set's fixed
    VK (values_extraction/api.rs role): branch verifies both leaf proofs
    in-circuit and binds their hashes into the parent node bytes."""
    from mp2_tpu.extraction.mpt_circuits import ValuesExtractionCircuits

    trie, table, value_id, entries = fixture
    locs = list(entries)
    proofs = {loc: trie.get_proof(loc) for loc in locs}
    branch_body = proofs[locs[0]][0]
    children_bodies, child_keys, child_words = [], [], []
    for loc in locs:
        pr = proofs[loc]
        if len(pr) >= 2 and pr[0] == branch_body:
            children_bodies.append(pr[1])
            child_keys.append(host_key_nibbles(loc))
            child_words.append(int.from_bytes(loc, "big") - table[0].slot)
    children_bodies = children_bodies[:2]
    child_keys = child_keys[:2]
    child_words = child_words[:2]
    assert len(children_bodies) == 2

    vx = ValuesExtractionCircuits(table, value_id)
    envs, pis = [], []
    for body, knibs, wd in zip(children_bodies, child_keys, child_words):
        env, piv = vx.prove_leaf(body, knibs, wd)
        assert vx.verify(env)
        envs.append(env)
        pis.append(piv)

    branch_items = rlp.decode(branch_body)
    slots = [
        next(i for i, it in enumerate(branch_items) if it == keccak256(body))
        for body in children_bodies
    ]
    benv, bpis = vx.prove_branch(branch_body, envs, pis, slots)
    assert vx.verify(benv)
    # the branch PIs carry the summed value digest over both leaves
    from mp2_tpu.field.ecgfp5 import Point

    want_dv = Point.from_fields(pis[0][8:19]) + Point.from_fields(pis[1][8:19])
    assert bpis[8:19] == want_dv.to_fields()


def test_account_leaf_circuit_matches_host():
    """contract_extraction state-trie leaf: keccak binding + storage-root
    extraction + address metadata digest."""
    from mp2_tpu.extraction.mpt_circuits import build_account_leaf_circuit
    from mp2_tpu.utils.u256 import pack_bytes_be
    from mp2_tpu.hash import poseidon2_host as p2h

    state = MPT(secure=True)
    storage_root = keccak256(b"storage-root-x")
    acct = rlp.encode([b"\x01", b"\x00", storage_root, keccak256(b"code")])
    state.insert(ADDR, acct)
    proof = state.get_proof(ADDR)
    leaf_body = proof[-1]

    mc = build_account_leaf_circuit(ADDR)
    inputs = {}
    mc.assign(inputs, leaf_body)
    dm = p2h.map_to_curve_point(pack_bytes_be(ADDR))
    pis = (
        pack_bytes_be(keccak256(leaf_body))
        + pack_bytes_be(storage_root)
        + dm.to_fields()
    )
    w = mc.data.generate_witness(inputs)
    mc.data.check_witness(w, pis)

    # claiming a different storage root must fail
    bad = (
        pack_bytes_be(keccak256(leaf_body))
        + pack_bytes_be(keccak256(b"other-root"))
        + dm.to_fields()
    )
    with pytest.raises(AssertionError):
        mc.data.check_witness(w, bad)


def test_leaf_mapping_circuit_matches_host():
    """Mapping leaf: storage location + trie key recomputed in-circuit from
    the witnessed mapping key; DV/DM match the host mapping conventions."""
    from mp2_tpu.extraction.mpt_circuits import build_leaf_mapping_body

    slot = 2
    key_id = V.identifier_for_mapping_key_column(slot, ADDR, CHAIN_ID)
    value_id = V.identifier_for_value_column(slot, 0, 256, 0, ADDR, CHAIN_ID)
    table = [simple_column(slot, value_id)]
    mkey = b"\x07"
    loc = SK.mapping_location(slot, mkey)
    val = 10**18 + 9
    trie = MPT(secure=True)
    trie.insert(loc, rlp.encode_int(val))
    leaf_body = trie.get_proof(loc)[-1]

    b = CircuitBuilder(test_config())
    assign = build_leaf_mapping_body(b, table, value_id, slot, key_id)
    data = b.build()
    inputs = {}
    assign(inputs, leaf_body, left_pad32(mkey))
    value = left_pad32(rlp.decode(rlp.decode(leaf_body)[1]))
    dv = V.compute_leaf_mapping_values_digest(
        table, [value_id], value, mkey, 0, key_id
    )
    dm = V.compute_leaf_mapping_metadata_digest(table, slot, key_id)
    pis = mpt_pi_values(
        keccak256(leaf_body), dv, dm, 1, host_key_nibbles(loc),
        host_leaf_s(leaf_body),
    )
    w = data.generate_witness(inputs)
    data.check_witness(w, pis)

    # a DIFFERENT witnessed mapping key derives a different trie key and
    # cannot match the leaf's compact path
    inputs = {}
    assign(inputs, leaf_body, left_pad32(b"\x08"))
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, pis)


def test_leaf_mapping_of_mappings_circuit_matches_host():
    """Nested-mapping leaf: location = keccak(pad32(inner) ||
    keccak(pad32(outer) || pad32(slot))) and the trie key recomputed
    in-circuit from BOTH witnessed keys; DV/DM match the host
    mapping-of-mappings conventions."""
    from mp2_tpu.extraction.mpt_circuits import (
        build_leaf_mapping_of_mappings_body,
    )

    slot = 5
    outer_id = V.identifier_for_outer_mapping_key_column(slot, ADDR, CHAIN_ID)
    inner_id = V.identifier_for_inner_mapping_key_column(slot, ADDR, CHAIN_ID)
    value_id = V.identifier_for_value_column(slot, 0, 256, 0, ADDR, CHAIN_ID)
    table = [simple_column(slot, value_id)]
    outer, inner = b"\x07", b"\x2a"
    loc = SK.mapping_of_mappings_location(slot, outer, inner)
    val = 10**18 + 11
    trie = MPT(secure=True)
    trie.insert(loc, rlp.encode_int(val))
    leaf_body = trie.get_proof(loc)[-1]

    b = CircuitBuilder(test_config())
    assign = build_leaf_mapping_of_mappings_body(
        b, table, value_id, slot, outer_id, inner_id
    )
    data = b.build()
    inputs = {}
    assign(inputs, leaf_body, left_pad32(outer), left_pad32(inner))
    value = left_pad32(rlp.decode(rlp.decode(leaf_body)[1]))
    dv = V.compute_leaf_mapping_of_mappings_values_digest(
        table, [value_id], value, outer, inner, 0, outer_id, inner_id
    )
    dm = V.compute_leaf_mapping_of_mappings_metadata_digest(
        table, slot, outer_id, inner_id
    )
    pis = mpt_pi_values(
        keccak256(leaf_body), dv, dm, 1, host_key_nibbles(loc),
        host_leaf_s(leaf_body),
    )
    w = data.generate_witness(inputs)
    data.check_witness(w, pis)

    # swapping the two witnessed keys derives a different location and
    # cannot match the leaf's compact path
    inputs = {}
    assign(inputs, leaf_body, left_pad32(inner), left_pad32(outer))
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, pis)


@slow
def test_values_extraction_set_mapping_of_mappings():
    """The recursive set with the nested-mapping leaf member: two entries
    of one inner mapping proven through prove_trie to the storage root."""
    from mp2_tpu.extraction.mpt_circuits import ValuesExtractionCircuits
    from mp2_tpu.field.ecgfp5 import Point

    slot = 5
    outer_id = V.identifier_for_outer_mapping_key_column(slot, ADDR, CHAIN_ID)
    inner_id = V.identifier_for_inner_mapping_key_column(slot, ADDR, CHAIN_ID)
    value_id = V.identifier_for_value_column(slot, 0, 256, 0, ADDR, CHAIN_ID)
    table = [simple_column(slot, value_id)]
    pairs = [(b"\x07", b"\x2a"), (b"\x07", b"\x2b"), (b"\x08", b"\x01")]
    trie = MPT(secure=True)
    vals = {}
    for i, (o, inn) in enumerate(pairs):
        loc = SK.mapping_of_mappings_location(slot, o, inn)
        vals[(o, inn)] = 10**18 + i
        trie.insert(loc, rlp.encode_int(vals[(o, inn)]))

    vx = ValuesExtractionCircuits(
        table, value_id, mapping_of_mappings=(slot, outer_id, inner_id),
        branch_arities=(1, 2, 3),
    )
    paths = {
        (o, inn): trie.get_proof(SK.mapping_of_mappings_location(slot, o, inn))
        for o, inn in pairs
    }
    env, pis = vx.prove_trie(paths, {p: p for p in pairs})
    assert vx.verify(env)
    assert pis[95] == 0 and pis[30] == 3  # root reached, 3 leaves

    want_dv = Point.neutral()
    for (o, inn), v in vals.items():
        want_dv = want_dv + V.compute_leaf_mapping_of_mappings_values_digest(
            table, [value_id],
            left_pad32(v.to_bytes((v.bit_length() + 7) // 8, "big")),
            o, inn, 0, outer_id, inner_id,
        )
    assert Point.from_fields(pis[8:19]) == want_dv
