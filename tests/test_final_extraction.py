"""Final-extraction family: contract state-trie circuits, the block
framework, and the final circuit binding block + contract + values
(reference mp2-v1/src/{contract_extraction, final_extraction})."""

import os

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.extraction import storage_key as SK
from mp2_tpu.extraction import values as V
from mp2_tpu.extraction.columns import simple_column
from mp2_tpu.extraction.final_circuits import (
    NUM_BLOCK_PIS,
    NUM_CONTRACT_PIS,
    F_BN,
    F_DV,
    F_N,
    build_account_leaf_body,
    build_contract_branch_body,
    contract_pi_values,
    final_base_body,
    final_pi_values,
    host_key_nibbles,
)
from mp2_tpu.extraction.mpt_circuits import (
    MAX_KEY_NIBBLES,
    NUM_MPT_PIS,
    compact_nibbles,
    mpt_pi_values,
)
from mp2_tpu.field.ecgfp5 import Point
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import test_config
from mp2_tpu.utils import rlp
from mp2_tpu.utils.keccak import keccak256
from mp2_tpu.utils.trie import MPT
from mp2_tpu.utils.u256 import left_pad32, pack_bytes_be

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)

ADDR = bytes(range(20))
OTHER = bytes(range(1, 21))
CHAIN_ID = 1
SLOT = 3


def _account(storage_root: bytes) -> bytes:
    return rlp.encode([b"\x01", b"\x00", storage_root, keccak256(b"code")])


def _block_header(state_root: bytes, number: int, parent: bytes) -> bytes:
    return rlp.encode(
        [
            parent,
            keccak256(b"uncles"),
            bytes(20),
            state_root,
            keccak256(b"tx"),
            keccak256(b"rc"),
            b"\x00" * 32,
            b"\x01",
            number.to_bytes(4, "big"),
        ]
    )


@pytest.fixture(scope="module")
def world():
    """Storage trie under ADDR's account inside a 2-account state trie,
    referenced by a block header."""
    from mp2_tpu.extraction.columns import ColumnInfo

    # struct slot spanning 3 EVM words: one full-word column per word
    table = [
        ColumnInfo(
            slot=SLOT,
            identifier=V.identifier_for_value_column(
                SLOT, 0, 256, w, ADDR, CHAIN_ID
            ),
            byte_offset=0, bit_offset=0, length=256, evm_word=w,
        )
        for w in range(3)
    ]
    value_id = table[0].identifier
    storage = MPT(secure=True)
    entries = {}
    for w in range(3):
        loc = SK.simple_slot_location(SLOT, evm_word=w)
        val = 10**18 + w + 1
        storage.insert(loc, rlp.encode_int(val))
        entries[loc] = val

    state = MPT(secure=True)
    state.insert(ADDR, _account(storage.root_hash()))
    state.insert(OTHER, _account(keccak256(b"other-storage")))

    header = _block_header(state.root_hash(), 777, keccak256(b"parent"))
    return dict(
        table=table, value_id=value_id, storage=storage, entries=entries,
        state=state, header=header,
    )


def test_account_leaf_body_with_key_chain(world):
    state = world["state"]
    proof = state.get_proof(ADDR)
    leaf = proof[-1]
    items = rlp.decode(leaf)
    storage_root = rlp.decode(rlp.decode(leaf)[1])[2]

    b = CircuitBuilder(test_config())
    assign = build_account_leaf_body(b, ADDR)
    data = b.build()
    inputs = {}
    assign(inputs, leaf)
    key = host_key_nibbles(ADDR)
    s = MAX_KEY_NIBBLES - len(compact_nibbles(items[0]))
    dm = p2h.map_to_curve_point(pack_bytes_be(ADDR))
    pis = contract_pi_values(keccak256(leaf), storage_root, dm, key, s)
    assert len(pis) == NUM_CONTRACT_PIS
    w = data.generate_witness(inputs)
    data.check_witness(w, pis)

    # ANOTHER account's leaf cannot satisfy the baked key constants
    other_leaf = state.get_proof(OTHER)[-1]
    inputs = {}
    assign(inputs, other_leaf)
    o_items = rlp.decode(other_leaf)
    o_sr = rlp.decode(o_items[1])[2]
    o_s = MAX_KEY_NIBBLES - len(compact_nibbles(o_items[0]))
    bad = contract_pi_values(keccak256(other_leaf), o_sr, dm, key, o_s)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, bad)


def test_contract_branch_body(world):
    state = world["state"]
    proof = state.get_proof(ADDR)
    assert len(proof) >= 2, "fixture needs a branch above the account leaf"
    branch, leaf = proof[0], proof[-1]
    items = rlp.decode(leaf)
    storage_root = rlp.decode(items[1])[2]
    key = host_key_nibbles(ADDR)
    s_leaf = MAX_KEY_NIBBLES - len(compact_nibbles(items[0]))
    dm = p2h.map_to_curve_point(pack_bytes_be(ADDR))
    child_pis = contract_pi_values(keccak256(leaf), storage_root, dm, key, s_leaf)

    b = CircuitBuilder(test_config())
    stub = b.add_inputs(NUM_CONTRACT_PIS)
    assign = build_contract_branch_body(b, stub, max_len=272)
    data = b.build()
    inputs = {}
    assign(inputs, branch)
    for t, v in zip(stub, child_pis):
        inputs[t] = int(v)
    want = contract_pi_values(
        keccak256(branch), storage_root, dm, key, s_leaf - 1
    )
    w = data.generate_witness(inputs)
    data.check_witness(w, want)

    # a child claiming a different consumed nibble cannot match the node
    bad_key = list(key)
    bad_key[s_leaf - 1] = (bad_key[s_leaf - 1] + 1) % 16
    bad_child = contract_pi_values(
        keccak256(leaf), storage_root, dm, bad_key, s_leaf
    )
    inputs = {}
    assign(inputs, branch)
    for t, v in zip(stub, bad_child):
        inputs[t] = int(v)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(
            w,
            contract_pi_values(
                keccak256(branch), storage_root, dm, bad_key, s_leaf - 1
            ),
        )


def _stub_final_pis(world):
    """Consistent (block, contract, values) PI value triples."""
    storage = world["storage"]
    state = world["state"]
    header = world["header"]
    from mp2_tpu.extraction.api import extract_block

    out = extract_block(header)
    block_pis = (
        pack_bytes_be(out.block_hash)
        + pack_bytes_be(out.parent_hash)
        + pack_bytes_be(out.state_root)
        + [out.block_number]
    )
    dm_c = p2h.map_to_curve_point(pack_bytes_be(ADDR))
    key = host_key_nibbles(ADDR)
    contract_pis = contract_pi_values(
        state.root_hash(), storage.root_hash(), dm_c, key, 0
    )
    dv = p2h.map_to_curve_point([42])
    dm_v = p2h.map_to_curve_point([123])
    vkey = [7] * MAX_KEY_NIBBLES
    values_pis = mpt_pi_values(storage.root_hash(), dv, dm_v, 3, vkey, 0)
    return block_pis, contract_pis, values_pis, dm_c


def test_final_base_body(world):
    block_pis, contract_pis, values_pis, dm_c = _stub_final_pis(world)

    b = CircuitBuilder(test_config())
    sb = b.add_inputs(NUM_BLOCK_PIS)
    sc = b.add_inputs(NUM_CONTRACT_PIS)
    sv = b.add_inputs(NUM_MPT_PIS)
    final_base_body(b, sb, sc, sv)
    data = b.build()

    def fill(inputs, bp, cp, vp):
        for t, v in zip(sb, bp):
            inputs[t] = int(v)
        for t, v in zip(sc, cp):
            inputs[t] = int(v)
        for t, v in zip(sv, vp):
            inputs[t] = int(v)

    inputs = {}
    fill(inputs, block_pis, contract_pis, values_pis)
    want = final_pi_values(block_pis, values_pis, dm_c)
    assert want[F_BN] == 777 and want[F_N] == 3
    w = data.generate_witness(inputs)
    data.check_witness(w, want)

    # values root != account storage root must fail
    bad_values = list(values_pis)
    bad_values[0] ^= 1
    inputs = {}
    fill(inputs, block_pis, contract_pis, bad_values)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, final_pi_values(block_pis, bad_values, dm_c))

    # an UNFINISHED values walk (S != 0) must fail
    bad_values = list(values_pis)
    bad_values[95] = 2
    inputs = {}
    fill(inputs, block_pis, contract_pis, bad_values)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, final_pi_values(block_pis, bad_values, dm_c))


@slow
def test_final_extraction_recursive_chain(world):
    """block + contract-set + values-set proofs verified INSIDE one final
    proof; every claimed root re-derived in-circuit from raw node bytes."""
    from mp2_tpu.extraction.circuits import fixture_header_offsets
    from mp2_tpu.extraction.final_circuits import (
        BlockExtractionFramework,
        ContractExtractionCircuits,
        FinalExtractionCircuits,
    )
    from mp2_tpu.extraction.mpt_circuits import (
        ValuesExtractionCircuits,
        host_key_nibbles as knibs,
    )

    storage = world["storage"]
    state = world["state"]
    header = world["header"]
    table, value_id = world["table"], world["value_id"]
    entries = world["entries"]

    # values chain: two leaves under the storage-trie root branch
    locs = list(entries)
    proofs = {loc: storage.get_proof(loc) for loc in locs}
    root_node = proofs[locs[0]][0]
    bodies, keys, words = [], [], []
    for loc in locs:
        pr = proofs[loc]
        if len(pr) == 2 and pr[0] == root_node:
            bodies.append(pr[1])
            keys.append(knibs(loc))
            words.append(int.from_bytes(loc, "big") - SLOT)
    assert len(bodies) >= 2, "fixture must share the root branch"
    bodies, keys, words = bodies[:2], keys[:2], words[:2]

    vx = ValuesExtractionCircuits(table, value_id)
    envs, pis = [], []
    for body, kn, wd in zip(bodies, keys, words):
        env, piv = vx.prove_leaf(body, kn, wd)
        envs.append(env)
        pis.append(piv)
    branch_items = rlp.decode(root_node)
    slots = [
        next(i for i, it in enumerate(branch_items) if it == keccak256(body))
        for body in bodies
    ]
    values_env, values_pis = vx.prove_branch(root_node, envs, pis, slots)
    assert values_pis[95] == 0  # reached the storage root

    cx = ContractExtractionCircuits(ADDR)
    contract_env, contract_pis = cx.prove_state_path(state.get_proof(ADDR))
    assert cx.verify(contract_env)

    bx = BlockExtractionFramework(**fixture_header_offsets(header))
    block_env, block_pis = bx.prove_header(header)
    assert bx.verify(block_env)

    fx = FinalExtractionCircuits(bx, cx, vx)
    final_env, final_pis = fx.prove(block_env, contract_env, values_env)
    assert fx.verify(final_env)

    # the final proof's digests and counters
    want_dv = Point.from_fields(pis[0][8:19]) + Point.from_fields(pis[1][8:19])
    assert list(final_env.user_inputs[F_DV]) == want_dv.to_fields()
    assert final_env.user_inputs[F_BN] == 777
    assert final_env.user_inputs[F_N] == 2


@slow
def test_block_leaf_bound_end_to_end():
    """THE extraction<->DB binding: a block-tree leaf that verifies the
    final-extraction proof AND the rows-tree proof in-circuit and enforces
    extraction DV == rows digest + extracted block number == leaf index
    (block_tree/mod.rs:37-60).  Mapping-table values circuits make the two
    digests genuinely equal."""
    from mp2_tpu.extraction.circuits import fixture_header_offsets
    from mp2_tpu.extraction.final_circuits import (
        BlockExtractionFramework,
        ContractExtractionCircuits,
        FinalExtractionCircuits,
    )
    from mp2_tpu.extraction.mpt_circuits import ValuesExtractionCircuits
    from mp2_tpu.vdb import circuits as C
    from mp2_tpu.vdb.trees import (
        BlockPayload,
        Cell,
        RowPayload,
        build_cells_tree,
        new_block_tree,
        new_row_tree,
    )

    slot = 2
    key_id = V.identifier_for_mapping_key_column(slot, ADDR, CHAIN_ID)
    value_id = V.identifier_for_value_column(slot, 0, 256, 0, ADDR, CHAIN_ID)
    table = [simple_column(slot, value_id)]

    storage = MPT(secure=True)
    mkeys = [b"\x07", b"\x0b", b"\x0d"]
    vals = {k: 10**18 + i for i, k in enumerate(mkeys)}
    for k in mkeys:
        storage.insert(SK.mapping_location(slot, k), rlp.encode_int(vals[k]))
    proofs = {k: storage.get_proof(SK.mapping_location(slot, k)) for k in mkeys}
    root_node = proofs[mkeys[0]][0]
    picked = [
        k for k in mkeys
        if len(proofs[k]) == 2 and proofs[k][0] == root_node
    ][:2]
    assert len(picked) == 2, "fixture must share the root branch"

    vx = ValuesExtractionCircuits(
        table, value_id, mapping=(slot, key_id)
    )
    envs, pis = [], []
    for k in picked:
        env, piv = vx.prove_leaf_mapping(proofs[k][-1], k)
        envs.append(env)
        pis.append(piv)
    branch_items = rlp.decode(root_node)
    slots = [
        next(
            i for i, it in enumerate(branch_items)
            if it == keccak256(proofs[k][-1])
        )
        for k in picked
    ]
    values_env, values_pis = vx.prove_branch(root_node, envs, pis, slots)
    assert values_pis[95] == 0

    state = MPT(secure=True)
    state.insert(ADDR, _account(storage.root_hash()))
    state.insert(OTHER, _account(keccak256(b"other-storage")))
    header = _block_header(state.root_hash(), 777, keccak256(b"parent"))

    cx = ContractExtractionCircuits(ADDR)
    contract_env, _ = cx.prove_state_path(state.get_proof(ADDR))
    bx = BlockExtractionFramework(**fixture_header_offsets(header))
    block_env, _ = bx.prove_header(header)
    fx = FinalExtractionCircuits(bx, cx, vx)
    final_env, final_pis = fx.prove(block_env, contract_env, values_env)
    assert fx.verify(final_env)

    # --- verifiable DB over the same two rows
    cfg = test_config()
    vdb = C.VerifiableDbCircuits(cfg, extraction=fx)
    rows_db = new_row_tree()

    def tx(t):
        for k in picked:
            cells = build_cells_tree([Cell(value_id, vals[k], False)])
            t.store(
                (int.from_bytes(k, "big"), 0),
                RowPayload(
                    secondary=Cell(key_id, int.from_bytes(k, "big"), False),
                    row_unique_data=V.row_unique_data_for_mapping_leaf(k),
                    cells=cells,
                ),
            )

    rows_db.in_transaction(tx)

    root_pl = rows_db.payload(rows_db.root())
    from mp2_tpu.vdb import digests as D

    rows_digest = D.compute_final_digest(
        False, root_pl.individual_vd, root_pl.multiplier_vd,
        root_pl.multiplier_cnt,
    )
    want_dv = Point.from_fields(final_pis[F_DV])
    assert rows_digest == want_dv, "host digest invariant must hold"

    # prove the rows tree with real proofs (cells chain per row)
    def prove_rows(key):
        l, r = rows_db.tree.children(key)
        payload = rows_db.payload(key)
        children = [prove_rows(c) for c in (l, r) if c is not None]
        cells_env = vdb.prove_cells_tree(payload.cells)
        rpis = C.rows_pi_values(payload)
        if not children:
            return vdb.rows.prove_aggregation(
                "rows_leaf", [], (payload.secondary, payload.row_unique_data),
                rpis, foreign_children=[cells_env],
            )
        if l is not None and r is not None:
            return vdb.rows.prove_aggregation(
                "rows_full", children,
                (payload.secondary, payload.row_unique_data), rpis,
                foreign_children=[cells_env],
            )
        return vdb.rows.prove_aggregation(
            "rows_partial", children,
            (payload.secondary, payload.row_unique_data, l is not None),
            rpis, foreign_children=[cells_env],
        )

    rows_env = prove_rows(rows_db.root())
    assert vdb.rows.verify(rows_env)

    block_db = new_block_tree()
    index_id = V.identifier_block_column()
    block_db.in_transaction(
        lambda t: t.store(
            777,
            BlockPayload(
                index_id=index_id, block_number=777,
                rows_hash=root_pl.hash, rows_digest=rows_digest,
            ),
        )
    )
    blk = block_db.payload(777)
    env = vdb.block.prove_aggregation(
        "block_leaf_bound", [], (index_id, 777, False),
        C.block_pi_values(blk),
        foreign_children=[rows_env, final_env],
    )
    assert vdb.block.verify(env)

    # a mismatched block number must be rejected in-circuit
    blk_bad = BlockPayload(
        index_id=index_id, block_number=778,
        rows_hash=root_pl.hash, rows_digest=rows_digest,
    )
    with pytest.raises((ValueError, AssertionError)):
        vdb.block.prove_aggregation(
            "block_leaf_bound", [], (index_id, 778, False),
            C.block_pi_values(blk_bad),
            foreign_children=[rows_env, final_env],
        )

    # --- second block appended as a PARENT (sbbst): block_parent_bound
    # verifies the new block's extraction proof alongside its children
    k0 = picked[0]
    vals2 = dict(vals)
    vals2[k0] = vals[k0] + 5
    storage2 = MPT(secure=True)
    for k in mkeys:
        storage2.insert(SK.mapping_location(slot, k), rlp.encode_int(vals2[k]))
    proofs2 = {
        k: storage2.get_proof(SK.mapping_location(slot, k)) for k in picked
    }
    root2 = proofs2[picked[0]][0]
    assert all(len(proofs2[k]) == 2 and proofs2[k][0] == root2
               for k in picked), "fixture shape changed"
    envs2, pis2 = [], []
    for k in picked:
        env2, piv2 = vx.prove_leaf_mapping(proofs2[k][-1], k)
        envs2.append(env2)
        pis2.append(piv2)
    b_items2 = rlp.decode(root2)
    slots2 = [
        next(
            i for i, it in enumerate(b_items2)
            if it == keccak256(proofs2[k][-1])
        )
        for k in picked
    ]
    values_env2, _ = vx.prove_branch(root2, envs2, pis2, slots2)
    state2 = MPT(secure=True)
    state2.insert(ADDR, _account(storage2.root_hash()))
    state2.insert(OTHER, _account(keccak256(b"other-storage")))
    header2 = _block_header(state2.root_hash(), 778, keccak256(header))
    contract_env2, _ = cx.prove_state_path(state2.get_proof(ADDR))
    block_env2, _ = bx.prove_header(header2)
    final_env2, final_pis2 = fx.prove(block_env2, contract_env2, values_env2)

    def tx2(t):
        for k in picked:
            cells = build_cells_tree([Cell(value_id, vals2[k], False)])
            t.store(
                (int.from_bytes(k, "big"), 0),
                RowPayload(
                    secondary=Cell(key_id, int.from_bytes(k, "big"), False),
                    row_unique_data=V.row_unique_data_for_mapping_leaf(k),
                    cells=cells,
                ),
            )

    rows_db.in_transaction(tx2)
    root_pl2 = rows_db.payload(rows_db.root())
    rows_digest2 = D.compute_final_digest(
        False, root_pl2.individual_vd, root_pl2.multiplier_vd,
        root_pl2.multiplier_cnt,
    )
    assert rows_digest2 == Point.from_fields(final_pis2[F_DV])
    rows_env2 = prove_rows(rows_db.root())

    block_db.in_transaction(
        lambda t: t.store(
            778,
            BlockPayload(
                index_id=index_id, block_number=778,
                rows_hash=root_pl2.hash, rows_digest=rows_digest2,
            ),
        )
    )
    assert block_db.root() == 778  # appended as the parent of 777
    blk2 = block_db.payload(778)
    # single (left) child: the right slot carries a duplicate env, gated
    # off by has_right=False in-circuit
    env2 = vdb.block.prove_aggregation(
        "block_parent_bound", [env, env], (index_id, 778, False),
        C.block_pi_values(blk2),
        foreign_children=[rows_env2, final_env2],
    )
    assert vdb.block.verify(env2)


def test_length_leaf_body():
    """Length-slot leaf: constant trie key, u32 value extraction, DM over
    the slots only (stable across blocks)."""
    from mp2_tpu.extraction.final_circuits import (
        NUM_LENGTH_PIS,
        build_length_leaf_body,
        length_pi_values,
    )
    from mp2_tpu.extraction.mpt_circuits import host_leaf_s

    length_slot, variable_slot = 8, SLOT
    trie = MPT(secure=True)
    loc = SK.simple_slot_location(length_slot)
    trie.insert(loc, rlp.encode_int(3))
    # extra entries so the leaf path is shorter than the full key
    trie.insert(SK.simple_slot_location(9), rlp.encode_int(10**18))
    trie.insert(SK.simple_slot_location(10), rlp.encode_int(10**18 + 1))
    proof = trie.get_proof(loc)
    leaf = proof[-1]

    b = CircuitBuilder(test_config())
    assign = build_length_leaf_body(b, length_slot, variable_slot)
    data = b.build()
    inputs = {}
    assign(inputs, leaf)
    pis = length_pi_values(
        keccak256(leaf), length_slot, variable_slot, host_key_nibbles(loc),
        host_leaf_s(leaf), 3,
    )
    assert len(pis) == NUM_LENGTH_PIS
    w = data.generate_witness(inputs)
    data.check_witness(w, pis)

    # claiming a different length must fail
    bad = length_pi_values(
        keccak256(leaf), length_slot, variable_slot, host_key_nibbles(loc),
        host_leaf_s(leaf), 4,
    )
    with pytest.raises(AssertionError):
        data.check_witness(w, bad)


def test_final_base_body_lengthed(world):
    """Lengthed variant: length proof bound to the same storage trie and
    its value pinned to the extracted row count."""
    from mp2_tpu.extraction.final_circuits import (
        NUM_LENGTH_PIS,
        length_pi_values,
    )

    block_pis, contract_pis, values_pis, dm_c = _stub_final_pis(world)
    length_slot, variable_slot = 8, SLOT
    lkey = host_key_nibbles(SK.simple_slot_location(length_slot))
    # values stub exposes N = 3 and H = storage root
    length_pis = length_pi_values(
        world["storage"].root_hash(), length_slot, variable_slot, lkey, 0, 3
    )
    dm_l = p2h.map_to_curve_point([length_slot, variable_slot])

    b = CircuitBuilder(test_config())
    sb = b.add_inputs(NUM_BLOCK_PIS)
    sc = b.add_inputs(NUM_CONTRACT_PIS)
    sv = b.add_inputs(NUM_MPT_PIS)
    sl = b.add_inputs(NUM_LENGTH_PIS)
    final_base_body(b, sb, sc, sv, sl)
    data = b.build()

    def fill(inputs, lp):
        for t, v in zip(sb, block_pis):
            inputs[t] = int(v)
        for t, v in zip(sc, contract_pis):
            inputs[t] = int(v)
        for t, v in zip(sv, values_pis):
            inputs[t] = int(v)
        for t, v in zip(sl, lp):
            inputs[t] = int(v)

    inputs = {}
    fill(inputs, length_pis)
    want = final_pi_values(block_pis, values_pis, dm_c, length_dm=dm_l)
    w = data.generate_witness(inputs)
    data.check_witness(w, want)

    # length value != extracted row count must fail
    bad_length = length_pi_values(
        world["storage"].root_hash(), length_slot, variable_slot, lkey, 0, 4
    )
    inputs = {}
    fill(inputs, bad_length)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, want)


def test_final_merge_body(world):
    """Merge variant: two values proofs combined with the split-digest
    scheme, DV = HashToInt(H(fields(dv_mult))) * dv_ind."""
    from mp2_tpu.extraction.final_circuits import (
        build_merge_body,
        final_merge_pi_values,
    )

    block_pis, contract_pis, values_a, dm_c = _stub_final_pis(world)
    values_b = list(values_a)
    dv_b = p2h.map_to_curve_point([777])
    values_b[8:19] = dv_b.to_fields()
    values_b[30] = 5  # N

    b = CircuitBuilder(test_config())
    sb = b.add_inputs(NUM_BLOCK_PIS)
    sc = b.add_inputs(NUM_CONTRACT_PIS)
    sa = b.add_inputs(NUM_MPT_PIS)
    sv = b.add_inputs(NUM_MPT_PIS)
    assign = build_merge_body(b, sb, sc, sa, sv)
    data = b.build()

    def fill(inputs):
        for t, v in zip(sb, block_pis):
            inputs[t] = int(v)
        for t, v in zip(sc, contract_pis):
            inputs[t] = int(v)
        for t, v in zip(sa, values_a):
            inputs[t] = int(v)
        for t, v in zip(sv, values_b):
            inputs[t] = int(v)

    for a_mult in (False, True):
        inputs = {}
        fill(inputs)
        assign(inputs, a_mult)
        want = final_merge_pi_values(
            block_pis, values_a, values_b, dm_c, a_mult
        )
        assert want[-1] == 1  # merge flag exposed
        w = data.generate_witness(inputs)
        data.check_witness(w, want)

    # the two flag settings produce DIFFERENT digests (split matters)
    dv0 = final_merge_pi_values(block_pis, values_a, values_b, dm_c, False)
    dv1 = final_merge_pi_values(block_pis, values_a, values_b, dm_c, True)
    assert dv0[17:28] != dv1[17:28]


@slow
def test_final_lengthed_recursive_chain(world):
    """final_lengthed: the length-slot proof chain verified alongside
    block+contract+values, N pinned to the length value in-circuit."""
    from mp2_tpu.extraction.circuits import fixture_header_offsets
    from mp2_tpu.extraction.final_circuits import (
        BlockExtractionFramework,
        ContractExtractionCircuits,
        FinalExtractionCircuits,
        LengthExtractionCircuits,
    )
    from mp2_tpu.extraction.mpt_circuits import (
        ValuesExtractionCircuits,
        host_key_nibbles as knibs,
    )

    table, value_id = world["table"], world["value_id"]
    length_slot = 8

    # fresh storage trie: 2 value leaves under the root + the length slot
    # holding the row count (= 2)
    storage = MPT(secure=True)
    locs = [SK.simple_slot_location(SLOT, evm_word=w) for w in range(3)]
    for i, loc in enumerate(locs):
        storage.insert(loc, rlp.encode_int(10**18 + i))
    storage.insert(SK.simple_slot_location(length_slot), rlp.encode_int(2))
    proofs = {loc: storage.get_proof(loc) for loc in locs}
    root_node = storage.get_proof(locs[0])[0]
    picked = [
        loc for loc in locs
        if len(proofs[loc]) == 2 and proofs[loc][0] == root_node
    ][:2]
    assert len(picked) == 2, "fixture must share the root branch"

    vx = ValuesExtractionCircuits(table, value_id)
    envs, pis = [], []
    for loc in picked:
        wd = int.from_bytes(loc, "big") - SLOT
        env, piv = vx.prove_leaf(proofs[loc][-1], knibs(loc), wd)
        envs.append(env)
        pis.append(piv)
    branch_items = rlp.decode(root_node)
    slots = [
        next(
            i for i, it in enumerate(branch_items)
            if it == keccak256(proofs[loc][-1])
        )
        for loc in picked
    ]
    values_env, values_pis = vx.prove_branch(root_node, envs, pis, slots)
    assert values_pis[95] == 0 and values_pis[30] == 2

    lx = LengthExtractionCircuits(length_slot, SLOT)
    length_env, length_pis = lx.prove_length_path(
        storage.get_proof(SK.simple_slot_location(length_slot))
    )
    assert lx.verify(length_env)

    state = MPT(secure=True)
    state.insert(ADDR, _account(storage.root_hash()))
    state.insert(OTHER, _account(keccak256(b"other")))
    header = _block_header(state.root_hash(), 900, keccak256(b"p"))

    cx = ContractExtractionCircuits(ADDR)
    contract_env, _ = cx.prove_state_path(state.get_proof(ADDR))
    bx = BlockExtractionFramework(**fixture_header_offsets(header))
    block_env, _ = bx.prove_header(header)
    fx = FinalExtractionCircuits(bx, cx, vx, length=lx)
    env, final_pis = fx.prove_lengthed(
        block_env, contract_env, values_env, length_env
    )
    assert fx.verify(env)
    assert final_pis[F_N] == 2 and final_pis[F_BN] == 900


def test_final_no_provable_body():
    """Dummy (off-chain data) variant: witnessed digests, DM re-encoded as
    D(DUMMY_EXTRACTION || DM) in-circuit so it can never collide with a
    provable extraction digest (dummy_circuit.rs:80-135)."""
    from mp2_tpu.extraction.final_circuits import (
        build_no_provable_body,
        no_provable_metadata_digest,
    )

    bh = pack_bytes_be(keccak256(b"offchain-commitment"))
    ph = pack_bytes_be(keccak256(b"offchain-prev"))
    dv = p2h.map_to_curve_point([5, 6, 7])
    dm = p2h.map_to_curve_point([8, 9])

    b = CircuitBuilder(test_config())
    assign = build_no_provable_body(b)
    data = b.build()
    inputs = {}
    assign(inputs, bh, ph, 555, dv, dm, 4)
    want = (
        list(bh) + list(ph) + [555]
        + dv.to_fields()
        + no_provable_metadata_digest(dm).to_fields()
        + [4]
    )
    w = data.generate_witness(inputs)
    data.check_witness(w, want)

    # exposing the RAW metadata digest (no prefix) must fail: a dummy proof
    # cannot claim a provable table's DM
    bad = (
        list(bh) + list(ph) + [555]
        + dv.to_fields() + dm.to_fields() + [4]
    )
    with pytest.raises(AssertionError):
        data.check_witness(w, bad)
