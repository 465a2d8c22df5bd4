"""Merkle-path gadget: recompute rows-tree / block-tree roots in-circuit
from a node + witnessed ancestors (query/merkle_path.rs role)."""

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.prover.config import test_config
from mp2_tpu.vdb.query.merkle_path import (
    add_merkle_path,
    host_path_from_tree,
    set_merkle_path,
)
from mp2_tpu.vdb.trees import Cell, RowPayload, build_cells_tree, new_row_tree


def _rows_db(n_rows: int):
    db = new_row_tree()

    def tx(t):
        for i in range(n_rows):
            cells = build_cells_tree([Cell(7, 100 + i, False)])
            t.store(
                (10 * (i + 1), 0),
                RowPayload(
                    secondary=Cell(5, 10 * (i + 1), False),
                    row_unique_data=(i, i, i, i),
                    cells=cells,
                ),
            )

    db.in_transaction(tx)
    return db


def test_merkle_path_reaches_rows_root():
    db = _rows_db(5)
    root_key = db.root()
    root_hash = db.payload(root_key).hash
    # pick a deep leaf (any non-root key)
    key = next(k for k in db.payloads if k != root_key)
    path = host_path_from_tree(db, key)
    assert path, "need a non-trivial path"

    b = CircuitBuilder(test_config())
    start = b.add_inputs(4)
    mt = add_merkle_path(b, start, max_depth=6)
    b.register_public_inputs(mt.root)
    data = b.build()

    inputs = {}
    for t, v in zip(start, db.payload(key).hash):
        inputs[t] = int(v)
    set_merkle_path(inputs, mt, path)
    w = data.generate_witness(inputs)
    data.check_witness(w, list(root_hash))


def test_merkle_path_rejects_wrong_root():
    db = _rows_db(4)
    root_key = db.root()
    key = next(k for k in db.payloads if k != root_key)
    path = host_path_from_tree(db, key)

    b = CircuitBuilder(test_config())
    start = b.add_inputs(4)
    mt = add_merkle_path(b, start, max_depth=6)
    b.register_public_inputs(mt.root)
    data = b.build()

    inputs = {}
    for t, v in zip(start, db.payload(key).hash):
        inputs[t] = int(v)
    set_merkle_path(inputs, mt, path)
    w = data.generate_witness(inputs)
    bad = [int(db.payload(root_key).hash[0]) + 1] + [
        int(x) for x in db.payload(root_key).hash[1:]
    ]
    import pytest

    with pytest.raises(AssertionError):
        data.check_witness(w, bad)


# ---------------------------------------------------------------- neighbors

from mp2_tpu.circuit.gadgets.u256 import add_virtual_u256, set_u256, u256_constant
from mp2_tpu.utils.u256 import U256_MAX, u256_to_fields
from mp2_tpu.vdb.query.merkle_path import (
    add_merkle_path_with_neighbors,
    are_consecutive_nodes,
    host_neighbor_path_from_tree,
    node_info_fields,
    set_merkle_path_with_neighbors,
)


def _neighbor_circuit(max_depth=6):
    b = CircuitBuilder(test_config())
    ident = b.add_input()
    end_value = add_virtual_u256(b, range_check=False)
    end_inner = b.add_inputs(4)
    mt = add_merkle_path_with_neighbors(b, ident, end_value, end_inner, max_depth)
    b.register_public_inputs(mt.root + mt.node.to_targets())
    return b.build(), ident, end_value, end_inner, mt


def _set_end(inputs, db, key, ident, end_value, end_inner):
    pl = db.payload(key)
    inputs[ident] = pl.secondary.identifier
    set_u256(inputs, end_value, pl.secondary.value)
    for t, v in zip(end_inner, pl.cells.root_hash):
        inputs[t] = int(v)


def test_neighbor_path_matches_host_all_nodes():
    db = _rows_db(6)
    data, ident, end_value, end_inner, mt = _neighbor_circuit()
    for key in db.payloads:
        w = host_neighbor_path_from_tree(db, key)
        inputs = {}
        _set_end(inputs, db, key, ident, end_value, end_inner)
        set_merkle_path_with_neighbors(inputs, mt, w)
        wit = data.generate_witness(inputs)
        data.check_witness(wit, [int(v) for v in w["root"]] + node_info_fields(w))


def test_neighbor_path_rejects_tampered_sibling():
    import pytest

    db = _rows_db(5)
    data, ident, end_value, end_inner, mt = _neighbor_circuit()
    key = next(k for k in db.payloads if k != db.root())
    w = host_neighbor_path_from_tree(db, key)
    w["levels"][0]["sibling"] = [x + 1 for x in w["levels"][0]["sibling"]]
    inputs = {}
    _set_end(inputs, db, key, ident, end_value, end_inner)
    set_merkle_path_with_neighbors(inputs, mt, w)
    wit = data.generate_witness(inputs)
    with pytest.raises(AssertionError):
        data.check_witness(wit, [int(v) for v in w["root"]] + node_info_fields(w))


def _consecutive_circuit(lo, hi, rows_tree=True, max_depth=6):
    b = CircuitBuilder(test_config())
    ident = b.add_input()
    ev1 = add_virtual_u256(b, range_check=False)
    in1 = b.add_inputs(4)
    mt1 = add_merkle_path_with_neighbors(b, ident, ev1, in1, max_depth)
    ev2 = add_virtual_u256(b, range_check=False)
    in2 = b.add_inputs(4)
    mt2 = add_merkle_path_with_neighbors(b, ident, ev2, in2, max_depth)
    for a, c in zip(mt1.root, mt2.root):
        b.connect(a, c)
    ok, _ = are_consecutive_nodes(
        b, mt1.node, mt2.node, u256_constant(b, lo), u256_constant(b, hi), rows_tree
    )
    b.register_public_inputs([ok])
    return b.build(), (ident, ev1, in1, mt1), (ev2, in2, mt2)


def test_consecutive_nodes_in_rows_tree():
    db = _rows_db(6)
    keys = sorted(db.payloads, key=lambda k: db.payload(k).secondary.value)
    data, (ident, ev1, in1, mt1), (ev2, in2, mt2) = _consecutive_circuit(0, 10**9)

    def run(k1, k2):
        inputs = {}
        _set_end(inputs, db, k1, ident, ev1, in1)
        set_merkle_path_with_neighbors(
            inputs, mt1, host_neighbor_path_from_tree(db, k1)
        )
        pl2 = db.payload(k2)
        set_u256(inputs, ev2, pl2.secondary.value)
        for t, v in zip(in2, pl2.cells.root_hash):
            inputs[t] = int(v)
        set_merkle_path_with_neighbors(
            inputs, mt2, host_neighbor_path_from_tree(db, k2)
        )
        wit = data.generate_witness(inputs)
        data.check_witness(wit, [1])

    # every adjacent pair in value order is consecutive
    for k1, k2 in zip(keys, keys[1:]):
        run(k1, k2)
    # a skipped pair is NOT consecutive
    import pytest

    with pytest.raises(AssertionError):
        run(keys[0], keys[2])
