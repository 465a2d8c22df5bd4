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
