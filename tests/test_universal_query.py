"""Witness-driven universal query circuit: ONE circuit/VK for every query
(reference: universal_query_circuit.rs) + the chunk/revelation stack."""

import os

import pytest

from mp2_tpu.parsil.assembler import parse_and_assemble
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.prover.config import test_config
from mp2_tpu.vdb.query.ops import (
    Placeholders,
    QueryBounds,
    aggregate_rows,
    eval_predicate,
    eval_result_row,
)
from mp2_tpu.vdb.query.universal import (
    UniversalQueryParams,
    build_universal_query_circuit,
)

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)

TABLE = ZkTable(
    "t",
    [
        ZkColumn("block", 1, "primary_index"),
        ZkColumn("key", 2, "secondary_index"),
        ZkColumn("value", 3),
    ],
)

SQLS = [
    "SELECT value, value + key FROM t WHERE block >= $MIN_BLOCK AND "
    "block <= $MAX_BLOCK AND (key = $1 OR value <= 25)",
    "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND "
    "block <= $MAX_BLOCK",
    "SELECT value * 2 FROM t WHERE block >= $MIN_BLOCK AND "
    "block <= $MAX_BLOCK AND value % 2 = 0",
]

COLUMN_IDS = [1, 2, 3]
BOUNDS = QueryBounds(90, 110)
PH = {"$1": 7, "$MIN_BLOCK": 90, "$MAX_BLOCK": 110}


@pytest.fixture(scope="module")
def circuit():
    return build_universal_query_circuit(UniversalQueryParams())


@pytest.mark.parametrize("sql", SQLS)
@pytest.mark.parametrize("row", [[100, 7, 10], [100, 8, 99]])
def test_one_circuit_serves_every_query(circuit, sql, row):
    """The SAME compiled circuit satisfies all queries; the computational
    hash PI distinguishes them."""
    uc = circuit
    pis = parse_and_assemble(sql, TABLE)
    ph = Placeholders(dict(PH))
    inputs = {}
    uc.assign(inputs, pis, COLUMN_IDS, row, ph, BOUNDS)
    expected = uc.expected_public_inputs(pis, COLUMN_IDS, row, ph, BOUNDS)
    w = uc.data.generate_witness(inputs)
    uc.data.check_witness(w, expected)
    # cross-check the exposed predicate/output against host evaluation
    pred, _ = eval_predicate(pis.predicate_ops, row, ph)
    assert expected[12] == (1 if pred else 0)


def test_computational_hash_distinguishes_queries(circuit):
    uc = circuit
    hashes = set()
    for sql in SQLS:
        pis = parse_and_assemble(sql, TABLE)
        ph = Placeholders(dict(PH))
        e = uc.expected_public_inputs(pis, COLUMN_IDS, [100, 7, 10], ph, BOUNDS)
        hashes.add(tuple(e[0:4]))
    assert len(hashes) == len(SQLS)


def test_forged_query_structure_rejected(circuit):
    """Witnessing query A but claiming query B's computational hash must
    fail the constraint system."""
    uc = circuit
    p1 = parse_and_assemble(SQLS[0], TABLE)
    p2 = parse_and_assemble(SQLS[2], TABLE)
    ph = Placeholders(dict(PH))
    row = [100, 7, 10]
    inputs = {}
    uc.assign(inputs, p1, COLUMN_IDS, row, ph, BOUNDS)
    claimed = uc.expected_public_inputs(p2, COLUMN_IDS, row, ph, BOUNDS)
    with pytest.raises(AssertionError):
        w = uc.data.generate_witness(inputs)
        uc.data.check_witness(w, claimed)


@slow
def test_query_stack_end_to_end():
    """rows -> chunks -> revelation with real recursive proofs; the final
    results match the host aggregation."""
    from mp2_tpu.vdb.query.chunks import QueryCircuits

    qc = QueryCircuits(test_config())
    sql = SQLS[1]  # SUM + COUNT
    pis = parse_and_assemble(sql, TABLE)
    ph = Placeholders(dict(PH))
    rows = [[100, 7, 10], [101, 8, 20], [102, 9, 30]]
    env, reveal_pis = qc.prove_query(pis, COLUMN_IDS, rows, ph, BOUNDS)
    assert qc.verify(env)
    # host cross-check: SUM(value)=60, COUNT=3
    outs = [eval_result_row(pis.result, r, ph)[0] for r in rows]
    agg = aggregate_rows(pis.result, outs)
    # revelation PI layout: comp(4) ph(4) block_root(4) results(8*no) count
    got0 = 0
    for l in reveal_pis[12:20]:
        got0 = (got0 << 32) | l
    assert got0 == agg[0]
