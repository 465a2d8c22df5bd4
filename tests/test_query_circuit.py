"""Per-query row circuit: real TP2 proofs of predicate/result evaluation."""

import pytest

from mp2_tpu.parsil.assembler import parse_and_assemble
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.prover.verify import verify
from mp2_tpu.vdb.query.circuit import build_row_query_circuit
from mp2_tpu.vdb.query.ops import Placeholders, eval_predicate, eval_result_row

TABLE = ZkTable(
    "t",
    [
        ZkColumn("block", 1, "primary_index"),
        ZkColumn("key", 2, "secondary_index"),
        ZkColumn("value", 3),
    ],
)

SQL = (
    "SELECT value, value + key FROM t "
    "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK "
    "AND (key = $1 OR value <= 25)"
)


@pytest.fixture(scope="module")
def circuit():
    pis = parse_and_assemble(SQL, TABLE)
    return pis, build_row_query_circuit(pis, num_columns=3)


@pytest.mark.parametrize(
    "row,ph,want_pred",
    [
        ([100, 7, 10], {"$1": 7}, True),   # key matches
        ([100, 8, 10], {"$1": 7}, True),   # value <= 25
        ([100, 8, 99], {"$1": 7}, False),  # neither
    ],
)
def test_row_proof_matches_host_semantics(circuit, row, ph, want_pred):
    pis, rc = circuit
    placeholders = Placeholders(dict(ph))
    pred, _ = eval_predicate(pis.predicate_ops, row, placeholders)
    assert pred == want_pred
    out, _ = eval_result_row(pis.result, row, placeholders)

    expected = rc.expected_public_inputs(pred, out, ph, row)
    proof = rc.prove_row(row, ph, expected)
    assert verify(rc.data, proof)
    # PI layout: column_commitment(4) || predicate_bit || ...
    assert expected[:4] == rc.column_commitment(row)
    assert proof.public_inputs[4] == (1 if want_pred else 0)

    # forged predicate bit must fail
    forged = rc.prove_row(row, ph, expected)
    forged.public_inputs = expected[:4] + [1 - expected[4]] + expected[5:]
    assert not verify(rc.data, forged)

    # forged column commitment (claiming different row values) must fail
    forged2 = rc.prove_row(row, ph, expected)
    other = rc.column_commitment([row[0], row[1], row[2] + 1])
    forged2.public_inputs = other + expected[4:]
    assert not verify(rc.data, forged2)


def test_distinct_queries_have_distinct_digests():
    p1 = parse_and_assemble(
        "SELECT value FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK AND key = $1",
        TABLE,
    )
    p2 = parse_and_assemble(
        "SELECT value FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK AND key != $1",
        TABLE,
    )
    c1 = build_row_query_circuit(p1, 3)
    c2 = build_row_query_circuit(p2, 3)
    # circuit digest = computational-hash role: commits to the baked ops
    assert c1.data.circuit_digest != c2.data.circuit_digest


def test_arithmetic_query_circuit():
    """MUL/DIV in a real per-query circuit."""
    pis = parse_and_assemble(
        "SELECT value * 2 + key, value / key FROM t "
        "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK AND value % 2 = 0",
        TABLE,
    )
    rc = build_row_query_circuit(pis, num_columns=3)
    for row in ([100, 7, 10], [100, 4, 9]):
        ph = {}
        placeholders = Placeholders({})
        pred, _ = eval_predicate(pis.predicate_ops, row, placeholders)
        out, _ = eval_result_row(pis.result, row, placeholders)
        expected = rc.expected_public_inputs(pred, out, ph, row)
        proof = rc.prove_row(row, ph, expected)
        from mp2_tpu.prover.verify import verify as _v

        assert _v(rc.data, proof)
        assert proof.public_inputs[4] == (1 if pred else 0)
