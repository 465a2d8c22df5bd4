"""parsil SQL front-end + universal query semantics + execution."""

import pytest

from mp2_tpu.parsil import ast
from mp2_tpu.parsil.assembler import (
    ValidationError,
    parse_and_assemble,
)
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.vdb.query.api import TableData, execute_query
from mp2_tpu.vdb.query.ops import AggregationOperation, Placeholders

TABLE = ZkTable(
    "t",
    [
        ZkColumn("block", 1001, "primary_index"),
        ZkColumn("addr", 1002, "secondary_index"),
        ZkColumn("value", 1003),
        ZkColumn("gas", 1004),
    ],
)


def _table_data():
    td = TableData(TABLE)
    # (block, addr, value, gas)
    td.add_row(100, [100, 1, 10, 5])
    td.add_row(100, [100, 2, 20, 6])
    td.add_row(101, [101, 1, 30, 7])
    td.add_row(101, [101, 3, 40, 8])
    td.add_row(102, [102, 2, 50, 9])
    return td


def _ph(extra=None):
    v = {"$MIN_BLOCK": 100, "$MAX_BLOCK": 102}
    v.update(extra or {})
    return Placeholders(v)


def test_parser_shapes():
    q = ast.parse(
        "SELECT SUM(value), COUNT(*) FROM t "
        "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK AND value > 15;"
    )
    assert q.table == "t"
    assert len(q.items) == 2
    assert isinstance(q.items[0], ast.Aggregation)
    assert q.items[1].func == "COUNT" and q.items[1].expr is None


def test_validation_rejects_mixed():
    with pytest.raises(ValidationError):
        parse_and_assemble("SELECT SUM(value), gas FROM t WHERE block = 5", TABLE)


def test_assemble_block_range_extraction():
    pis = parse_and_assemble(
        "SELECT SUM(value) FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
        TABLE,
    )
    assert pis.bounds.min_spec == "$MIN_BLOCK"
    assert pis.bounds.max_spec == "$MAX_BLOCK"
    assert pis.predicate_ops == []  # fully absorbed into bounds
    assert pis.is_aggregation


def test_sum_avg_min_query():
    pis = parse_and_assemble(
        "SELECT SUM(value), AVG(value), MIN(gas), MAX(value), COUNT(*) FROM t "
        "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK AND addr = $1",
        TABLE,
    )
    res = execute_query(pis, _table_data(), _ph({"$1": 1}))
    # rows with addr=1: (100,1,10,5), (101,1,30,7)
    assert res.num_matching_rows == 2
    assert res.rows[0][0] == 40  # SUM
    assert res.rows[0][1] == 20  # AVG
    assert res.rows[0][2] == 5  # MIN gas
    assert res.rows[0][3] == 30  # MAX value
    assert res.rows[0][4] == 2  # COUNT
    assert not res.overflow


def test_tabular_select_distinct_limit():
    pis = parse_and_assemble(
        "SELECT DISTINCT addr FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK "
        "LIMIT 2",
        TABLE,
    )
    res = execute_query(pis, _table_data(), _ph())
    assert res.rows == [[1], [2]]
    assert res.num_matching_rows == 5


def test_arithmetic_and_boolean_predicate():
    pis = parse_and_assemble(
        "SELECT COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK "
        "AND (value + gas > 40 OR addr = 1)",
        TABLE,
    )
    res = execute_query(pis, _table_data(), _ph())
    # value+gas: 15,26,37,48,59 -> rows 4,5 match; addr=1 -> rows 1,3
    assert res.rows[0][0] == 4


def test_computed_output():
    pis = parse_and_assemble(
        "SELECT SUM(value * 2 + gas) FROM t "
        "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
        TABLE,
    )
    res = execute_query(pis, _table_data(), _ph())
    want = sum(v * 2 + g for v, g in [(10, 5), (20, 6), (30, 7), (40, 8), (50, 9)])
    assert res.rows[0][0] == want


def test_block_range_filters():
    pis = parse_and_assemble(
        "SELECT COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
        TABLE,
    )
    res = execute_query(pis, _table_data(), Placeholders({"$MIN_BLOCK": 101, "$MAX_BLOCK": 101}))
    assert res.rows[0][0] == 2
    # empty range -> zero matching rows (non-existence case)
    res0 = execute_query(pis, _table_data(), Placeholders({"$MIN_BLOCK": 900, "$MAX_BLOCK": 999}))
    assert res0.num_matching_rows == 0 and res0.rows[0][0] == 0


def test_computational_hash_binds_query_shape():
    p1 = parse_and_assemble(
        "SELECT SUM(value) FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
        TABLE,
    )
    p2 = parse_and_assemble(
        "SELECT SUM(gas) FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
        TABLE,
    )
    r1 = execute_query(p1, _table_data(), _ph())
    r2 = execute_query(p2, _table_data(), _ph())
    assert r1.computational_hash != r2.computational_hash
    # same query -> same hash
    r1b = execute_query(p1, _table_data(), _ph())
    assert r1.computational_hash == r1b.computational_hash


def test_chunking_plan():
    pis = parse_and_assemble(
        "SELECT COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
        TABLE,
    )
    res = execute_query(pis, _table_data(), _ph())
    assert sum(len(c) for c in res.chunks) == 5
    assert all(len(c) <= 3 for c in res.chunks)


def test_order_by():
    pis = parse_and_assemble(
        "SELECT value FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK "
        "ORDER BY value DESC LIMIT 3",
        TABLE,
    )
    res = execute_query(pis, _table_data(), _ph())
    assert res.rows == [[50], [40], [30]]
    pis2 = parse_and_assemble(
        "SELECT value FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK "
        "ORDER BY value",
        TABLE,
    )
    res2 = execute_query(pis2, _table_data(), _ph())
    assert res2.rows == [[10], [20], [30], [40], [50]]
