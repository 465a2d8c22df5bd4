"""parsil executor: Postgres companion-SQL generation (executor.rs role)."""

from mp2_tpu.parsil.assembler import parse_and_assemble
from mp2_tpu.parsil.executor import (
    generate_query_execution,
    generate_query_keys,
)
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.vdb.query.ops import Placeholders, QueryBounds

TABLE = ZkTable(
    "t",
    [
        ZkColumn("block", 1, "primary_index"),
        ZkColumn("key", 2, "secondary_index"),
        ZkColumn("value", 3),
    ],
)
PH = Placeholders({"$1": 7, "$MIN_BLOCK": 90, "$MAX_BLOCK": 110})
BOUNDS = QueryBounds(90, 110)
IDS = [1, 2, 3]


def test_aggregated_query_sql():
    pis = parse_and_assemble(
        "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND "
        "block <= $MAX_BLOCK AND key = $1",
        TABLE,
    )
    tq = generate_query_execution(pis, "zk_rows", IDS, PH, BOUNDS)
    assert tq.sql.startswith("SELECT SUM(")
    assert "COUNT(*)" in tq.sql
    assert "->> '3'" in tq.sql  # value column accessor by identifier
    assert "__valid_from <= %s AND __valid_until >= %s" in tq.sql
    assert "= 7" in tq.sql  # placeholder bound
    assert tq.params == [110, 90]


def test_scalar_query_sql_and_keys():
    pis = parse_and_assemble(
        "SELECT value * 2 FROM t WHERE block >= $MIN_BLOCK AND "
        "block <= $MAX_BLOCK AND value % 2 = 0",
        TABLE,
    )
    tq = generate_query_execution(pis, "zk_rows", IDS, PH, BOUNDS)
    assert "* 2" in tq.sql and "% 2" in tq.sql

    keys = generate_query_keys(pis, "zk_rows", IDS, PH, BOUNDS)
    assert keys.sql.startswith("SELECT key, __valid_from, __valid_until")
    assert keys.params == [110, 90]
