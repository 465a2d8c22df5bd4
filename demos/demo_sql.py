"""Demo: the two SQL halves composing (parsil executor <-> ryhope pgsql).

Builds a pgsql-backed (MockPg) rows store over three blocks, parses a
query, emits the Postgres companion SQL (parsil/src/executor.rs role),
EXECUTES it against the store through MockPg's SELECT evaluator, and
cross-checks the result against the direct circuit-semantics evaluator
(vdb/query/api.execute_query)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mp2_tpu.parsil.assembler import parse_and_assemble
from mp2_tpu.parsil.executor import (
    generate_query_execution,
    generate_query_keys,
    resolve_epoch_params,
)
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.ryhope.pgsql import MockPg, attach_pgsql
from mp2_tpu.vdb.query.api import TableData, execute_query
from mp2_tpu.vdb.query.ops import Placeholders, QueryBounds
from mp2_tpu.vdb.trees import Cell, RowPayload, build_cells_tree, new_row_tree

BLOCK_ID, KEY_ID, VALUE_ID = 1, 2, 3
TABLE = ZkTable(
    "t",
    [
        ZkColumn("block", BLOCK_ID, "primary_index"),
        ZkColumn("key", KEY_ID, "secondary_index"),
        ZkColumn("value", VALUE_ID),
    ],
)
ROWS = [
    (100, 7, 10), (100, 8, 99),
    (101, 7, 10), (101, 8, 99), (101, 9, 30),
    (102, 7, 12), (102, 9, 30),
]
SQL = (
    "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND "
    "block <= $MAX_BLOCK AND value < $1"
)


def main():
    db = new_row_tree()
    conn = MockPg()
    epoch = {}
    store = attach_pgsql(db, conn, "zk_rows",
                         user_epoch_fn=lambda tx: epoch["blk"])
    for blk in sorted({b for b, _, _ in ROWS}):
        epoch["blk"] = blk
        want = {k: v for b, k, v in ROWS if b == blk}

        def tx(t, want=want):
            present = dict(db.payloads)
            for key in list(present):
                if key[0] not in want:
                    t.remove(key)
            for k, v in want.items():
                cur = present.get((k, 0))
                if cur is None or cur.cells.nodes[1].cell.value != v:
                    t.store((k, 0), RowPayload(
                        secondary=Cell(KEY_ID, k, False),
                        row_unique_data=(k, k, k, k),
                        cells=build_cells_tree([Cell(VALUE_ID, v, False)]),
                    ))

        db.in_transaction(tx)
    print(f"pgsql store: {len(conn.tables['zk_rows'])} row versions, "
          f"epochs 100..102 (JSON payloads)")

    pis = parse_and_assemble(SQL, TABLE)
    ph = Placeholders({"$1": 50, "$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)
    ids = [BLOCK_ID, KEY_ID, VALUE_ID]

    tq = generate_query_execution(pis, "zk_rows", ids, ph, bounds)
    print("companion SQL:", tq.sql)
    cur = conn.cursor()
    cur.execute(tq.sql, tuple(resolve_epoch_params(store, bounds)))
    sql_result = cur.fetchall()
    print("  MockPg result:", sql_result)

    keys = generate_query_keys(pis, "zk_rows", ids, ph, bounds)
    cur.execute(keys.sql, tuple(resolve_epoch_params(store, bounds)))
    print(f"  proving work list: {len(cur.fetchall())} row versions")

    td = TableData(schema=TABLE)
    for b, k, v in ROWS:
        td.add_row(b, [b, k, v])
    direct = execute_query(pis, td, ph)
    print("direct evaluator:", direct.rows[0],
          f"({direct.num_matching_rows} matching rows)")
    # SUM(value<50) over blocks 100-101: 10+10+30 = 50, 3 rows
    assert direct.rows[0][0] == 50 and direct.rows[0][1] == 3
    assert sql_result[0][1] == 3 and sql_result[0][0] == 50
    print("companion SQL == direct evaluator: OK")


if __name__ == "__main__":
    main()
