"""parsil executor: generate the Postgres COMPANION queries for a parsed
zk-query (reference: parsil/src/executor.rs:1058-1092).

Two outputs per query, both against the ryhope pgsql storage layout
(JSON payload column, __valid_from/__valid_until epoch ranges):

  * generate_query_execution — SQL computing the expected RESULT values
    (what the prover must reproduce in-circuit; production cross-checks
    the revelation output against this);
  * generate_query_keys — SQL enumerating the (row key, epoch) pairs that
    need proving (the planner's work list).

Translation: the assembled BasicOperation DAG is printed back as SQL
expressions over `payload -> 'cells' -> '<id>' ->> 'value'` JSON
accessors (executor.rs fetch_from_payload, :411-430), with placeholders
bound as literals, the primary-index range as an epoch predicate, and
the secondary-index range (QueryBounds) as a cells-accessor range
predicate.  The primary-index COLUMN, when referenced, is emitted as the
min-block literal — the reference's epoch-mapper trick (executor.rs:
706-724): range filtering already happened on the epoch columns, and any
other primary-index predicate is removed by the isolator.

The emitted SQL executes both on a real Postgres (JSONB payloads) and on
the in-repo `MockPg` connection, whose SELECT evaluator implements
exactly this statement dialect — so tests run the companion SQL against
the same store the proving pipeline reads.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from mp2_tpu.utils.u256 import U256_MAX
from mp2_tpu.vdb.query.ops import (
    AggregationOperation,
    BasicOperation,
    Operand,
    Operation,
    Placeholders,
    QueryBounds,
)

_OP_SQL = {
    Operation.ADD: "+", Operation.SUB: "-", Operation.MUL: "*",
    Operation.DIV: "/", Operation.MOD: "%",
    Operation.EQ: "=", Operation.NE: "<>", Operation.LT: "<",
    Operation.GT: ">", Operation.LE: "<=", Operation.GE: ">=",
    Operation.AND: "AND", Operation.OR: "OR", Operation.XOR: "<>",
}

_AGG_SQL = {
    AggregationOperation.SUM: "SUM", AggregationOperation.MIN: "MIN",
    AggregationOperation.MAX: "MAX", AggregationOperation.AVG: "AVG",
    AggregationOperation.COUNT: "COUNT",
}


@dataclass
class TranslatedQuery:
    """executor.rs TranslatedQuery role: SQL text + parameters."""

    sql: str
    params: List


def _column_sql(idx: int, column_ids: Sequence[int], bounds) -> str:
    if idx == 0:
        # primary-index column: the epoch predicate already constrains it
        # (executor.rs:706-724 min-block trick)
        return str(int(bounds.min_block))
    return f"(payload -> 'cells' -> '{column_ids[idx]}' ->> 'value')::numeric"


def _operand_sql(
    o: Optional[Operand], prev: List[str], column_ids, ph, bounds
) -> str:
    if o is None:
        return "NULL"
    if o.kind == "column":
        return _column_sql(o.value, column_ids, bounds)
    if o.kind == "constant":
        return str(int(o.value))
    if o.kind == "placeholder":
        return str(int(ph.get(o.value)))
    return prev[o.value]


def _ops_sql(
    ops: Sequence[BasicOperation], column_ids, ph: Placeholders, bounds
) -> List[str]:
    prev: List[str] = []
    for op in ops:
        a = _operand_sql(op.first, prev, column_ids, ph, bounds)
        b = _operand_sql(op.second, prev, column_ids, ph, bounds)
        if op.op == Operation.NOT:
            prev.append(f"(NOT ({a})::bool)")
        elif op.op in (Operation.AND, Operation.OR):
            prev.append(f"(({a})::bool {_OP_SQL[op.op]} ({b})::bool)")
        else:
            prev.append(f"({a} {_OP_SQL[op.op]} {b})")
    return prev


def _where_sql(pis, column_ids, ph, bounds) -> str:
    """Epoch range + secondary-index range (QueryBounds) + predicate."""
    where = _ops_sql(pis.predicate_ops, column_ids, ph, bounds)
    pred = f"({where[-1]})::bool" if where else "TRUE"
    parts = ["__valid_from <= %s", "__valid_until >= %s"]
    min_s = getattr(bounds, "min_secondary", 0)
    max_s = getattr(bounds, "max_secondary", U256_MAX)
    if (min_s, max_s) != (0, U256_MAX) and len(column_ids) >= 2:
        sec = _column_sql(1, column_ids, bounds)
        parts.append(f"{sec} >= {int(min_s)}")
        parts.append(f"{sec} <= {int(max_s)}")
    parts.append(pred)
    return " AND ".join(parts)


def generate_query_execution(
    pis,
    table: str,
    column_ids: Sequence[int],
    ph: Placeholders,
    bounds: QueryBounds,
) -> TranslatedQuery:
    """The result-computing companion SQL (executor.rs
    generate_query_execution)."""
    prev = _ops_sql(pis.result.result_operations, column_ids, ph, bounds)
    selects = []
    for item, agg in zip(pis.result.output_items, pis.result.aggregations):
        expr = (
            _column_sql(item.index, column_ids, bounds)
            if item.kind == "column"
            else prev[item.index]
        )
        if agg == AggregationOperation.COUNT:
            selects.append("COUNT(*)")
        elif agg in _AGG_SQL:
            selects.append(f"{_AGG_SQL[agg]}({expr})")
        else:
            selects.append(expr)
    distinct = "DISTINCT " if pis.result.distinct else ""
    sql = (
        f"SELECT {distinct}{', '.join(selects)} FROM {table} "
        f"WHERE {_where_sql(pis, column_ids, ph, bounds)}"
    )
    return TranslatedQuery(sql=sql, params=[bounds.max_block, bounds.min_block])


def generate_query_keys(
    pis,
    table: str,
    column_ids: Sequence[int],
    ph: Placeholders,
    bounds: QueryBounds,
) -> TranslatedQuery:
    """The proving work-list companion SQL (executor.rs
    generate_query_keys): every (key, epoch) whose row satisfies the
    predicate inside the block range."""
    sql = (
        f"SELECT key, __valid_from, __valid_until FROM {table} "
        f"WHERE {_where_sql(pis, column_ids, ph, bounds)}"
    )
    return TranslatedQuery(sql=sql, params=[bounds.max_block, bounds.min_block])


def resolve_epoch_params(store, bounds: QueryBounds) -> List[int]:
    """Map USER block bounds to the INTERNAL epoch params the emitted SQL
    expects, via the store's epoch-mapper table (the reference resolves
    the user range on the mapper before touching payload rows)."""
    lo = store.internal_epoch(bounds.min_block)
    hi = store.internal_epoch(bounds.max_block)
    assert lo is not None and hi is not None, "block range outside the mapper"
    return [hi, lo]
