"""parsil executor: generate the Postgres COMPANION queries for a parsed
zk-query (reference: parsil/src/executor.rs:1058-1092).

Two outputs per query, both against the ryhope pgsql storage layout
(payload JSON columns, __valid_from/__valid_until epoch ranges):

  * generate_query_execution — SQL computing the expected RESULT values
    (what the prover must reproduce in-circuit; production cross-checks
    the revelation output against this);
  * generate_query_keys — SQL enumerating the (row key, epoch) pairs that
    need proving (the planner's work list).

Translation: the assembled BasicOperation DAG is printed back as SQL
expressions over `payload -> 'cells' ->> id` JSON accessors, with
placeholders bound as literals and the primary-index range as an epoch
predicate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

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


def _column_sql(idx: int, column_ids: Sequence[int]) -> str:
    return f"(payload -> 'cells' ->> '{column_ids[idx]}')::numeric"


def _operand_sql(o: Optional[Operand], prev: List[str], column_ids, ph) -> str:
    if o is None:
        return "NULL"
    if o.kind == "column":
        return _column_sql(o.value, column_ids)
    if o.kind == "constant":
        return str(int(o.value))
    if o.kind == "placeholder":
        return str(int(ph.get(o.value)))
    return prev[o.value]


def _ops_sql(
    ops: Sequence[BasicOperation], column_ids, ph: Placeholders
) -> List[str]:
    prev: List[str] = []
    for op in ops:
        a = _operand_sql(op.first, prev, column_ids, ph)
        b = _operand_sql(op.second, prev, column_ids, ph)
        if op.op == Operation.NOT:
            prev.append(f"(NOT ({a})::bool)")
        elif op.op in (Operation.AND, Operation.OR):
            prev.append(f"(({a})::bool {_OP_SQL[op.op]} ({b})::bool)")
        else:
            prev.append(f"({a} {_OP_SQL[op.op]} {b})")
    return prev


def generate_query_execution(
    pis,
    table: str,
    column_ids: Sequence[int],
    ph: Placeholders,
    bounds: QueryBounds,
) -> TranslatedQuery:
    """The result-computing companion SQL (executor.rs
    generate_query_execution)."""
    prev = _ops_sql(pis.result.result_operations, column_ids, ph)
    selects = []
    for item, agg in zip(pis.result.output_items, pis.result.aggregations):
        expr = (
            _column_sql(item.index, column_ids)
            if item.kind == "column"
            else prev[item.index]
        )
        if agg == AggregationOperation.COUNT:
            selects.append("COUNT(*)")
        elif agg in _AGG_SQL:
            selects.append(f"{_AGG_SQL[agg]}({expr})")
        else:
            selects.append(expr)
    where = _ops_sql(pis.predicate_ops, column_ids, ph)
    pred = f"({where[-1]})::bool" if where else "TRUE"
    distinct = "DISTINCT " if pis.result.distinct else ""
    sql = (
        f"SELECT {distinct}{', '.join(selects)} FROM {table} "
        f"WHERE __valid_from <= %s AND __valid_until >= %s AND {pred}"
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
    where = _ops_sql(pis.predicate_ops, column_ids, ph)
    pred = f"({where[-1]})::bool" if where else "TRUE"
    sql = (
        f"SELECT key, __valid_from, __valid_until FROM {table} "
        f"WHERE __valid_from <= %s AND __valid_until >= %s AND {pred}"
    )
    return TranslatedQuery(sql=sql, params=[bounds.max_block, bounds.min_block])
