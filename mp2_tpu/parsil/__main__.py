"""parsil CLI (the reference's `parsil` debug binary, parsil/src/main.rs):
parse/validate a query against a JSON table schema and print the assembled
circuit plan, the computational hash committing to it, and the Postgres
companion SQL.

Usage:
  python -m mp2_tpu.parsil --schema schema.json "SELECT SUM(v) FROM t ..."
  python -m mp2_tpu.parsil "SELECT ..."            # built-in demo schema

Schema JSON: {"name": "t", "columns": [{"name": "block", "identifier": 1,
"kind": "primary_index"}, ...]}.
"""

from __future__ import annotations

import argparse
import json
import sys

from mp2_tpu.parsil.assembler import parse_and_assemble
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable

DEMO = ZkTable(
    "t",
    [
        ZkColumn("block", 1, "primary_index"),
        ZkColumn("key", 2, "secondary_index"),
        ZkColumn("value", 3),
    ],
)


def load_schema(path: str) -> ZkTable:
    spec = json.load(open(path))
    return ZkTable(
        spec["name"],
        [
            ZkColumn(c["name"], int(c["identifier"]), c.get("kind", "standard"))
            for c in spec["columns"]
        ],
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="parsil", description=__doc__)
    ap.add_argument("sql")
    ap.add_argument("--schema", help="table schema JSON (default: demo)")
    ap.add_argument("--params", type=int, nargs=4,
                    metavar=("PRED_OPS", "RESULT_OPS", "OUTPUTS", "PLACEHOLDERS"),
                    default=(4, 2, 2, 4),
                    help="universal-circuit bank sizes for the hash")
    args = ap.parse_args(argv)

    table = load_schema(args.schema) if args.schema else DEMO
    try:
        pis = parse_and_assemble(args.sql, table)
    except Exception as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    print(f"table: {table.name} "
          f"({', '.join(c.name for c in table.columns)})")
    print(f"kind:  {'aggregation' if pis.is_aggregation else 'tabular'}"
          + (f"  DISTINCT" if pis.result.distinct else "")
          + (f"  LIMIT {pis.limit}" if pis.limit is not None else "")
          + (f"  OFFSET {pis.offset}" if pis.offset else ""))
    print(f"bounds: block in [{pis.bounds.min_spec}, {pis.bounds.max_spec}]")
    print(f"placeholders: {pis.placeholder_names}")
    print("predicate ops:")
    for i, op in enumerate(pis.predicate_ops):
        print(f"  [{i}] {op}")
    print("result ops:")
    for i, op in enumerate(pis.result.result_operations):
        print(f"  [{i}] {op}")
    print(f"output items: {pis.result.output_items}")
    print(f"aggregations: {[a.name for a in pis.result.aggregations]}")

    from mp2_tpu.vdb.query.ops import computational_hash

    column_ids = [c.identifier for c in table.columns]
    np, nr, no, _nph = args.params
    ch = computational_hash(
        pis.predicate_ops, pis.result, column_ids, np, nr, no
    )
    print(f"computational hash: {[hex(int(v)) for v in ch]}")

    from mp2_tpu.parsil.executor import generate_query_execution
    from mp2_tpu.vdb.query.ops import Placeholders

    ph = Placeholders(
        {n: 0 for n in pis.placeholder_names}
        | {"$MIN_BLOCK": 0, "$MAX_BLOCK": (1 << 32) - 1}
    )
    bounds = pis.bounds.resolve(ph)
    tq = generate_query_execution(pis, table.name, column_ids, ph, bounds)
    print("companion SQL:")
    print("  " + tq.sql.replace("\n", "\n  "))
    if tq.params:
        print(f"params: {tq.params}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
