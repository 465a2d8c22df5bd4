"""Bracketing SQL: locate the rows just OUTSIDE a query's index range by
pushing the search down to the store instead of enumerating keys host-side
(role of parsil/src/bracketer.rs:48-140).

Each function returns (preliminary_query, largest_below, smallest_above):
  * the preliminary query maps the USER block number to the store's
    INTERNAL epoch (the `_mapper` side table, epoch_mapper.rs role) —
    run once, its result is the $1 parameter of the other two;
  * largest_below / smallest_above are `ORDER BY <index accessor>
    DESC/ASC LIMIT 1` probes; None when the bound sits at the domain
    extremum (no row can exist beyond it).

The index accessors match the repo's tagged-JSON payload layout
(ryhope/jsonpayload.py): the block tree exposes
`payload -> 'f' ->> 'block_number'`, row trees expose the same
`payload -> 'cells' -> '<id>' ->> 'value'` view the executor SQL uses.
Emitted SQL runs against real Postgres-style DB-API connections and
against MockPg's dialect interpreter (ryhope/sqlexec.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

from mp2_tpu.utils.u256 import U256_MAX

SqlTriple = Tuple[str, Optional[str], Optional[str]]


def _bracket(table: str, accessor: str, lo: int, hi: int) -> SqlTriple:
    preliminary = (
        f"SELECT internal_epoch FROM {table}_mapper WHERE user_epoch = %s"
    )
    largest_below = None
    if lo > 0:
        largest_below = (
            f"SELECT key FROM {table} "
            f"WHERE __valid_from <= %s AND __valid_until >= %s "
            f"AND {accessor} < {int(lo)} "
            f"ORDER BY {accessor} DESC LIMIT 1"
        )
    smallest_above = None
    if hi < U256_MAX:
        smallest_above = (
            f"SELECT key FROM {table} "
            f"WHERE __valid_from <= %s AND __valid_until >= %s "
            f"AND {accessor} > {int(hi)} "
            f"ORDER BY {accessor} ASC LIMIT 1"
        )
    return preliminary, largest_below, smallest_above


def primary_index_accessor() -> str:
    """Block-tree payloads (BlockPayload) store the primary index under
    the tagged-JSON field map."""
    return "(payload -> 'f' ->> 'block_number')::numeric"


def secondary_index_accessor(sec_column_id: int) -> str:
    """Row-tree payloads expose the executor's cells view."""
    return f"(payload -> 'cells' -> '{int(sec_column_id)}' ->> 'value')::numeric"


def bracket_primary_index(table: str, bounds) -> SqlTriple:
    """Probes for the primary-index (block) range of `bounds`
    (bracketer.rs bracket_primary_index)."""
    return _bracket(
        table, primary_index_accessor(),
        int(bounds.min_block), int(bounds.max_block),
    )


def bracket_secondary_index(
    table: str, sec_column_id: int, lo: int, hi: int
) -> SqlTriple:
    """Probes for a secondary-index range over a row tree
    (bracketer.rs bracket_secondary_index)."""
    return _bracket(table, secondary_index_accessor(sec_column_id), lo, hi)


def range_occupancy_query(table: str, accessor: str, lo: int, hi: int) -> str:
    """One-row probe for 'does any row fall INSIDE the range' — the
    emptiness precondition of a non-existence proof, without fetching the
    table."""
    return (
        f"SELECT key FROM {table} "
        f"WHERE __valid_from <= %s AND __valid_until >= %s "
        f"AND {accessor} >= {int(lo)} AND {accessor} <= {int(hi)} LIMIT 1"
    )
