"""Query proof planner: tree access + non-existence inputs.

Role of mp2-v1/src/query/planner.rs (`TreeFetcher`, `NonExistenceInput`)
and parsil's bracketer: given a query's primary-index range, locate the
nodes proving emptiness (largest node below / smallest node above the
range) and fetch the touched-node lineages the row-chunk circuits need.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from mp2_tpu.ryhope.kvdb import MerkleTreeKvDb


@dataclass(frozen=True)
class NonExistenceInput:
    """Witness for an empty primary-index range (query/non_existence.rs):
    a node adjacent to the range plus its Merkle path, proving no index
    value falls inside [min_query, max_query]."""

    node_key: object
    lineage: List
    is_below: bool  # node is the predecessor (True) or successor (False)


def find_node_for_non_existence(
    db: MerkleTreeKvDb, min_query: int, max_query: int, epoch: Optional[int] = None
) -> Optional[NonExistenceInput]:
    """Bracketer: the largest key < min_query, else the smallest key >
    max_query.  Returns None if keys exist INSIDE the range (range not
    empty)."""
    view = db.view_at(epoch) if epoch is not None else db.current_view()
    keys = sorted(view.keys())
    if any(min_query <= k <= max_query for k in keys):
        return None
    below = [k for k in keys if k < min_query]
    above = [k for k in keys if k > max_query]
    if below:
        key = max(below)
        return NonExistenceInput(key, view.lineage(key), True)
    if above:
        key = min(above)
        return NonExistenceInput(key, view.lineage(key), False)
    return None  # empty tree


def fetch_row_paths(
    db: MerkleTreeKvDb, keys: Sequence, epoch: Optional[int] = None
) -> Dict[object, List]:
    """Merkle paths (with payloads available via the db) for the rows a
    chunk proof touches (merkle_path.rs gadget inputs)."""
    view = db.view_at(epoch) if epoch is not None else db.current_view()
    return {k: view.lineage(k) for k in keys if view.tree.contains(k)}
