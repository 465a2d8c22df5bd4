"""Merkle-path gadget: recompute a rows/index-tree ROOT from a node hash
and a witnessed ancestor path (reference: verifiable-db/src/query/
merkle_path.rs:1-50).

Each ancestor is a row/block-layout node H(lh || rh || min(8) || max(8)
|| id || value(8) || inner(4)); at every level the previous hash slots in
as the left or right child (witnessed position bit), everything else is
witnessed.  The final hash is returned for binding against a committed
tree root (block-leaf rows_hash, IVC block root).

Fixed depth with an `active` flag per level (shorter real paths deactivate
the tail, passing the hash through unchanged) — ROW_TREE_MAX_DEPTH /
INDEX_TREE_MAX_DEPTH style bounds.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from mp2_tpu.circuit.builder import CircuitBuilder, Target
from mp2_tpu.vdb import digests as D


@dataclass
class PathLevelTargets:
    active: Target
    is_left: Target  # 1 when the child hash is the LEFT slot
    sibling: List[Target]  # 4
    mn: List[Target]  # 8
    mx: List[Target]  # 8
    ident: Target
    value: List[Target]  # 8
    inner: List[Target]  # 4


@dataclass
class MerklePathTargets:
    levels: List[PathLevelTargets]
    root: List[Target]  # 4


def _bool_input(b):
    t = b.add_input()
    b.connect(b.mul(t, t), t)
    return t


def add_merkle_path(
    b: CircuitBuilder, start_hash: Sequence[Target], max_depth: int
) -> MerklePathTargets:
    h = list(start_hash)
    levels = []
    e = [b.constant(v) for v in D.EMPTY_HASH]
    for _ in range(max_depth):
        lv = PathLevelTargets(
            active=_bool_input(b),
            is_left=_bool_input(b),
            sibling=b.add_inputs(4),
            mn=b.add_inputs(8),
            mx=b.add_inputs(8),
            ident=b.add_input(),
            value=b.add_inputs(8),
            inner=b.add_inputs(4),
        )
        lh = [b.select(lv.is_left, a, s) for a, s in zip(h, lv.sibling)]
        rh = [b.select(lv.is_left, s, a) for a, s in zip(h, lv.sibling)]
        parent = b.hash_no_pad(
            lh + rh + lv.mn + lv.mx + [lv.ident] + lv.value + lv.inner
        )
        h = [b.select(lv.active, p, c) for p, c in zip(parent, h)]
        levels.append(lv)
    return MerklePathTargets(levels=levels, root=h)


def set_merkle_path(
    inputs: Dict,
    mt: MerklePathTargets,
    path: Sequence[dict],
) -> None:
    """path: per real level a dict with keys is_left, sibling(4), mn(8),
    mx(8), ident, value(8), inner(4); shorter than max_depth is fine."""
    for i, lv in enumerate(mt.levels):
        if i < len(path):
            p = path[i]
            inputs[lv.active] = 1
            inputs[lv.is_left] = 1 if p["is_left"] else 0
            vals = (
                list(p["sibling"]) + list(p["mn"]) + list(p["mx"])
                + [p["ident"]] + list(p["value"]) + list(p["inner"])
            )
        else:
            inputs[lv.active] = 0
            inputs[lv.is_left] = 0
            vals = [0] * 25
        ts = (
            list(lv.sibling) + list(lv.mn) + list(lv.mx) + [lv.ident]
            + list(lv.value) + list(lv.inner)
        )
        for t, v in zip(ts, vals):
            inputs[t] = int(v)


def host_path_from_tree(db, key) -> List[dict]:
    """Build the witness path for `key` up a rows/block MerkleTreeKvDb
    (sibling payload fields per ancestor)."""
    from mp2_tpu.utils.u256 import u256_to_fields

    path = []
    cur = key
    parent = db.tree.parent(cur)
    while parent is not None:
        l, r = db.tree.children(parent)
        is_left = l == cur
        sib = r if is_left else l
        sib_h = list(db.payload(sib).hash) if sib is not None else list(D.EMPTY_HASH)
        pp = db.payload(parent)
        if hasattr(pp, "secondary"):  # rows tree payload
            ident = pp.secondary.identifier
            value = u256_to_fields(pp.secondary.value)
            inner = list(pp.cells.root_hash)
        else:  # block tree payload
            ident = pp.index_id
            value = u256_to_fields(pp.block_number)
            inner = list(pp.rows_hash)
        path.append(
            dict(
                is_left=is_left,
                sibling=sib_h,
                mn=u256_to_fields(pp.min_value),
                mx=u256_to_fields(pp.max_value),
                ident=ident,
                value=value,
                inner=inner,
            )
        )
        cur = parent
        parent = db.tree.parent(cur)
    return path
