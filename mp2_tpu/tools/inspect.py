"""Operator CLI to browse verifiable-DB trees at any epoch.

Role of the reference's `inspect` crate (inspect/src/main.rs: REPL over
row/index trees persisted in Postgres).  Works over a pickled TableIndexer
snapshot or is driven programmatically in tests/demos.

Usage:
  python -m mp2_tpu.tools.inspect <snapshot.pkl> [--epoch N] [--tree rows|block]
"""

from __future__ import annotations

import argparse
import pickle
import sys
from typing import Optional


def render_tree(db, epoch: Optional[int] = None, max_nodes: int = 200) -> str:
    """ASCII rendering of a MerkleTreeKvDb (sub)tree with payload digests."""
    view = db.view_at(epoch) if epoch is not None else db.current_view()
    root = view.root()
    if root is None:
        return "(empty tree)"
    lines = []

    def visit(key, depth, label):
        if len(lines) >= max_nodes:
            return
        payload = view.payload(key)
        h = getattr(payload, "hash", None)
        hs = f" hash={h[0]:#x}.." if h else ""
        lines.append(f"{'  ' * depth}{label}{key}{hs}")
        l, r = view.children(key)
        if l is not None:
            visit(l, depth + 1, "L ")
        if r is not None:
            visit(r, depth + 1, "R ")

    visit(root, 0, "* ")
    lines.append(f"[epoch={view.epoch} size={view.size()}]")
    return "\n".join(lines)


def describe_epochs(db) -> str:
    out = []
    for e in range(db.epoch + 1):
        v = db.view_at(e)
        r = v.root()
        h = getattr(v.payload(r), "hash", ("", "", "", ""))[0] if r else 0
        out.append(f"epoch {e}: root={r} size={v.size()} hash={h:#x}")
    return "\n".join(out)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("snapshot", help="pickled TableIndexer")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--tree", choices=["rows", "block"], default="block")
    ap.add_argument("--epochs", action="store_true", help="list all epochs")
    args = ap.parse_args(argv)

    with open(args.snapshot, "rb") as f:
        idx = pickle.load(f)
    db = idx.rows_db if args.tree == "rows" else idx.block_db
    if args.epochs:
        print(describe_epochs(db))
    else:
        print(render_tree(db, args.epoch))


if __name__ == "__main__":
    main()
