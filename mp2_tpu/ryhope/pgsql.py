"""Postgres storage backend for MerkleTreeKvDb: copy-on-write row
versioning over any DB-API connection.

Role of ryhope's storage::pgsql (/root/reference/ryhope/src/storage/pgsql/):
  * one row per (key, payload version) with `__valid_from` / `__valid_until`
    epoch ranges (COW versioning, lib.rs:28-41 column conventions);
  * a `<table>_meta` side table pinning the root key + latest epoch;
  * a `<table>_mapper` side table mapping USER epochs (block numbers) to
    incremental INTERNAL epochs (epoch_mapper.rs:15-35);
  * epoch-ranged reads (`fetch_at`), `wide_lineage` SQL push-down, and
    `rollback_to`.

The environment ships no Postgres server, so `MockPg` executes the exact
statement shapes this module emits against in-memory tables — the SQL
text itself is what a real psycopg2 connection would receive (parameter
style %s).  Keys and payloads serialize as tagged JSON text (the JSONB
stand-in, storages.rs:67) so the parsil executor's companion SQL can
evaluate `payload -> 'cells' -> '<id>' ->> 'value'` accessors against
this storage; only the opaque `tree` state snapshot stays pickled.
"""

from __future__ import annotations

import pickle
import re
from typing import Dict, List, Optional, Sequence, Tuple

MAX_EPOCH = 1 << 62


def _enc(obj) -> str:
    from mp2_tpu.ryhope.jsonpayload import to_json

    return to_json(obj)


def _dec(blob: str):
    from mp2_tpu.ryhope.jsonpayload import from_json

    return from_json(blob)


class PgsqlTreeStore:
    """COW-versioned node storage over a DB-API connection."""

    def __init__(self, conn, table: str):
        assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table)
        self.conn = conn
        self.t = table
        cur = conn.cursor()
        cur.execute(
            f"CREATE TABLE IF NOT EXISTS {self.t} ("
            f"key TEXT NOT NULL, payload TEXT NOT NULL, "
            f"__valid_from BIGINT NOT NULL, __valid_until BIGINT NOT NULL)"
        )
        cur.execute(
            f"CREATE TABLE IF NOT EXISTS {self.t}_meta ("
            f"epoch BIGINT NOT NULL, root TEXT, "
            f"tree TEXT NOT NULL)"
        )
        cur.execute(
            f"CREATE TABLE IF NOT EXISTS {self.t}_mapper ("
            f"user_epoch BIGINT NOT NULL, internal_epoch BIGINT NOT NULL)"
        )
        conn.commit()

    # ---------------------------------------------------------------- write
    def commit_epoch(
        self,
        epoch: int,
        changed: Dict,
        removed: Sequence,
        root_key,
        tree_state,
        user_epoch: Optional[int] = None,
    ) -> None:
        """Persist one committed transaction: close the previous versions
        of changed/removed keys, insert the new versions."""
        cur = self.conn.cursor()
        for key in list(changed) + list(removed):
            cur.execute(
                f"UPDATE {self.t} SET __valid_until = %s "
                f"WHERE key = %s AND __valid_until = %s",
                (epoch - 1, _enc(key), MAX_EPOCH),
            )
        for key, payload in changed.items():
            cur.execute(
                f"INSERT INTO {self.t} (key, payload, __valid_from, "
                f"__valid_until) VALUES (%s, %s, %s, %s)",
                (_enc(key), _enc(payload), epoch, MAX_EPOCH),
            )
        cur.execute(
            f"INSERT INTO {self.t}_meta (epoch, root, tree) "
            f"VALUES (%s, %s, %s)",
            (epoch, _enc(root_key), _enc(tree_state)),
        )
        cur.execute(
            f"INSERT INTO {self.t}_mapper (user_epoch, internal_epoch) "
            f"VALUES (%s, %s)",
            (epoch if user_epoch is None else user_epoch, epoch),
        )
        self.conn.commit()

    # ----------------------------------------------------------------- read
    def fetch_at(self, epoch: int) -> Dict:
        cur = self.conn.cursor()
        cur.execute(
            f"SELECT key, payload FROM {self.t} "
            f"WHERE __valid_from <= %s AND __valid_until >= %s",
            (epoch, epoch),
        )
        return {_dec(k): _dec(p) for k, p in cur.fetchall()}

    def meta_at(self, epoch: int):
        cur = self.conn.cursor()
        cur.execute(
            f"SELECT root, tree FROM {self.t}_meta WHERE epoch = %s",
            (epoch,),
        )
        rows = cur.fetchall()
        if not rows:
            return None
        root, tree = rows[-1]
        return _dec(root), _dec(tree)

    def latest_epoch(self) -> int:
        cur = self.conn.cursor()
        cur.execute(f"SELECT MAX(epoch) FROM {self.t}_meta", ())
        rows = cur.fetchall()
        return rows[0][0] if rows and rows[0][0] is not None else 0

    def internal_epoch(self, user_epoch: int) -> Optional[int]:
        cur = self.conn.cursor()
        cur.execute(
            f"SELECT internal_epoch FROM {self.t}_mapper "
            f"WHERE user_epoch = %s",
            (user_epoch,),
        )
        rows = cur.fetchall()
        return rows[-1][0] if rows else None

    def wide_lineage_between(self, epoch: int, keys: Sequence) -> Dict:
        """Bulk-fetch payloads of `keys` at `epoch` (the SQL push-down of
        ryhope's wide_lineage_between, storage/mod.rs:55)."""
        cur = self.conn.cursor()
        cur.execute(
            f"SELECT key, payload FROM {self.t} "
            f"WHERE __valid_from <= %s AND __valid_until >= %s "
            f"AND key = ANY(%s)",
            (epoch, epoch, [_enc(k) for k in keys]),
        )
        return {_dec(k): _dec(p) for k, p in cur.fetchall()}

    def versions_born_at(self, epoch: int) -> Dict:
        """Keys whose current version starts exactly at `epoch` (the
        'changed' half of diff_at)."""
        cur = self.conn.cursor()
        cur.execute(
            f"SELECT key, payload FROM {self.t} WHERE __valid_from = %s",
            (epoch,),
        )
        return {_dec(k): _dec(p) for k, p in cur.fetchall()}

    def keys_closed_at(self, epoch: int) -> List:
        """Keys whose version was closed at `epoch` (candidates for the
        'removed' half of diff_at — minus same-epoch rebirths)."""
        cur = self.conn.cursor()
        cur.execute(
            f"SELECT key FROM {self.t} WHERE __valid_until = %s",
            (epoch,),
        )
        return [_dec(k) for (k,) in cur.fetchall()]

    # ------------------------------------------------------------- rollback
    def rollback_to(self, epoch: int) -> None:
        cur = self.conn.cursor()
        cur.execute(
            f"DELETE FROM {self.t} WHERE __valid_from > %s", (epoch,)
        )
        cur.execute(
            f"UPDATE {self.t} SET __valid_until = %s "
            f"WHERE __valid_until > %s",
            (MAX_EPOCH, epoch),
        )
        cur.execute(f"DELETE FROM {self.t}_meta WHERE epoch > %s", (epoch,))
        cur.execute(
            f"DELETE FROM {self.t}_mapper WHERE internal_epoch > %s", (epoch,)
        )
        self.conn.commit()


class SqlBackend:
    """MerkleTreeKvDb storage backend over a PgsqlTreeStore: the
    storage::pgsql role behind the SAME facade as MemoryBackend
    (reference: ryhope/src/lib.rs:119 parameterizes the tree over S).

    Reads go through a bounded per-epoch cache (the CachedDbStore /
    CachedDbTreeStore role, storage/pgsql/storages.rs) so repeated
    view_at/lineage walks don't re-fetch whole epochs from SQL."""

    def __init__(self, conn, table: str, cache_epochs: int = 8):
        self.store = PgsqlTreeStore(conn, table)
        self.cache_epochs = cache_epochs
        self._cache: Dict[int, Tuple[object, Dict]] = {}

    def store_epoch(self, epoch: int, tree, payloads, changed, removed,
                    root, user_epoch: Optional[int] = None) -> None:
        self.store.commit_epoch(
            epoch, changed, removed, root,
            pickle.dumps(tree).hex(), user_epoch,
        )
        self._cache.pop(epoch, None)

    def load_epoch(self, epoch: int):
        hit = self._cache.get(epoch)
        if hit is not None:
            return hit
        meta = self.store.meta_at(epoch)
        assert meta is not None, f"no epoch {epoch} in the SQL store"
        root, tree_blob = meta
        tree = pickle.loads(bytes.fromhex(tree_blob))
        payloads = self.store.fetch_at(epoch)
        if len(self._cache) >= self.cache_epochs:
            self._cache.pop(next(iter(self._cache)))
        self._cache[epoch] = (tree, payloads)
        return tree, payloads

    def diff_at(self, epoch: int):
        births = self.store.versions_born_at(epoch)  # {key: payload}
        died = self.store.keys_closed_at(epoch - 1)
        removed = [k for k in died if k not in births]
        return births, removed

    def rollback_to(self, epoch: int):
        self.store.rollback_to(epoch)
        self._cache.clear()
        t, p = self.load_epoch(epoch)
        return pickle.loads(pickle.dumps(t)), dict(p)


def attach_pgsql(db, conn, table: str, user_epoch_fn=None) -> PgsqlTreeStore:
    """Mirror every commit of a MerkleTreeKvDb into a PgsqlTreeStore via
    the backend seam (memory stays the read-primary; SQL is persisted
    write-through).  Returns the store."""
    from mp2_tpu.ryhope.kvdb import TeeBackend

    backend = SqlBackend(conn, table)
    db.backend = TeeBackend([db.backend, backend])
    if user_epoch_fn is not None:
        orig = db._commit

        def committing(tx):
            tx.user_epoch = user_epoch_fn(tx)
            return orig(tx)

        db._commit = committing
    return backend.store


def load_view(store: PgsqlTreeStore, epoch: int):
    """Reconstruct a TreeView purely from SQL state at `epoch`."""
    from mp2_tpu.ryhope.kvdb import TreeView

    meta = store.meta_at(epoch)
    assert meta is not None, f"no epoch {epoch} in the store"
    root, tree_blob = meta
    tree = pickle.loads(bytes.fromhex(tree_blob))
    payloads = store.fetch_at(epoch)
    return TreeView(tree=tree, payloads=payloads, epoch=epoch)


# ---------------------------------------------------------------------------
# mock DB-API connection executing this module's statement shapes
# ---------------------------------------------------------------------------


class MockPg:
    """In-memory stand-in for a psycopg2 connection: parses exactly the
    statement shapes PgsqlTreeStore emits (so swapping in a real
    connection exercises identical SQL)."""

    def __init__(self):
        self.tables: Dict[str, List[dict]] = {}
        self.statements: List[str] = []

    def cursor(self):
        return _MockCursor(self)

    def commit(self):
        pass


class _MockCursor:
    def __init__(self, db: MockPg):
        self.db = db
        self._rows: List[tuple] = []

    def execute(self, sql: str, params: tuple = ()):  # noqa: C901
        self.db.statements.append(sql)
        s = " ".join(sql.split())
        m = re.match(r"CREATE TABLE IF NOT EXISTS (\w+) \((.*)\)", s)
        if m:
            self.db.tables.setdefault(m.group(1), [])
            return
        m = re.match(r"INSERT INTO (\w+) \(([^)]*)\) VALUES", s)
        if m:
            cols = [c.strip() for c in m.group(2).split(",")]
            self.db.tables[m.group(1)].append(dict(zip(cols, params)))
            return
        m = re.match(
            r"UPDATE (\w+) SET __valid_until = %s WHERE key = %s "
            r"AND __valid_until = %s", s,
        )
        if m:
            new_until, key, cur_until = params
            for row in self.db.tables[m.group(1)]:
                if row["key"] == key and row["__valid_until"] == cur_until:
                    row["__valid_until"] = new_until
            return
        m = re.match(
            r"UPDATE (\w+) SET __valid_until = %s WHERE __valid_until > %s", s
        )
        if m:
            new_until, above = params
            for row in self.db.tables[m.group(1)]:
                if row["__valid_until"] > above:
                    row["__valid_until"] = new_until
            return
        m = re.match(r"DELETE FROM (\w+) WHERE __valid_from > %s", s)
        if m:
            t = m.group(1)
            self.db.tables[t] = [
                r for r in self.db.tables[t] if r["__valid_from"] <= params[0]
            ]
            return
        m = re.match(r"DELETE FROM (\w+) WHERE (epoch|internal_epoch) > %s", s)
        if m:
            t, col = m.group(1), m.group(2)
            self.db.tables[t] = [
                r for r in self.db.tables[t] if r[col] <= params[0]
            ]
            return
        m = re.match(
            r"SELECT key, payload FROM (\w+) WHERE __valid_from <= %s "
            r"AND __valid_until >= %s AND key = ANY\(%s\)", s,
        )
        if m:
            e1, e2, keys = params
            ks = set(keys)
            self._rows = [
                (r["key"], r["payload"])
                for r in self.db.tables[m.group(1)]
                if r["__valid_from"] <= e1 and r["__valid_until"] >= e2
                and r["key"] in ks
            ]
            return
        m = re.match(
            r"SELECT key, payload FROM (\w+) WHERE __valid_from <= %s "
            r"AND __valid_until >= %s", s,
        )
        if m:
            e1, e2 = params
            self._rows = [
                (r["key"], r["payload"])
                for r in self.db.tables[m.group(1)]
                if r["__valid_from"] <= e1 and r["__valid_until"] >= e2
            ]
            return
        m = re.match(
            r"SELECT key, payload FROM (\w+) WHERE __valid_from = %s", s
        )
        if m:
            self._rows = [
                (r["key"], r["payload"])
                for r in self.db.tables[m.group(1)]
                if r["__valid_from"] == params[0]
            ]
            return
        m = re.match(r"SELECT key FROM (\w+) WHERE __valid_until = %s", s)
        if m:
            self._rows = [
                (r["key"],)
                for r in self.db.tables[m.group(1)]
                if r["__valid_until"] == params[0]
            ]
            return
        m = re.match(r"SELECT root, tree FROM (\w+) WHERE epoch = %s", s)
        if m:
            self._rows = [
                (r["root"], r["tree"])
                for r in self.db.tables[m.group(1)]
                if r["epoch"] == params[0]
            ]
            return
        m = re.match(r"SELECT MAX\(epoch\) FROM (\w+)", s)
        if m:
            rows = self.db.tables[m.group(1)]
            self._rows = [(max((r["epoch"] for r in rows), default=None),)]
            return
        m = re.match(
            r"SELECT internal_epoch FROM (\w+) WHERE user_epoch = %s", s
        )
        if m:
            self._rows = [
                (r["internal_epoch"],)
                for r in self.db.tables[m.group(1)]
                if r["user_epoch"] == params[0]
            ]
            return
        if s.upper().startswith("SELECT"):
            # companion-SQL dialect (parsil executor output): evaluate
            # against the same stored rows the statements above maintain
            from mp2_tpu.ryhope.sqlexec import run_select

            self._rows = run_select(s, params, self.db.tables)
            return
        raise NotImplementedError(f"MockPg cannot execute: {s}")

    def fetchall(self):
        return list(self._rows)
