"""Query planner: non-existence bracketing, wide lineage, PI layouts."""

from mp2_tpu.circuit.public_inputs import TREE_NODE_LAYOUT, PublicInputLayout
from mp2_tpu.ryhope.sbbst import Sbbst
from mp2_tpu.ryhope.kvdb import MerkleTreeKvDb
from mp2_tpu.vdb.query.planner import find_node_for_non_existence, fetch_row_paths


def _db():
    db = MerkleTreeKvDb(Sbbst(), lambda k, p, c: p)
    db.in_transaction(lambda t: [t.store(k, ("payload", k)) for k in range(100, 106)])
    return db


def test_non_existence_below_and_above():
    db = _db()
    # empty range above all keys -> predecessor = 105
    ne = find_node_for_non_existence(db, 200, 300)
    assert ne is not None and ne.node_key == 105 and ne.is_below
    assert ne.lineage[0] == 105 and ne.lineage[-1] == db.root()
    # empty range below all keys -> successor = 100
    ne2 = find_node_for_non_existence(db, 1, 50)
    assert ne2.node_key == 100 and not ne2.is_below
    # non-empty range -> None
    assert find_node_for_non_existence(db, 101, 104) is None


def test_wide_lineage_and_paths():
    db = _db()
    wl = db.wide_lineage_between(db.epoch, [100, 105])
    assert 100 in wl and 105 in wl and db.root() in wl
    paths = fetch_row_paths(db, [101, 999])
    assert 101 in paths and 999 not in paths
    assert paths[101][-1] == db.root()


def test_pi_layout():
    lay = PublicInputLayout([("a", 2), ("b", 3)])
    pis = lay.build(a=[1, 2], b=[3, 4, 5])
    assert pis == [1, 2, 3, 4, 5]
    assert lay.slice(pis, "b") == [3, 4, 5]
    assert TREE_NODE_LAYOUT.total_len == 41
