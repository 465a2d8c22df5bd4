"""ryhope equivalents: sbbst shape, scapegoat balance, updatetree workplans,
epoch-versioned KV-DB with aggregation."""

import random

from mp2_tpu.ryhope.kvdb import MerkleTreeKvDb
from mp2_tpu.ryhope.sbbst import Sbbst
from mp2_tpu.ryhope.scapegoat import Scapegoat
from mp2_tpu.ryhope.updatetree import UpdateTree

rng = random.Random(17)


# --- sbbst ------------------------------------------------------------------


def _check_bst(tree, keys):
    """parent/children consistency + BST ordering + connectivity."""
    keys = sorted(keys)
    root = tree.root() if callable(tree.root) else tree.root
    seen = []

    def visit(k, lo, hi):
        if k is None:
            return
        assert (lo is None or k > lo) and (hi is None or k < hi), k
        l, r = tree.children(k)
        if l is not None:
            assert tree.parent(l) == k
        if r is not None:
            assert tree.parent(r) == k
        visit(l, lo, k)
        seen.append(k)
        visit(r, k, hi)

    visit(root, None, None)
    assert seen == keys


def test_sbbst_shapes():
    for n in [1, 2, 3, 4, 5, 6, 7, 8, 15, 16, 17, 33]:
        t = Sbbst(n=n)
        _check_bst(t, range(1, n + 1))
        # balanced: depth <= log2(n) + 1
        for k in range(1, n + 1):
            assert t.depth_inner(k) <= n.bit_length()


def test_sbbst_append_dirtied():
    t = Sbbst()
    for k in range(1, 20):
        dirtied = t.insert(k)
        assert dirtied[0] == k
        assert dirtied == t.ascendance(k)
        assert dirtied[-1] == t.root()


def test_sbbst_shift():
    t = Sbbst()
    t.insert(100)  # genesis block 100
    t.insert(101)
    t.insert(102)
    assert t.root() == 101
    assert sorted(t.keys()) == [100, 101, 102]
    _check_bst(t, [100, 101, 102])


# --- scapegoat --------------------------------------------------------------


def test_scapegoat_insert_balance():
    t = Scapegoat(alpha=0.8)
    keys = list(range(100))  # worst case: sorted inserts
    for k in keys:
        t.insert(k)
    _check_bst(t, keys)
    # alpha-balanced: depth bounded
    max_depth = max(len(t.ascendance(k)) - 1 for k in keys)
    import math

    assert max_depth <= math.log(100) / math.log(1 / 0.8) + 2


def test_scapegoat_random_ops():
    t = Scapegoat(alpha=0.8)
    present = set()
    for _ in range(300):
        if present and rng.random() < 0.3:
            k = rng.choice(sorted(present))
            t.remove(k)
            present.discard(k)
        else:
            k = rng.randrange(10_000)
            if k not in present:
                t.insert(k)
                present.add(k)
        assert t.size() == len(present)
    _check_bst(t, present)


def test_scapegoat_deterministic():
    ops = [("i", rng.randrange(1000)) for _ in range(50)]
    t1, t2 = Scapegoat(0.8), Scapegoat(0.8)
    for _, k in ops:
        if not t1.contains(k):
            t1.insert(k)
            t2.insert(k)
    assert t1.root == t2.root
    for k in t1.keys():
        assert t1.children(k) == t2.children(k)


# --- updatetree -------------------------------------------------------------


def test_workplan_order():
    t = Sbbst(n=7)
    dirtied = [1, 3, 5]
    paths = [t.ascendance(k) for k in dirtied]
    ut = UpdateTree.from_paths(paths)
    assert ut.root == t.root() == 4
    order = list(ut.into_workplan())
    pos = {k: i for i, k in enumerate(order)}
    for k in ut.keys():
        p = ut.parent_map[k]
        if p is not None:
            assert pos[k] < pos[p], "child must precede parent"
    assert set(order) == {1, 2, 3, 4, 5, 6}


def test_workplan_batches():
    t = Sbbst(n=15)
    paths = [t.ascendance(k) for k in [1, 3, 5, 7, 9, 11, 13, 15]]
    ut = UpdateTree.from_paths(paths)
    plan = ut.into_workplan()
    levels = []
    while not plan.completed():
        batch = plan.next_ready()
        levels.append(sorted(batch))
        for k in batch:
            plan.done(k)
    assert levels[0] == [1, 3, 5, 7, 9, 11, 13, 15]
    assert levels[-1] == [8]


# --- kvdb -------------------------------------------------------------------


def _sum_aggregate(key, payload, children):
    own, _ = payload
    total = own + sum(c[1] for c in children if c is not None)
    return (own, total)


def test_kvdb_epochs_and_aggregation():
    db = MerkleTreeKvDb(Sbbst(), _sum_aggregate)

    def tx0(tx):
        for k in [1, 2, 3]:
            tx.store(k, (k * 10, 0))

    ut = db.in_transaction(tx0)
    assert db.epoch == 0
    root = db.root()
    assert db.payload(root)[1] == 60  # total of all
    assert set(ut.keys()) >= {1, 2, 3}

    def tx1(tx):
        tx.store(4, (40, 0))

    ut = db.in_transaction(tx1)
    assert db.epoch == 1
    assert db.payload(db.root())[1] == 100
    # epoch 0 view unchanged
    v0 = db.view_at(0)
    assert v0.payload(v0.root())[1] == 60
    assert v0.size() == 3 and db.size() == 4

    # update a leaf value at epoch 2
    db.in_transaction(lambda tx: tx.store(1, (11, 0)))
    assert db.payload(db.root())[1] == 101

    db.rollback_to(1)
    assert db.payload(db.root())[1] == 100


def test_kvdb_scapegoat_removal():
    db = MerkleTreeKvDb(Scapegoat(0.8), _sum_aggregate)

    def tx0(tx):
        for k in range(10):
            tx.store(k, (k, 0))

    db.in_transaction(tx0)
    assert db.payload(db.root())[1] == sum(range(10))

    db.in_transaction(lambda tx: tx.remove(5))
    assert db.payload(db.root())[1] == sum(range(10)) - 5
    assert not db.contains(5)
    assert db.size() == 9
