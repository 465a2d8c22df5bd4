"""Multi-host work queue: dependency-ordered leasing over TCP, worker
failure recovery via lease expiry (the DCN side of the map-reduce prover;
reference discipline: ryhope/src/storage/updatetree.rs workplans +
stateless serialized proof envelopes)."""

import hashlib
import threading

from mp2_tpu.parallel.workqueue import Coordinator, WorkerClient, WorkQueue
from mp2_tpu.ryhope.sbbst import Sbbst
from mp2_tpu.ryhope.updatetree import UpdateTree


def _prove(circuit: str, payload: bytes) -> bytes:
    return hashlib.sha256(circuit.encode() + payload).digest()


def _make_queue(n=15, **kw):
    t = Sbbst(n=n)
    ut = UpdateTree.from_paths(
        [t.ascendance(k) for k in range(1, n + 1, 2)]
    )
    q = WorkQueue(**kw)

    def classify(key):
        l, r = t.children(key)
        kind = "leaf" if l is None and r is None else "node"
        return kind, str(key).encode()

    q.add_update_tree(ut, classify)
    return q, ut


def test_single_worker_drains_in_dependency_order():
    q, ut = _make_queue()
    coord = Coordinator(q)
    seen = []

    def prove(circuit, payload):
        seen.append(payload.decode())
        return _prove(circuit, payload)

    w = WorkerClient(coord.address, "w0")
    done = w.run(prove)
    assert done == len(ut)
    assert q.pending() == 0
    # every parent proved after all its children
    pos = {k: i for i, k in enumerate(seen)}
    for parent, kids in ut.children_map.items():
        for c in kids:
            assert pos[str(c)] < pos[str(parent)]
    # results recorded and deterministic
    res = q.results()
    assert len(res) == len(ut)
    w.close()
    coord.close()


def test_multiple_workers_share_the_queue():
    q, ut = _make_queue(n=31, max_batch=2)
    coord = Coordinator(q)
    counts = {}

    def make_worker(name):
        def run():
            w = WorkerClient(coord.address, name)
            counts[name] = w.run(lambda c, p: _prove(c, p))
            w.close()

        return threading.Thread(target=run)

    threads = [make_worker(f"w{i}") for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert q.pending() == 0
    assert sum(counts.values()) == len(ut)
    coord.close()


def test_dead_worker_lease_requeued():
    """A worker that leases items and dies must not wedge the queue: the
    lease expires and another worker finishes the job."""
    q, ut = _make_queue(lease_timeout=0.2)
    coord = Coordinator(q)

    w0 = WorkerClient(coord.address, "dies")
    w0.run(lambda c, p: _prove(c, p), die_after=3)  # abandons a lease
    w0.close()
    assert q.pending() > 0

    w1 = WorkerClient(coord.address, "finisher")
    w1.run(lambda c, p: _prove(c, p))
    w1.close()
    assert q.pending() == 0
    assert q.stats.requeued >= 1
    coord.close()


def test_duplicate_completion_idempotent():
    q = WorkQueue()
    q.add("a", "leaf", b"x")
    coord = Coordinator(q)
    w = WorkerClient(coord.address, "w")
    [item] = w.lease()
    r = _prove("leaf", b"x")
    assert w.complete("a", r)
    assert w.complete("a", r)          # byte-identical duplicate: ok
    assert not w.complete("a", b"bad")  # conflicting result: rejected
    assert q.stats.rejected == 1
    w.close()
    coord.close()
