"""Results-tree construction + binding circuits vs the host golden model
(reference: verifiable-db/src/results_tree/ — feature-gated off upstream,
lib.rs:24-25; gated here behind MP2_RESULTS_TREE for the prove tier).

Fast tier: every circuit body run standalone with child PIs as witness
targets, outputs checked bit-for-bit against the host model.
MP2_RESULTS_TREE tier: the full fixture tree proven through the recursive
sets (record -> rows nodes -> index nodes -> root -> binding), every
envelope host-verified.
"""

import os

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import test_config
from mp2_tpu.vdb import results_tree as R

slow = pytest.mark.skipif(
    not os.environ.get("MP2_RESULTS_TREE"),
    reason="set MP2_RESULTS_TREE=1 for the prove-heavy results-tree tier",
)

P = R.ResultsParams(num_items=4)
IDS = [71, 72, 73, 74]


def _rec(primary, secondary, extra, mult=1, n=None):
    vals = [primary, secondary] + list(extra)
    return R.Record(item_values=vals, ids=IDS,
                    num_included=n if n is not None else len(vals),
                    multiplicity=mult)


class _Stub:
    def __init__(self, b):
        self.targets = b.add_inputs(P.pi_width)

    def public_inputs(self):
        return list(self.targets)

    def assign(self, inputs, values):
        assert len(values) == P.pi_width
        for t, v in zip(self.targets, values):
            inputs[t] = int(v)


def _run(b, inputs, pis):
    data = b.build()
    w = data.generate_witness(inputs)
    data.check_witness(w, pis)


@pytest.mark.parametrize("no_dup", [False, True])
@pytest.mark.parametrize("in_leaf", [False, True])
def test_record_circuit_matches_host(no_dup, in_leaf):
    rec = _rec(1000, 55, [7, 8], mult=3)
    b = CircuitBuilder(test_config())
    assign = R._build_record(b, P, no_dup)
    inputs = {}
    assign(inputs, rec, in_leaf, 4)
    pis = R.host_record_pis(P, rec, in_leaf, 4, no_dup)
    _run(b, inputs, pis)


def test_record_partial_items_and_multiplicity():
    # only 3 of 4 items included; multiplicity scales the accumulator
    rec = _rec(1000, 55, [7, 0], mult=5, n=3)
    b = CircuitBuilder(test_config())
    assign = R._build_record(b, P, True)
    inputs = {}
    assign(inputs, rec, True, 1)
    pis = R.host_record_pis(P, rec, True, 1, True)
    _run(b, inputs, pis)
    # the accumulator really is mult * base (host cross-check)
    base = R.host_record_pis(P, _rec(1000, 55, [7, 0], mult=1, n=3),
                             True, 1, True)
    acc = R._pis_fields(P, pis)["acc"]
    acc1 = R._pis_fields(P, base)["acc"]
    assert acc.to_fields() == acc1.scalar_mul(5).to_fields()


def test_record_no_dup_rejects_nonzero_excluded_item():
    rec = _rec(1000, 55, [7, 9], n=3)  # item 3 excluded but nonzero
    b = CircuitBuilder(test_config())
    assign = R._build_record(b, P, True)
    inputs = {}
    assign(inputs, rec, True, 1)
    pis = R.host_record_pis(P, rec, True, 1, True)
    data = b.build()
    # the violated constraint surfaces either as a witness-generation
    # conflict (connected targets computed differently) or a check failure
    with pytest.raises((AssertionError, ValueError)):
        data.check_witness(data.generate_witness(inputs), pis)


def test_results_leaf_matches_host():
    sub = R.host_record_pis(P, _rec(1000, 55, [7, 8]), True, 1, False)
    b = CircuitBuilder(test_config())
    s = _Stub(b)
    R._build_results_leaf(b, P, [s])
    inputs = {}
    s.assign(inputs, sub)
    _run(b, inputs, R.host_leaf_pis(P, sub))


@pytest.mark.parametrize("is_rows,is_left", [
    (True, True), (True, False), (False, True), (False, False),
])
def test_one_child_matches_host(is_rows, is_left):
    no_dup = True
    if is_rows:
        # same primary; child strictly below/above on the secondary
        sub = R.host_record_pis(P, _rec(1000, 50, [7, 8]), False, 2, no_dup)
        cv = 40 if is_left else 60
        child = R.host_record_pis(
            P, _rec(1000, cv, [9, 10]), True, 1 if is_left else 3, no_dup)
    else:
        # index tree: child is a wrapped rows-tree root, strict primary order
        subrec = R.host_record_pis(P, _rec(1000, 50, [7, 8]), True, 2, no_dup)
        sub = subrec
        cp = 900 if is_left else 1100
        child = R.host_leaf_pis(P, R.host_record_pis(
            P, _rec(cp, 50, [7, 8]), True, 1 if is_left else 3, no_dup))
    b = CircuitBuilder(test_config())
    s, c = _Stub(b), _Stub(b)
    assign = R._build_results_one_child(b, P, [s, c])
    inputs = {}
    assign(inputs, is_rows, is_left)
    s.assign(inputs, sub)
    c.assign(inputs, child)
    _run(b, inputs, R.host_one_child_pis(P, sub, child, is_rows, is_left))


@pytest.mark.parametrize("is_rows", [True, False])
def test_two_children_matches_host(is_rows):
    no_dup = False
    if is_rows:
        sub = R.host_record_pis(P, _rec(1000, 50, [7, 8]), False, 2, no_dup)
        c1 = R.host_record_pis(P, _rec(1000, 40, [1, 2]), True, 1, no_dup)
        c2 = R.host_record_pis(P, _rec(1000, 60, [3, 4]), True, 3, no_dup)
    else:
        sub = R.host_record_pis(P, _rec(1000, 50, [7, 8]), True, 2, no_dup)
        c1 = R.host_leaf_pis(P, R.host_record_pis(
            P, _rec(900, 50, [1, 2]), True, 1, no_dup))
        c2 = R.host_leaf_pis(P, R.host_record_pis(
            P, _rec(1100, 50, [3, 4]), True, 3, no_dup))
    b = CircuitBuilder(test_config())
    s, l, r = _Stub(b), _Stub(b), _Stub(b)
    assign = R._build_results_two_children(b, P, [s, l, r])
    inputs = {}
    assign(inputs, is_rows)
    s.assign(inputs, sub)
    l.assign(inputs, c1)
    r.assign(inputs, c2)
    _run(b, inputs, R.host_two_children_pis(P, sub, c1, c2, is_rows))


def test_one_child_rejects_wrong_counter_chain():
    no_dup = True
    sub = R.host_record_pis(P, _rec(1000, 50, [7, 8]), False, 2, no_dup)
    # child counter NOT consecutive (max 5 != sub.min 2 - 1)
    child = R.host_record_pis(P, _rec(1000, 40, [9, 10]), True, 5, no_dup)
    b = CircuitBuilder(test_config())
    s, c = _Stub(b), _Stub(b)
    assign = R._build_results_one_child(b, P, [s, c])
    inputs = {}
    assign(inputs, True, True)
    s.assign(inputs, sub)
    c.assign(inputs, child)
    data = b.build()
    with pytest.raises((AssertionError, ValueError)):
        data.check_witness(
            data.generate_witness(inputs),
            R.host_one_child_pis(P, sub, child, True, True),
        )


def test_duplicate_records_rejected_in_no_dup_mode():
    """Two records with equal secondary AND equal items under DISTINCT must
    not aggregate (node_with_one_child.rs items ordering constraints)."""
    no_dup = True
    sub = R.host_record_pis(P, _rec(1000, 50, [7, 8]), False, 2, no_dup)
    child = R.host_record_pis(P, _rec(1000, 50, [7, 8]), True, 1, no_dup)
    b = CircuitBuilder(test_config())
    s, c = _Stub(b), _Stub(b)
    assign = R._build_results_one_child(b, P, [s, c])
    inputs = {}
    assign(inputs, True, True)
    s.assign(inputs, sub)
    c.assign(inputs, child)
    data = b.build()
    with pytest.raises((AssertionError, ValueError)):
        data.check_witness(
            data.generate_witness(inputs),
            R.host_one_child_pis(P, sub, child, True, True))


def test_binding_expected_host_shapes():
    root = R.host_record_pis(P, _rec(1000, 50, [7, 8]), True, 1, True)
    acc = R._pis_fields(P, root)["acc"]
    q = R.binding_query_slice([1, 2, 3, 4], acc, [5, 6, 7, 8],
                              [9, 10, 11, 12], 100, 200, 0)
    out = R.binding_expected(P, root, q)
    assert out[0:4] == [int(v) for v in root[0:4]]
    assert out[4:8] == [1, 2, 3, 4]
    assert out[8:12] == list(
        p2h.hash_no_pad([R.RESULT_WITH_DISTINCT, 5, 6, 7, 8]))
    assert out[16] == 1 and out[17] == 0


# ---------------------------------------------------------------------------
# prove tier: the full fixture through the recursive sets
# ---------------------------------------------------------------------------


@slow
def test_results_tree_full_fixture_proves():
    """primaries {10: [r1], 20: [r2, r3]} built, proven node by node, and
    bound to a consistent query slice — every envelope host-verified."""
    cfg = test_config()
    rc = R.ResultsTreeCircuits(cfg, P)
    no_dup = True

    r1 = _rec(10, 5, [1, 2])
    r2 = _rec(20, 5, [3, 4])
    r3 = _rec(20, 7, [5, 6])

    # rows tree of primary 10: single record stored in leaf (counter 1)
    p1 = R.host_record_pis(P, r1, True, 1, no_dup)
    e1 = rc.construction.prove_leaf("record_no_dup", (r1, True, 1), p1)
    # index-tree leaf wrapping it
    pl1 = R.host_leaf_pis(P, p1)
    el1 = rc.construction.prove_aggregation("results_leaf", [e1], (), pl1)

    # rows tree of primary 20: r3 (counter 3) over left child r2 (counter 2)
    p2 = R.host_record_pis(P, r2, True, 2, no_dup)
    e2 = rc.construction.prove_leaf("record_no_dup", (r2, True, 2), p2)
    p3 = R.host_record_pis(P, r3, False, 3, no_dup)
    e3 = rc.construction.prove_leaf("record_no_dup", (r3, False, 3), p3)
    prows = R.host_one_child_pis(P, p3, p2, True, True)
    erows = rc.construction.prove_aggregation(
        "results_one_child", [e3, e2], (True, True), prows)

    # index root: rows tree of 20 with the primary-10 leaf on the left
    proot = R.host_one_child_pis(P, prows, pl1, False, True)
    eroot = rc.construction.prove_aggregation(
        "results_one_child", [erows, el1], (False, True), proot)

    for env in (e1, el1, e2, e3, erows, eroot):
        assert rc.construction.verify(env)

    f = R._pis_fields(P, proot)
    assert f["min_cnt"] == 1 and f["max_cnt"] == 3
    assert f["mn"] == 10 and f["mx"] == 20

    q = R.binding_query_slice([11, 12, 13, 14], f["acc"],
                              [21, 22, 23, 24], [31, 32, 33, 34],
                              1, 100, 0)
    pb = R.binding_expected(P, proot, q)
    eb = rc.binding.prove_aggregation("binding", [], (q,), pb,
                                      foreign_children=[eroot])
    assert rc.binding.verify(eb)
    assert pb[16] == 3  # COUNT(DISTINCT *) = 3 records
