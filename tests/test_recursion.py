"""In-circuit recursion: the universal verifier gadget, wrap chain, and
fixed-VK aggregation (counterpart of recursion-framework/src tests).

The fast tier builds the outer verifier circuit for a tiny inner proof and
checks constraint satisfaction (and rejection of tampered proofs) WITHOUT
proving the outer circuit — the outer prove path is exercised by the slow
tier (MP2_SLOW=1) and by demos/bench on real hardware.
"""

import copy
import os

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import test_config
from mp2_tpu.prover.prove import prove
from mp2_tpu.prover.verify import verify
from mp2_tpu.recursion.verifier_gadget import (
    CommonData,
    add_virtual_proof,
    set_proof_witness,
    verify_proof_circuit,
)

P = (1 << 64) - (1 << 32) + 1

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)


@pytest.fixture(scope="module")
def inner():
    cfg = test_config()
    b = CircuitBuilder(cfg)
    xs = b.add_inputs(2)
    h = b.hash_no_pad(xs)
    b.register_public_inputs(h + xs)
    data = b.build()
    vals = [5, 7]
    w = data.generate_witness(dict(zip(xs, vals)))
    pis = list(p2h.hash_no_pad(vals)) + vals
    proof = prove(data, w, pis)
    assert verify(data, proof)
    return data, proof, pis


@pytest.fixture(scope="module")
def outer(inner):
    data, proof, pis = inner
    common = CommonData.of(data)
    b = CircuitBuilder(data.config)
    pt = add_virtual_proof(b, common)
    cap = [[b.constant(int(v)) for v in row] for row in data.fixed_cap_host]
    verify_proof_circuit(b, common, pt, cap)
    b.register_public_inputs(pt.public_inputs)
    return b.build(), pt


def test_verifier_gadget_accepts_valid_proof(outer, inner):
    data, proof, pis = inner
    outer_data, pt = outer
    inputs = {}
    set_proof_witness(inputs, pt, proof)
    w = outer_data.generate_witness(inputs)
    # every constraint of the in-circuit verifier is satisfied
    outer_data.check_witness(w, pis)


def test_verifier_gadget_rejects_tampered_opening(outer, inner):
    data, proof, pis = inner
    outer_data, pt = outer
    bad = copy.deepcopy(proof)
    a, b_ = bad.openings.wires[0]
    bad.openings.wires[0] = ((a + 1) % P, b_)
    inputs = {}
    set_proof_witness(inputs, pt, bad)
    with pytest.raises((ValueError, AssertionError)):
        w = outer_data.generate_witness(inputs)
        outer_data.check_witness(w, pis)


def test_verifier_gadget_rejects_wrong_public_inputs(outer, inner):
    data, proof, pis = inner
    outer_data, pt = outer
    bad_pis = list(pis)
    bad_pis[4] = 99  # claim a different preimage
    inputs = {}
    set_proof_witness(inputs, pt, proof)
    for t, v in zip(pt.public_inputs, bad_pis):
        inputs[t] = v
    with pytest.raises((ValueError, AssertionError)):
        w = outer_data.generate_witness(inputs)
        outer_data.check_witness(w, bad_pis)


def test_verifier_gadget_rejects_shortened_fri(outer, inner):
    """Removing a fold step breaks the witness structure (shape is fixed by
    the circuit; a malleable-shape attack cannot be expressed at all)."""
    data, proof, pis = inner
    outer_data, pt = outer
    bad = copy.deepcopy(proof)
    for qr in bad.fri.query_rounds:
        qr.steps = []
    inputs = {}
    with pytest.raises((AssertionError, IndexError, ValueError)):
        set_proof_witness(inputs, pt, bad)
        w = outer_data.generate_witness(inputs)
        outer_data.check_witness(w, pis)


def test_fast_tier_real_outer_prove():
    """FAST-TIER real recursive prove (VERDICT r3 weak #4 / item 8): the
    in-circuit verifier of a real inner proof is itself PROVEN and
    verified — at a minimal FRI shape (2 query rounds) so the whole
    round trip stays ~1-2 min on CPU with a warm compile cache.  A
    prover regression can no longer pass the default suite on
    witness-satisfaction alone."""
    from mp2_tpu.prover.fri import FriConfig

    cfg = test_config(
        fri=FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=2,
                      num_query_rounds=2)
    )
    b = CircuitBuilder(cfg)
    xs = b.add_inputs(2)
    h = b.hash_no_pad(xs)
    b.register_public_inputs(h + xs)
    data = b.build()
    vals = [5, 7]
    w = data.generate_witness(dict(zip(xs, vals)))
    pis = list(p2h.hash_no_pad(vals)) + vals
    inner_proof = prove(data, w, pis)
    assert verify(data, inner_proof)

    common = CommonData.of(data)
    b2 = CircuitBuilder(cfg)
    pt = add_virtual_proof(b2, common)
    cap = [[b2.constant(int(v)) for v in row] for row in data.fixed_cap_host]
    verify_proof_circuit(b2, common, pt, cap)
    b2.register_public_inputs(pt.public_inputs)
    od = b2.build()
    inputs = {}
    set_proof_witness(inputs, pt, inner_proof)
    w2 = od.generate_witness(inputs)
    outer_proof = prove(od, w2, pis)  # REAL outer prove
    assert verify(od, outer_proof)
    # tampering with the outer proof's claimed PIs must fail verification
    bad = copy.deepcopy(outer_proof)
    bad.public_inputs = [pis[0] + 1] + pis[1:]
    assert not verify(od, bad)


@slow
def test_fixed_vk_two_leaf_aggregation():
    """End-to-end: two leaf proofs aggregated under one fixed VK, the
    aggregation proof itself wrapped to the standard shape and verified by
    ONE host check (BASELINE config 3 shape, reduced arity for CPU)."""
    from mp2_tpu.recursion.runtime import RecursionFramework

    cfg = test_config()
    fw = RecursionFramework(cfg, num_user_pis=4, set_height=2)

    def leaf_build(b):
        x = b.add_input()
        h = b.hash_no_pad([x])
        b.register_public_inputs(h)

        def assign(inputs, xv):
            inputs[x] = xv

        return assign

    def agg_build(b, children):
        l = children[0].public_inputs()[:4]
        r = children[1].public_inputs()[:4]
        h = b.hash_no_pad(l + r)
        b.register_public_inputs(h)
        return None

    fw.add_leaf_circuit("leaf", leaf_build)
    fw.add_aggregation_circuit("node", 2, agg_build)
    vk = fw.finalize()

    e1 = fw.prove_leaf("leaf", (11,), list(p2h.hash_no_pad([11])))
    e2 = fw.prove_leaf("leaf", (22,), list(p2h.hash_no_pad([22])))
    expected = p2h.hash_no_pad(
        list(p2h.hash_no_pad([11])) + list(p2h.hash_no_pad([22]))
    )
    agg = fw.prove_aggregation("node", [e1, e2], (), list(expected))
    assert fw.verify(agg)
    assert tuple(agg.proof.public_inputs[-4:]) == vk

    bad = copy.deepcopy(agg)
    bad.proof.public_inputs[0] = (bad.proof.public_inputs[0] + 1) % P
    assert not fw.verify(bad)


@slow
def test_fixed_vk_production_config():
    """The fixed-VK recursion stack at the PRODUCTION CircuitConfig
    (rate 1/8, cap_height 4, 28 FRI query rounds, 16 PoW bits — the
    reference's standard recursion shape, recursion-framework/src/
    universal_verifier_gadget/mod.rs:34-90): discover the standard wrap
    shape, prove one leaf + one 2-child aggregation, host-verify, and
    record circuit sizes + prove times."""
    import time

    from mp2_tpu.prover.config import CircuitConfig
    from mp2_tpu.recursion.runtime import RecursionFramework

    cfg = CircuitConfig()  # production FRI soundness
    assert cfg.fri.num_query_rounds == 28 and cfg.fri.cap_height == 4
    t0 = time.perf_counter()
    fw = RecursionFramework(cfg, num_user_pis=4, set_height=2)

    def leaf_build(b):
        x = b.add_input()
        h = b.hash_no_pad([x])
        b.register_public_inputs(h)

        def assign(inputs, xv):
            inputs[x] = xv

        return assign

    def agg_build(b, children):
        l = children[0].public_inputs()[:4]
        r = children[1].public_inputs()[:4]
        h = b.hash_no_pad(l + r)
        b.register_public_inputs(h)
        return None

    fw.add_leaf_circuit("leaf", leaf_build)
    fw.add_aggregation_circuit("node", 2, agg_build)
    vk = fw.finalize()
    t_build = time.perf_counter() - t0
    sizes = {
        name: fw.members[name].data.n for name in ("leaf", "node")
    } if hasattr(fw, "members") else {}

    t0 = time.perf_counter()
    e1 = fw.prove_leaf("leaf", (11,), list(p2h.hash_no_pad([11])))
    t_leaf = time.perf_counter() - t0
    e2 = fw.prove_leaf("leaf", (22,), list(p2h.hash_no_pad([22])))
    expected = p2h.hash_no_pad(
        list(p2h.hash_no_pad([11])) + list(p2h.hash_no_pad([22]))
    )
    t0 = time.perf_counter()
    agg = fw.prove_aggregation("node", [e1, e2], (), list(expected))
    t_agg = time.perf_counter() - t0
    assert fw.verify(agg)
    assert tuple(agg.proof.public_inputs[-4:]) == vk

    bad = copy.deepcopy(agg)
    bad.proof.public_inputs[0] = (bad.proof.public_inputs[0] + 1) % P
    assert not fw.verify(bad)
    print(
        f"PRODUCTION shape: build {t_build:.0f}s sizes={sizes} "
        f"leaf prove {t_leaf:.1f}s agg prove {t_agg:.1f}s"
    )


@slow
def test_fixed_vk_sixteen_leaf_aggregation():
    """BASELINE config 3: SIXTEEN leaf proofs aggregated in a binary tree
    (8 -> 4 -> 2 -> 1) under ONE fixed VK — every proof in the tree wraps
    to the same standard shape, carries the same circuit-set digest, and
    the root verifies with one host check."""
    import time

    from mp2_tpu.recursion.runtime import RecursionFramework

    cfg = test_config()
    fw = RecursionFramework(cfg, num_user_pis=4, set_height=2)

    def leaf_build(b):
        x = b.add_input()
        h = b.hash_no_pad([x])
        b.register_public_inputs(h)

        def assign(inputs, xv):
            inputs[x] = xv

        return assign

    def agg_build(b, children):
        l = children[0].public_inputs()[:4]
        r = children[1].public_inputs()[:4]
        h = b.hash_no_pad(l + r)
        b.register_public_inputs(h)
        return None

    fw.add_leaf_circuit("leaf", leaf_build)
    fw.add_aggregation_circuit("node", 2, agg_build)
    vk = fw.finalize()

    t0 = time.perf_counter()
    level = []
    vals = []
    for i in range(16):
        h = list(p2h.hash_no_pad([i]))
        level.append(fw.prove_leaf("leaf", (i,), h))
        vals.append(h)
    n_proofs = 16
    while len(level) > 1:
        nxt, nvals = [], []
        for j in range(0, len(level), 2):
            hv = list(p2h.hash_no_pad(vals[j] + vals[j + 1]))
            nxt.append(
                fw.prove_aggregation("node", [level[j], level[j + 1]], (), hv)
            )
            nvals.append(hv)
            n_proofs += 1
        level, vals = nxt, nvals
    dt = time.perf_counter() - t0

    root = level[0]
    assert fw.verify(root)
    # the fixed-VK property: every proof in the tree has the SAME shape and
    # trailing circuit-set digest
    assert tuple(root.proof.public_inputs[-4:]) == vk
    assert root.user_inputs[:4] == vals[0]
    print(f"aggregated 16 leaves -> 1 root: {n_proofs} proofs in {dt:.1f}s "
          f"({n_proofs / dt:.2f} proofs/s)")


@slow
def test_batched_framework_proving_matches_serial():
    """prove_leaves_batch / prove_aggregations_batch: every stage (member
    + each wrap level) runs B witnesses per dispatch; proofs are
    BIT-IDENTICAL to the serial path."""
    from mp2_tpu.prover.serde import proof_to_dict
    from mp2_tpu.recursion.runtime import RecursionFramework

    cfg = test_config()
    fw = RecursionFramework(cfg, num_user_pis=4, set_height=2)

    def leaf_build(b):
        x = b.add_input()
        h = b.hash_no_pad([x])
        b.register_public_inputs(h)

        def assign(inputs, xv):
            inputs[x] = xv

        return assign

    def agg_build(b, children):
        l = children[0].public_inputs()[:4]
        r = children[1].public_inputs()[:4]
        h = b.hash_no_pad(l + r)
        b.register_public_inputs(h)
        return None

    fw.add_leaf_circuit("leaf", leaf_build)
    fw.add_aggregation_circuit("node", 2, agg_build)
    fw.finalize()

    vals = [7, 8, 9, 10]
    hs = [list(p2h.hash_no_pad([v])) for v in vals]
    serial = [fw.prove_leaf("leaf", (v,), h) for v, h in zip(vals, hs)]
    batched = fw.prove_leaves_batch(
        "leaf", [(v,) for v in vals], hs
    )
    assert all(fw.verify(e) for e in batched)
    for s, b_ in zip(serial, batched):
        assert proof_to_dict(s.proof) == proof_to_dict(b_.proof)

    # one reduce level, batched
    h01 = list(p2h.hash_no_pad(hs[0] + hs[1]))
    h23 = list(p2h.hash_no_pad(hs[2] + hs[3]))
    serial_agg = fw.prove_aggregation("node", [serial[0], serial[1]], (), h01)
    batched_aggs = fw.prove_aggregations_batch(
        "node",
        [[batched[0], batched[1]], [batched[2], batched[3]]],
        [(), ()],
        [h01, h23],
    )
    assert all(fw.verify(e) for e in batched_aggs)
    assert proof_to_dict(serial_agg.proof) == proof_to_dict(
        batched_aggs[0].proof
    )
