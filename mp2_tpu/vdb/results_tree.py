"""Results-tree circuit family: construction + binding.

The one circuit family of the reference with no counterpart until round 5
(/root/reference/verifiable-db/src/results_tree/, ~3.1k LoC) — feature-gated
OFF by default upstream (verifiable-db/src/lib.rs:24-25) and mirrored here
behind the `MP2_RESULTS_TREE` test flag.

A *results tree* materializes the result set of a non-aggregated
(`SELECT ... [DISTINCT]`, ops[0] == ID) query as its own two-level tree:
an index tree over the primary-indexed output item where each node embeds a
rows tree over the secondary output item, exactly like the main DB tree.
The construction set proves the tree was built from the records the query
accumulated; the binding circuit ties the construction root to the query
proof (same accumulator digest) and re-exposes the computational /
placeholder hashes.

Members (reference file in parens):
  record_dup        — construction/results_tree_with_duplicates.rs
  record_no_dup     — construction/results_tree_without_duplicates.rs
                      (multiplicity scalar-mul + zero-item constraints)
  results_leaf      — construction/leaf_node.rs (index-tree leaf wrapping
                      a rows-tree root)
  results_one_child — construction/node_with_one_child.rs
  results_two_children — construction/node_with_two_children.rs
  binding           — binding/binding_results.rs (upstream has NO recursive
                      API wiring for it — binding_results.rs:95-96 TODO —
                      so, like upstream's tests, the query proof arrives as
                      a witnessed PI slice; the construction root IS
                      verified in-circuit through the cross-set gadget)

PI layout of the construction set (construction/public_inputs.rs), with
S = params.num_items and u256 = 8 big-endian u32 limbs:
  h(4) | min_value(8) | max_value(8) | min_items(8(S-2)) | max_items(8(S-2))
  | min_counter | max_counter | primary_index_value(8) | index_ids(2)
  | no_duplicates | accumulator(11)
The [u256; S-2] item arrays are ordered with item[L-1] most significant
(the reference's little-endian item concatenation, mp2-common/src/u256.rs:
194-204).

Binding PI layout (binding/public_inputs.rs):
  results_tree_hash(4) | original_tree_hash(4) | computational_hash(4)
  | placeholder_hash(4) | entry_count | overflow
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from mp2_tpu.circuit.builder import CircuitBuilder, Target
from mp2_tpu.circuit.gadgets.curve import (
    CurveTarget,
    curve_add,
    curve_from_pi_targets,
    curve_select,
    curve_to_pi_targets,
    curve_zero,
    map_to_curve_point_circuit,
)
from mp2_tpu.circuit.gadgets.u256 import (
    U256Target,
    add_virtual_u256,
    set_u256,
    u256_equal,
    u256_is_zero,
    u256_less_than,
    u256_select,
)
from mp2_tpu.field.ecgfp5 import Point
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover.config import CircuitConfig
from mp2_tpu.ryhope.sbbst import Sbbst
from mp2_tpu.utils.u256 import u256_to_fields
from mp2_tpu.vdb import digests as D
from mp2_tpu.vdb.query.ops import AggregationOperation

EMPTY = list(D.EMPTY_HASH)

# scheme-local identifiers folded into the computational hash by the
# binding circuit (reference ResultIdentifier::{ResultNoDistinct,
# ResultWithDistinct}, computational_hash_ids.rs:732-736; the numeric
# values are scheme-internal there too)
RESULT_NO_DISTINCT = 101
RESULT_WITH_DISTINCT = 102


@dataclass(frozen=True)
class ResultsParams:
    """S = maximum number of output items per record (reference const S)."""

    num_items: int = 4

    @property
    def pi_width(self) -> int:
        s = self.num_items
        return 4 + 8 + 8 + 8 * (s - 2) + 8 * (s - 2) + 1 + 1 + 8 + 2 + 1 + 11


# query-proof slice the binding circuit consumes (the subset of the
# reference's old_public_inputs.rs the binding actually touches):
#   tree_hash(4) | ops0 | first_output_as_curve(11) | comp(4) | ph(4)
#   | min_query(8) | max_query(8) | overflow
BINDING_QUERY_SLICE = 4 + 1 + 11 + 4 + 4 + 8 + 8 + 1

BINDING_PI_WIDTH = 4 + 4 + 4 + 4 + 1 + 1


# ---------------------------------------------------------------------------
# PI parse helpers
# ---------------------------------------------------------------------------


@dataclass
class _ResPis:
    h: List[Target]
    mn: U256Target
    mx: U256Target
    min_items: List[U256Target]
    max_items: List[U256Target]
    min_cnt: Target
    max_cnt: Target
    primary: U256Target
    index_ids: List[Target]
    no_dup: Target
    acc: CurveTarget

    @staticmethod
    def parse(b, p: ResultsParams, pis: Sequence[Target]) -> "_ResPis":
        s = p.num_items
        o = 4

        def u256():
            nonlocal o
            t = U256Target(tuple(pis[o : o + 8]))
            o += 8
            return t

        mn, mx = u256(), u256()
        min_items = [u256() for _ in range(s - 2)]
        max_items = [u256() for _ in range(s - 2)]
        min_cnt, max_cnt = pis[o], pis[o + 1]
        o += 2
        primary = U256Target(tuple(pis[o : o + 8]))
        o += 8
        index_ids = list(pis[o : o + 2])
        o += 2
        no_dup = pis[o]
        o += 1
        acc = curve_from_pi_targets(b, pis[o : o + 11])
        return _ResPis(
            h=list(pis[0:4]), mn=mn, mx=mx, min_items=min_items,
            max_items=max_items, min_cnt=min_cnt, max_cnt=max_cnt,
            primary=primary, index_ids=index_ids, no_dup=no_dup, acc=acc,
        )


def _register(b, p: ResultsParams, h, mn, mx, min_items, max_items,
              min_cnt, max_cnt, primary, index_ids, no_dup, acc):
    pis = (
        list(h) + list(mn.limbs) + list(mx.limbs)
        + [l for it in min_items for l in it.limbs]
        + [l for it in max_items for l in it.limbs]
        + [min_cnt, max_cnt] + list(primary.limbs) + list(index_ids)
        + [no_dup] + curve_to_pi_targets(b, acc)
    )
    assert len(pis) == p.pi_width
    b.register_public_inputs(pis)


def results_pi_values(p: ResultsParams, h, mn: int, mx: int,
                      min_items: Sequence[int], max_items: Sequence[int],
                      min_cnt: int, max_cnt: int, primary: int,
                      index_ids: Sequence[int], no_dup: bool,
                      acc: Point) -> List[int]:
    vals = (
        list(h) + u256_to_fields(mn) + u256_to_fields(mx)
        + [f for v in min_items for f in u256_to_fields(v)]
        + [f for v in max_items for f in u256_to_fields(v)]
        + [min_cnt, max_cnt] + u256_to_fields(primary)
        + [int(i) for i in index_ids] + [1 if no_dup else 0]
        + acc.to_fields()
    )
    assert len(vals) == p.pi_width
    return [int(v) for v in vals]


# ---------------------------------------------------------------------------
# shared gadgets
# ---------------------------------------------------------------------------


def _bool_input(b) -> Target:
    t = b.add_input()
    b.connect(b.mul(t, t), t)
    return t


def _u256_arr_lt_eq(b, xs: Sequence[U256Target], ys: Sequence[U256Target]):
    """(xs < ys, xs == ys) under the item-array order: item[L-1] most
    significant (mp2-common/src/u256.rs:561-585 semantics)."""
    lt = b.zero()
    eq = b.one()
    for x, y in zip(reversed(list(xs)), reversed(list(ys))):
        lt_i = u256_less_than(b, x, y)
        eq_i = u256_equal(b, x, y)
        lt = b.logic_or(lt, b.logic_and(eq, lt_i))
        eq = b.logic_and(eq, eq_i)
    return lt, eq


def _u256_arr_select(b, bit, xs, ys):
    return [u256_select(b, bit, x, y) for x, y in zip(xs, ys)]


def _items_cells_tree(b, values: Sequence[U256Target], ids: Sequence[Target],
                      included: Sequence[Target]) -> List[Target]:
    """In-circuit complete-BST hash over up to len(values) items with
    inclusion flags — absent node propagates its left child's hash
    (query/universal_circuit/cells.rs:38-101)."""
    empty = [b.constant(v) for v in EMPTY]
    if not values:
        return empty
    t = Sbbst(n=len(values))

    def subtree(k: Optional[int]) -> List[Target]:
        if k is None:
            return empty
        l, r = t.children_inner(k)
        ch0, ch1 = subtree(l), subtree(r)
        i = k - 1  # 1-based inner keys
        h = b.hash_no_pad(ch0 + ch1 + [ids[i]] + list(values[i].limbs))
        return [b.select(included[i], a, z) for a, z in zip(h, ch0)]

    return subtree(t.root_inner())


def _curve_scalar_mul_u32(b, scalar: Target, p: CurveTarget) -> CurveTarget:
    """acc = scalar * p with a 32-bit range-checked scalar (the record
    multiplicity, results_tree_without_duplicates.rs:120-126)."""
    bits = b.decompose_bits(scalar, 32)
    acc = curve_zero(b)
    base = p
    for i, bit in enumerate(bits):
        acc = curve_select(b, bit, curve_add(b, acc, base), acc)
        if i + 1 < len(bits):
            base = curve_add(b, base, base)
    return acc


def _node_hash(b, lh, rh, mn: U256Target, mx: U256Target, col_id,
               value: U256Target, subtree_h) -> List[Target]:
    """H(left.H || right.H || min || max || column_id || node_value || p.H)
    — the same node-hash shape as the main DB trees."""
    return b.hash_no_pad(
        list(lh) + list(rh) + list(mn.limbs) + list(mx.limbs)
        + [col_id] + list(value.limbs) + list(subtree_h)
    )


# ---------------------------------------------------------------------------
# record circuits (rows-tree leaves of the results tree)
# ---------------------------------------------------------------------------


def _build_record(b, p: ResultsParams, no_duplicates: bool):
    """Shared body of results_tree_{with,without}_duplicates.rs."""
    s = p.num_items
    values = [add_virtual_u256(b) for _ in range(s)]
    ids = b.add_inputs(s)
    included = [_bool_input(b) for _ in range(s)]
    mult_t = b.add_input() if no_duplicates else None
    in_leaf = _bool_input(b)
    counter = b.add_input()

    tree_h = _items_cells_tree(b, values[2:], ids[2:], included[2:])

    if no_duplicates:
        # excluded slots must be zero so two equal records cannot be made
        # distinct through dead slots (without_duplicates.rs:99-108)
        for i in range(1, s):
            z = u256_is_zero(b, values[i])
            b.connect(b.logic_or(included[i], z), b.one())

    zero = U256Target(tuple(b.zero() for _ in range(8)))
    second = u256_select(b, included[1], values[1], zero)

    acc = map_to_curve_point_circuit(
        b, [ids[0]] + list(values[0].limbs) + [ids[1]] + list(second.limbs)
        + tree_h,
    )
    if no_duplicates:
        acc = _curve_scalar_mul_u32(b, mult_t, acc)

    e = [b.constant(v) for v in EMPTY]
    wrapped = _node_hash(b, e, e, second, second, ids[1], second, tree_h)
    h = [b.select(in_leaf, a, c) for a, c in zip(wrapped, tree_h)]

    items = values[2:]
    nd = b.one() if no_duplicates else b.zero()
    _register(b, p, h, second, second, items, items, counter, counter,
              values[0], ids[:2], nd, acc)

    def assign(inputs, record: "Record", in_leaf_v: bool, counter_v: int):
        for t, v in zip(values, list(record.item_values) + [0] * s):
            set_u256(inputs, t, int(v))
        for t, v in zip(ids, record.ids):
            inputs[t] = int(v)
        for i, t in enumerate(included):
            inputs[t] = 1 if i < record.num_included else 0
        if mult_t is not None:
            inputs[mult_t] = int(record.multiplicity)
        inputs[in_leaf] = 1 if in_leaf_v else 0
        inputs[counter] = int(counter_v)

    return assign


# ---------------------------------------------------------------------------
# tree-node circuits
# ---------------------------------------------------------------------------


def _build_results_leaf(b, p: ResultsParams, children):
    """Index-tree leaf wrapping a rows-tree root (leaf_node.rs):
    H(H('') || H('') || p.I || p.I || index_ids[0] || p.I || p.H)."""
    sub = _ResPis.parse(b, p, children[0].public_inputs())
    e = [b.constant(v) for v in EMPTY]
    h = _node_hash(b, e, e, sub.primary, sub.primary, sub.index_ids[0],
                   sub.primary, sub.h)
    _register(b, p, h, sub.primary, sub.primary, sub.min_items,
              sub.max_items, sub.min_cnt, sub.max_cnt, sub.primary,
              sub.index_ids, sub.no_dup, sub.acc)
    return lambda inputs: None


def _one_child_common(b, sub: _ResPis):
    is_rows = _bool_input(b)
    col_id = b.select(is_rows, sub.index_ids[1], sub.index_ids[0])
    node_value = u256_select(b, is_rows, sub.mn, sub.primary)
    return is_rows, col_id, node_value


def _build_results_one_child(b, p: ResultsParams, children):
    """node_with_one_child.rs: children = [subtree proof, child proof]."""
    sub = _ResPis.parse(b, p, children[0].public_inputs())
    ch = _ResPis.parse(b, p, children[1].public_inputs())
    is_rows, col_id, node_value = _one_child_common(b, sub)
    is_left = _bool_input(b)

    node_min = u256_select(b, is_left, ch.mn, node_value)
    node_max = u256_select(b, is_left, node_value, ch.mx)
    lower = u256_select(b, is_left, ch.mx, node_value)
    upper = u256_select(b, is_left, node_value, ch.mn)
    lt = u256_less_than(b, lower, upper)
    eq = u256_equal(b, lower, upper)

    # node hash with the child slot on the witnessed side
    # (hash_maybe_first role, mp2-common/src/utils.rs)
    e = [b.constant(v) for v in EMPTY]
    lh = [b.select(is_left, a, z) for a, z in zip(ch.h, e)]
    rh = [b.select(is_left, z, a) for a, z in zip(ch.h, e)]
    h = _node_hash(b, lh, rh, node_min, node_max, col_id, node_value, sub.h)

    # rows-tree constraints (gated on is_rows)
    idx_eq = u256_equal(b, ch.primary, sub.primary)
    cnt_eq = b.is_equal(sub.min_cnt, sub.max_cnt)
    lte = b.logic_or(lt, eq)
    acc_f = b.logic_and(b.logic_and(idx_eq, cnt_eq), lte)
    b.connect(b.mul(is_rows, acc_f), is_rows)
    # index-tree constraint: strict ordering
    not_rows = b.logic_not(is_rows)
    b.connect(b.mul(not_rows, lt), not_rows)

    b.connect(ch.no_dup, sub.no_dup)
    check_dup = b.logic_and(sub.no_dup, is_rows)

    child_items = _u256_arr_select(b, is_left, ch.max_items, ch.min_items)
    node_items = _u256_arr_select(b, is_left, sub.min_items, sub.max_items)
    items_lt, items_eq = _u256_arr_lt_eq(b, child_items, node_items)
    cond = b.logic_and(check_dup, eq)
    # left child: items strictly below; right child: strictly above
    cl = b.logic_and(cond, is_left)
    b.connect(b.mul(cl, items_lt), cl)
    cr = b.logic_and(cond, b.logic_not(is_left))
    b.connect(b.mul(cr, b.add(items_lt, items_eq)), b.zero())

    # counter chain: max_left + 1 == min_right
    max_left = b.select(is_left, ch.max_cnt, sub.max_cnt)
    min_right = b.select(is_left, sub.min_cnt, ch.min_cnt)
    b.connect(b.add_const(max_left, 1), min_right)

    min_cnt = b.select(is_left, ch.min_cnt, sub.min_cnt)
    max_cnt = b.select(is_left, sub.max_cnt, ch.max_cnt)
    min_items = _u256_arr_select(b, is_left, ch.min_items, sub.min_items)
    max_items = _u256_arr_select(b, is_left, sub.max_items, ch.max_items)

    for a, c in zip(sub.index_ids, ch.index_ids):
        b.connect(a, c)
    acc = curve_add(b, sub.acc, ch.acc)

    _register(b, p, h, node_min, node_max, min_items, max_items, min_cnt,
              max_cnt, sub.primary, sub.index_ids, sub.no_dup, acc)

    def assign(inputs, is_rows_v: bool, is_left_v: bool):
        inputs[is_rows] = 1 if is_rows_v else 0
        inputs[is_left] = 1 if is_left_v else 0

    return assign


def _build_results_two_children(b, p: ResultsParams, children):
    """node_with_two_children.rs: children = [subtree, left, right]."""
    sub = _ResPis.parse(b, p, children[0].public_inputs())
    c1 = _ResPis.parse(b, p, children[1].public_inputs())
    c2 = _ResPis.parse(b, p, children[2].public_inputs())
    is_rows, col_id, node_value = _one_child_common(b, sub)

    h = _node_hash(b, c1.h, c2.h, c1.mn, c2.mx, col_id, node_value, sub.h)

    left_lt = u256_less_than(b, c1.mx, node_value)
    right_gt = u256_less_than(b, node_value, c2.mn)

    # rows-tree: same primary everywhere, single counter, children may
    # touch the node value (duplicates of the secondary item)
    idx_eq = b.logic_and(
        u256_equal(b, c1.primary, sub.primary),
        u256_equal(b, c2.primary, sub.primary),
    )
    cnt_eq = b.is_equal(sub.min_cnt, sub.max_cnt)
    l_ok = b.logic_or(left_lt, u256_equal(b, c1.mx, node_value))
    r_ok = b.logic_or(right_gt, u256_equal(b, c2.mn, node_value))
    acc_f = b.logic_and(b.logic_and(idx_eq, cnt_eq), b.logic_and(l_ok, r_ok))
    b.connect(b.mul(is_rows, acc_f), is_rows)
    # index-tree: strict on both sides
    not_rows = b.logic_not(is_rows)
    b.connect(b.mul(not_rows, b.logic_and(left_lt, right_gt)), not_rows)

    b.connect(sub.no_dup, c1.no_dup)
    b.connect(sub.no_dup, c2.no_dup)
    check_dup = b.logic_and(sub.no_dup, is_rows)

    # no duplicate records: when a child's boundary equals the node value,
    # its item tuple must be strictly ordered against the node's
    lt1, _ = _u256_arr_lt_eq(b, c1.max_items, sub.min_items)
    g1 = b.logic_and(check_dup, b.logic_not(left_lt))
    b.connect(b.mul(g1, lt1), g1)
    lt2, _ = _u256_arr_lt_eq(b, sub.max_items, c2.min_items)
    g2 = b.logic_and(check_dup, b.logic_not(right_gt))
    b.connect(b.mul(g2, lt2), g2)

    # counter chains
    b.connect(b.add_const(c1.max_cnt, 1), sub.min_cnt)
    b.connect(b.add_const(sub.max_cnt, 1), c2.min_cnt)

    for cp in (c1, c2):
        for a, c in zip(sub.index_ids, cp.index_ids):
            b.connect(a, c)
    acc = curve_add(b, curve_add(b, sub.acc, c1.acc), c2.acc)

    _register(b, p, h, c1.mn, c2.mx, c1.min_items, c2.max_items, c1.min_cnt,
              c2.max_cnt, sub.primary, sub.index_ids, sub.no_dup, acc)

    def assign(inputs, is_rows_v: bool):
        inputs[is_rows] = 1 if is_rows_v else 0

    return assign


# ---------------------------------------------------------------------------
# binding circuit
# ---------------------------------------------------------------------------


def _build_binding(b, p: ResultsParams, foreign):
    """binding_results.rs: the construction ROOT is verified in-circuit
    (cross-set); the query proof arrives as a witnessed old-PI slice (the
    upstream wiring state — CircuitLogicWires for the binding is a TODO at
    binding_results.rs:95-96, its tests witness the slice the same way)."""
    root = _ResPis.parse(b, p, foreign[0].public_inputs())

    q = b.add_inputs(BINDING_QUERY_SLICE)
    o = 0

    def take(n):
        nonlocal o
        out = q[o : o + n]
        o += n
        return out

    q_tree_h = take(4)
    q_ops0 = take(1)[0]
    q_v0 = curve_from_pi_targets(b, take(11))
    q_comp = take(4)
    q_ph = take(4)
    q_min = take(8)
    q_max = take(8)
    q_overflow = take(1)[0]

    # accumulated values == values used to build the results tree
    from mp2_tpu.circuit.gadgets.curve import curve_connect

    curve_connect(b, q_v0, root.acc)
    # no result aggregation
    b.connect(q_ops0, b.constant(int(AggregationOperation.ID)))
    # counters started from 1
    b.connect(root.min_cnt, b.one())

    res_id = b.select(
        root.no_dup,
        b.constant(RESULT_WITH_DISTINCT),
        b.constant(RESULT_NO_DISTINCT),
    )
    comp = b.hash_no_pad([res_id] + list(q_comp))
    ph = b.hash_no_pad(list(q_ph) + list(q_min) + list(q_max))

    pis = (
        list(root.h) + list(q_tree_h) + comp + ph
        + [root.max_cnt, q_overflow]
    )
    assert len(pis) == BINDING_PI_WIDTH
    b.register_public_inputs(pis)

    def assign(inputs, query_slice: Sequence[int]):
        assert len(query_slice) == BINDING_QUERY_SLICE
        for t, v in zip(q, query_slice):
            inputs[t] = int(v)

    return assign


def binding_query_slice(tree_hash, first_value: Point, comp, ph,
                        min_query: int, max_query: int,
                        overflow: int) -> List[int]:
    """Host encoder for the witnessed query-PI slice."""
    return (
        [int(v) for v in tree_hash]
        + [int(AggregationOperation.ID)]
        + [int(v) for v in first_value.to_fields()]
        + [int(v) for v in comp] + [int(v) for v in ph]
        + u256_to_fields(min_query) + u256_to_fields(max_query)
        + [int(overflow)]
    )


def binding_expected(p: ResultsParams, root_pis: Sequence[int],
                     query_slice: Sequence[int]) -> List[int]:
    """Host mirror of the binding circuit's outputs."""
    no_dup = root_pis[4 + 8 + 8 + 16 * (p.num_items - 2) + 2 + 8 + 2]
    max_cnt = root_pis[4 + 8 + 8 + 16 * (p.num_items - 2) + 1]
    res_id = RESULT_WITH_DISTINCT if no_dup else RESULT_NO_DISTINCT
    comp = p2h.hash_no_pad([res_id] + [int(v) for v in query_slice[16:20]])
    ph = p2h.hash_no_pad([int(v) for v in query_slice[20:40]])
    return (
        [int(v) for v in root_pis[0:4]] + [int(v) for v in query_slice[0:4]]
        + list(comp) + list(ph) + [int(max_cnt), int(query_slice[40])]
    )


# ---------------------------------------------------------------------------
# host golden model
# ---------------------------------------------------------------------------


@dataclass
class Record:
    """One query result record: item_values[0] is the primary output item,
    [1] the secondary, the rest the payload items."""

    item_values: List[int]
    ids: List[int]
    num_included: int
    multiplicity: int = 1


def _host_items_tree(values: Sequence[int], ids: Sequence[int],
                     included: Sequence[bool]) -> List[int]:
    empty = EMPTY
    if not values:
        return list(empty)
    t = Sbbst(n=len(values))

    def subtree(k):
        if k is None:
            return list(empty)
        l, r = t.children_inner(k)
        ch0, ch1 = subtree(l), subtree(r)
        i = k - 1
        if not included[i]:
            return ch0
        return list(p2h.hash_no_pad(
            ch0 + ch1 + [int(ids[i])] + u256_to_fields(int(values[i]))
        ))

    return subtree(t.root_inner())


def _host_node_hash(lh, rh, mn, mx, col_id, value, sub_h) -> List[int]:
    return list(p2h.hash_no_pad(
        list(lh) + list(rh) + u256_to_fields(mn) + u256_to_fields(mx)
        + [int(col_id)] + u256_to_fields(value) + list(sub_h)
    ))


def host_record_pis(p: ResultsParams, rec: Record, in_leaf: bool,
                    counter: int, no_duplicates: bool) -> List[int]:
    s = p.num_items
    values = list(rec.item_values) + [0] * (s - len(rec.item_values))
    included = [i < rec.num_included for i in range(s)]
    tree_h = _host_items_tree(values[2:], rec.ids[2:], included[2:])
    second = values[1] if included[1] else 0
    acc = p2h.map_to_curve_point(
        [int(rec.ids[0])] + u256_to_fields(values[0]) + [int(rec.ids[1])]
        + u256_to_fields(second) + tree_h
    )
    if no_duplicates:
        acc = acc.scalar_mul(rec.multiplicity)
    h = (
        _host_node_hash(EMPTY, EMPTY, second, second, rec.ids[1], second,
                        tree_h)
        if in_leaf else tree_h
    )
    items = values[2:]
    return results_pi_values(
        p, h, second, second, items, items, counter, counter, values[0],
        rec.ids[:2], no_duplicates, acc,
    )


def _pis_fields(p: ResultsParams, pis: Sequence[int]):
    """Decode the host-side PI vector into named fields."""
    s = p.num_items
    o = 4

    def u256():
        nonlocal o
        v = 0
        for l in pis[o : o + 8]:
            v = (v << 32) | int(l)
        o += 8
        return v

    mn, mx = u256(), u256()
    min_items = [u256() for _ in range(s - 2)]
    max_items = [u256() for _ in range(s - 2)]
    min_cnt, max_cnt = int(pis[o]), int(pis[o + 1])
    o += 2
    primary = u256()
    ids = [int(pis[o]), int(pis[o + 1])]
    o += 2
    no_dup = int(pis[o])
    o += 1
    acc = Point.from_fields([int(v) for v in pis[o : o + 11]])
    return dict(h=list(pis[0:4]), mn=mn, mx=mx, min_items=min_items,
                max_items=max_items, min_cnt=min_cnt, max_cnt=max_cnt,
                primary=primary, ids=ids, no_dup=no_dup, acc=acc)


def host_leaf_pis(p: ResultsParams, sub_pis: Sequence[int]) -> List[int]:
    f = _pis_fields(p, sub_pis)
    h = _host_node_hash(EMPTY, EMPTY, f["primary"], f["primary"],
                        f["ids"][0], f["primary"], f["h"])
    return results_pi_values(
        p, h, f["primary"], f["primary"], f["min_items"], f["max_items"],
        f["min_cnt"], f["max_cnt"], f["primary"], f["ids"],
        bool(f["no_dup"]), f["acc"],
    )


def host_one_child_pis(p: ResultsParams, sub_pis, child_pis,
                       is_rows: bool, is_left: bool) -> List[int]:
    f = _pis_fields(p, sub_pis)
    c = _pis_fields(p, child_pis)
    col_id = f["ids"][1] if is_rows else f["ids"][0]
    node_value = f["mn"] if is_rows else f["primary"]
    node_min = c["mn"] if is_left else node_value
    node_max = node_value if is_left else c["mx"]
    lh = c["h"] if is_left else EMPTY
    rh = EMPTY if is_left else c["h"]
    h = _host_node_hash(lh, rh, node_min, node_max, col_id, node_value,
                        f["h"])
    return results_pi_values(
        p, h, node_min, node_max,
        c["min_items"] if is_left else f["min_items"],
        f["max_items"] if is_left else c["max_items"],
        c["min_cnt"] if is_left else f["min_cnt"],
        f["max_cnt"] if is_left else c["max_cnt"],
        f["primary"], f["ids"], bool(f["no_dup"]),
        f["acc"] + c["acc"],
    )


def host_two_children_pis(p: ResultsParams, sub_pis, c1_pis, c2_pis,
                          is_rows: bool) -> List[int]:
    f = _pis_fields(p, sub_pis)
    c1 = _pis_fields(p, c1_pis)
    c2 = _pis_fields(p, c2_pis)
    col_id = f["ids"][1] if is_rows else f["ids"][0]
    node_value = f["mn"] if is_rows else f["primary"]
    h = _host_node_hash(c1["h"], c2["h"], c1["mn"], c2["mx"], col_id,
                        node_value, f["h"])
    return results_pi_values(
        p, h, c1["mn"], c2["mx"], c1["min_items"], c2["max_items"],
        c1["min_cnt"], c2["max_cnt"], f["primary"], f["ids"],
        bool(f["no_dup"]), f["acc"] + c1["acc"] + c2["acc"],
    )


# ---------------------------------------------------------------------------
# the recursive circuit sets
# ---------------------------------------------------------------------------


class ResultsTreeCircuits:
    """Construction set (5 members, one fixed VK) + binding set verifying
    the construction root cross-set (verifiable-db/src/results_tree/)."""

    def __init__(self, config: CircuitConfig,
                 params: Optional[ResultsParams] = None):
        from mp2_tpu.recursion.runtime import RecursionFramework

        self.params = p = params or ResultsParams()
        self.construction = RecursionFramework(config, p.pi_width,
                                               set_height=3)
        self.construction.add_leaf_circuit(
            "record_dup", lambda b: _build_record(b, p, False)
        )
        self.construction.add_leaf_circuit(
            "record_no_dup", lambda b: _build_record(b, p, True)
        )
        self.construction.add_aggregation_circuit(
            "results_leaf", 1,
            lambda b, ch, fo=None: _build_results_leaf(b, p, ch),
        )
        self.construction.add_aggregation_circuit(
            "results_one_child", 2,
            lambda b, ch, fo=None: _build_results_one_child(b, p, ch),
        )
        self.construction.add_aggregation_circuit(
            "results_two_children", 3,
            lambda b, ch, fo=None: _build_results_two_children(b, p, ch),
        )
        self.construction.finalize()

        self.binding = RecursionFramework(config, BINDING_PI_WIDTH,
                                          set_height=1)
        self.binding.add_aggregation_circuit(
            "binding", 0,
            lambda b, ch, fo: _build_binding(b, p, fo),
            foreign=[self.construction],
        )
        self.binding.finalize()
