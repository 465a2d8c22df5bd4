"""Row-chunk aggregation + revelation circuits over the universal query
circuit (reference: verifiable-db/src/query/{row_chunk_processing.rs,
chunk_aggregation.rs}, revelation/revelation_without_results_tree.rs).

Shape:
  row        — the witness-driven universal query circuit as a framework
               member (ONE VK for all queries);
  chunk_pair / chunk_single — aggregate 1-2 ROW proofs (cross-set): checks
               all rows ran the SAME query (equal computational hash) with
               the SAME placeholder bindings, and folds outputs per the
               committed aggregation function (SUM/AVG add, MIN/MAX compare,
               COUNT adds predicate bits);
  chunk_merge — aggregates 2 chunk proofs (same set);
  revelation  — verifies the chunk root (cross-set) + the IVC proof
               (cross-set from the verifiable-DB stack), applies the final
               AVG division, and exposes (computational hash, placeholder
               hash, block-tree root, results, count): ONE host check
               validates the whole query against the committed database.

Known gap vs the reference (documented in STATUS.md): rows are bound by
their column commitments but the per-row Merkle paths into the rows/index
trees (merkle_path.rs) and the consecutive-rows completeness gadget are not
yet enforced in-circuit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from mp2_tpu.circuit.builder import CircuitBuilder, Target
from mp2_tpu.circuit.gadgets.u256 import (
    U256Target,
    u256_add,
    u256_less_than,
    u256_select,
)
from mp2_tpu.prover.config import CircuitConfig
from mp2_tpu.recursion.runtime import RecursionFramework, WrappedEnvelope
from mp2_tpu.utils.u256 import U256_MAX, u256_to_fields
from mp2_tpu.vdb.query.ops import AggregationOperation
from mp2_tpu.vdb.query.universal import (
    UniversalQueryParams,
    build_universal_query_circuit,
)

N_AGG = 6  # AggregationOperation enum size


def _row_pi_width(p: UniversalQueryParams) -> int:
    return 14 + p.num_outputs + 8 * p.num_outputs


@dataclass
class _RowPis:
    comp: List[Target]
    ph: List[Target]
    cc: List[Target]
    pred: Target
    overflow: Target
    agg_ids: List[Target]
    outputs: List[U256Target]

    @staticmethod
    def parse(p, pis):
        no = p.num_outputs
        outs = [
            U256Target(tuple(pis[14 + no + 8 * j : 14 + no + 8 * (j + 1)]))
            for j in range(no)
        ]
        return _RowPis(
            comp=list(pis[0:4]), ph=list(pis[4:8]), cc=list(pis[8:12]),
            pred=pis[12], overflow=pis[13],
            agg_ids=list(pis[14 : 14 + no]), outputs=outs,
        )


@dataclass
class _ChunkPis:
    comp: List[Target]
    ph: List[Target]
    agg_ids: List[Target]
    outputs: List[U256Target]
    count: Target

    @staticmethod
    def parse(p, pis):
        no = p.num_outputs
        outs = [
            U256Target(tuple(pis[8 + no + 8 * j : 8 + no + 8 * (j + 1)]))
            for j in range(no)
        ]
        return _ChunkPis(
            comp=list(pis[0:4]), ph=list(pis[4:8]),
            agg_ids=list(pis[8 : 8 + no]), outputs=outs,
            count=pis[8 + no + 8 * no],
        )


def _u256_const(b, v: int) -> U256Target:
    return U256Target(tuple(b.constant(x) for x in u256_to_fields(v)))


def _agg_onehot(b, agg_id: Target) -> List[Target]:
    oh = []
    acc = None
    idx = b.zero()
    for k in range(N_AGG):
        t = b.add_input()
        b.connect(b.mul(t, t), t)
        oh.append(t)
        acc = t if acc is None else b.add(acc, t)
        idx = b.mul_add(t, b.constant(k), idx)

    def gen(read, agg_id=agg_id):
        return read(agg_id)

    for k, t in enumerate(oh):
        b.add_generator(t, lambda read, k=k, a=agg_id: 1 if read(a) == k else 0)
    b.connect(acc, b.one())
    b.connect(idx, agg_id)
    return oh


def _row_contribution(b, pred: Target, out: U256Target, oh) -> U256Target:
    """Per-row identity-padded contribution for each aggregation kind."""
    zero = _u256_const(b, 0)
    mx = _u256_const(b, U256_MAX)
    gated = u256_select(b, pred, out, zero)          # SUM/AVG/MAX
    gated_min = u256_select(b, pred, out, mx)        # MIN
    count = U256Target(tuple([b.zero()] * 7 + [pred]))  # COUNT
    v = u256_select(b, oh[int(AggregationOperation.MIN)], gated_min, gated)
    v = u256_select(b, oh[int(AggregationOperation.COUNT)], count, v)
    return v


def _combine(b, a: U256Target, c: U256Target, oh) -> U256Target:
    added, _ = u256_add(b, a, c)
    mn = u256_select(b, u256_less_than(b, a, c), a, c)
    mx = u256_select(b, u256_less_than(b, a, c), c, a)
    v = u256_select(b, oh[int(AggregationOperation.MIN)], mn, added)
    v = u256_select(b, oh[int(AggregationOperation.MAX)], mx, v)
    return v


def _connect_lists(b, xs, ys):
    for x, y in zip(xs, ys):
        b.connect(x, y)


class QueryCircuits:
    """The query-side circuit sets: row (universal) -> chunks -> revelation.

    `ivc_framework`: the finalized IVC set from VerifiableDbCircuits (the
    revelation circuit verifies an IVC proof against it); pass None to
    build a standalone query stack without database binding (testing)."""

    def __init__(
        self,
        config: CircuitConfig,
        params: UniversalQueryParams = UniversalQueryParams(),
        ivc_framework: Optional[RecursionFramework] = None,
    ):
        self.config = config
        self.params = params
        self.ivc_framework = ivc_framework
        W = _row_pi_width(params)

        # --- row set: the universal query circuit, one VK for all queries
        self.row = RecursionFramework(config, W, set_height=1)

        def row_build(b):
            uc = build_universal_query_circuit(params, builder=b)
            return uc.assign

        self.row.add_leaf_circuit("row", row_build)
        self.row.finalize()

        # --- chunk set
        self.chunk = RecursionFramework(config, W, set_height=2)
        p = params

        def chunk_from_rows(n_rows):
            def build(b, children, foreign):
                rows = [_RowPis.parse(p, f.public_inputs()) for f in foreign]
                r0 = rows[0]
                count = r0.pred
                for r in rows[1:]:
                    _connect_lists(b, r.comp, r0.comp)
                    _connect_lists(b, r.ph, r0.ph)
                    _connect_lists(b, r.agg_ids, r0.agg_ids)
                    count = b.add(count, r.pred)
                outs = []
                for j in range(p.num_outputs):
                    oh = _agg_onehot(b, r0.agg_ids[j])
                    acc = _row_contribution(b, rows[0].pred, rows[0].outputs[j], oh)
                    for r in rows[1:]:
                        c = _row_contribution(b, r.pred, r.outputs[j], oh)
                        acc = _combine(b, acc, c, oh)
                    outs.append(acc)
                pis = (
                    list(r0.comp) + list(r0.ph) + list(r0.agg_ids)
                    + [l for o in outs for l in o.limbs] + [count]
                )
                pis += [b.zero()] * (W - len(pis))
                b.register_public_inputs(pis)
                return None

            return build

        self.chunk.add_aggregation_circuit(
            "chunk_pair", 0, chunk_from_rows(2), foreign=[self.row, self.row]
        )
        self.chunk.add_aggregation_circuit(
            "chunk_single", 0, chunk_from_rows(1), foreign=[self.row]
        )

        def merge_build(b, children):
            l = _ChunkPis.parse(p, children[0].public_inputs())
            r = _ChunkPis.parse(p, children[1].public_inputs())
            _connect_lists(b, r.comp, l.comp)
            _connect_lists(b, r.ph, l.ph)
            _connect_lists(b, r.agg_ids, l.agg_ids)
            outs = []
            for j in range(p.num_outputs):
                oh = _agg_onehot(b, l.agg_ids[j])
                outs.append(_combine(b, l.outputs[j], r.outputs[j], oh))
            count = b.add(l.count, r.count)
            pis = (
                list(l.comp) + list(l.ph) + list(l.agg_ids)
                + [lm for o in outs for lm in o.limbs] + [count]
            )
            pis += [b.zero()] * (W - len(pis))
            b.register_public_inputs(pis)
            return None

        self.chunk.add_aggregation_circuit("chunk_merge", 2, merge_build)
        self.chunk.finalize()

        # --- revelation
        self.revelation = RecursionFramework(config, W, set_height=1)
        foreign = [self.chunk] + ([ivc_framework] if ivc_framework else [])

        def reveal_build(b, children, foreign_uvs):
            from mp2_tpu.circuit.gadgets.u256 import u256_div_mod

            c = _ChunkPis.parse(p, foreign_uvs[0].public_inputs())
            if len(foreign_uvs) > 1:
                ivc_pis = foreign_uvs[1].public_inputs()
                block_root = list(ivc_pis[0:4])
            else:
                block_root = [b.zero()] * 4
            count = c.count
            count_u = U256Target(tuple([b.zero()] * 7 + [count]))
            results = []
            for j in range(p.num_outputs):
                oh = _agg_onehot(b, c.agg_ids[j])
                avg, _ = u256_div_mod(b, c.outputs[j], count_u)
                v = u256_select(
                    b, oh[int(AggregationOperation.AVG)], avg, c.outputs[j]
                )
                results.append(v)
            pis = (
                list(c.comp) + list(c.ph) + block_root
                + [l for o in results for l in o.limbs] + [count]
            )
            pis += [b.zero()] * (W - len(pis))
            b.register_public_inputs(pis)
            return None

        self.revelation.add_aggregation_circuit(
            "revelation", 0, reveal_build, foreign=foreign
        )
        self.revelation.finalize()

    # ---------------------------------------------------------------- prove
    def prove_row(self, pis, column_ids, row, placeholders, bounds):
        return self.row.prove_leaf(
            "row", (pis, column_ids, row, placeholders, bounds),
            self._row_pis(pis, column_ids, row, placeholders, bounds),
        )

    def _row_pis(self, pis, column_ids, row, placeholders, bounds):
        from mp2_tpu.vdb.query.universal import UniversalQueryCircuit

        uc = UniversalQueryCircuit(params=self.params, data=None, assign=None)
        return uc.expected_public_inputs(
            pis, column_ids, row, placeholders, bounds
        )

    def prove_query(
        self, pis, column_ids, rows, placeholders, bounds, ivc_env=None
    ) -> Tuple[WrappedEnvelope, List[int]]:
        """Prove every row, chunk them pairwise, merge, reveal.  Returns the
        revelation envelope + its user PIs."""
        row_envs = [
            self.prove_row(pis, column_ids, r, placeholders, bounds)
            for r in rows
        ]
        row_pi_vals = [
            self._row_pis(pis, column_ids, r, placeholders, bounds)
            for r in rows
        ]
        W = _row_pi_width(self.params)

        no = self.params.num_outputs

        def u256_of(limbs):
            val = 0
            for l in limbs:
                val = (val << 32) | l
            return val

        def fold(agg, a, c):
            if agg == int(AggregationOperation.MIN):
                return min(a, c)
            if agg == int(AggregationOperation.MAX):
                return max(a, c)
            return (a + c) % (1 << 256)

        def chunk_vals(pivs):
            """Host mirror of the in-circuit chunk aggregation."""
            comp, ph = pivs[0][0:4], pivs[0][4:8]
            aggs = pivs[0][14 : 14 + no]
            count = sum(pv[12] for pv in pivs)
            outs = []
            for j in range(no):
                agg = aggs[j]
                acc = None
                for pv in pivs:
                    pred = pv[12]
                    val = u256_of(pv[14 + no + 8 * j : 14 + no + 8 * (j + 1)])
                    if agg == int(AggregationOperation.MIN):
                        c = val if pred else U256_MAX
                    elif agg == int(AggregationOperation.COUNT):
                        c = pred
                    else:  # SUM / AVG / MAX / ID
                        c = val if pred else 0
                    acc = c if acc is None else fold(agg, acc, c)
                outs.append(acc)
            vals = (
                list(comp) + list(ph) + list(aggs)
                + [f for o in outs for f in u256_to_fields(o)] + [count]
            )
            return vals + [0] * (W - len(vals))

        # pair rows into chunks
        chunk_envs = []
        chunk_piv = []
        i = 0
        while i < len(row_envs):
            if i + 1 < len(row_envs):
                piv = chunk_vals([row_pi_vals[i], row_pi_vals[i + 1]])
                env = self.chunk.prove_aggregation(
                    "chunk_pair", [], (), piv,
                    foreign_children=[row_envs[i], row_envs[i + 1]],
                )
                i += 2
            else:
                piv = chunk_vals([row_pi_vals[i]])
                env = self.chunk.prove_aggregation(
                    "chunk_single", [], (), piv, foreign_children=[row_envs[i]]
                )
                i += 1
            chunk_envs.append(env)
            chunk_piv.append(piv)

        def merge_vals(a, bv):
            aggs = a[8 : 8 + no]
            res = []
            for j in range(no):
                off = 8 + no + 8 * j
                va = u256_of(a[off : off + 8])
                vb = u256_of(bv[off : off + 8])
                res.append(fold(aggs[j], va, vb))
            count = a[8 + no + 8 * no] + bv[8 + no + 8 * no]
            vals = (
                list(a[0:8]) + list(aggs)
                + [f for o in res for f in u256_to_fields(o)] + [count]
            )
            return vals + [0] * (W - len(vals))

        while len(chunk_envs) > 1:
            nxt_envs, nxt_piv = [], []
            i = 0
            while i < len(chunk_envs):
                if i + 1 < len(chunk_envs):
                    piv = merge_vals(chunk_piv[i], chunk_piv[i + 1])
                    env = self.chunk.prove_aggregation(
                        "chunk_merge", [chunk_envs[i], chunk_envs[i + 1]],
                        (), piv,
                    )
                    i += 2
                else:
                    env, piv = chunk_envs[i], chunk_piv[i]
                    i += 1
                nxt_envs.append(env)
                nxt_piv.append(piv)
            chunk_envs, chunk_piv = nxt_envs, nxt_piv

        root_piv = chunk_piv[0]
        no = self.params.num_outputs
        count = root_piv[8 + no + 8 * no]
        block_root = list(ivc_env.user_inputs[0:4]) if ivc_env else [0, 0, 0, 0]
        results = []
        for j in range(no):
            off = 8 + no + 8 * j
            val = 0
            for l in root_piv[off : off + 8]:
                val = (val << 32) | l
            if root_piv[8 + j] == int(AggregationOperation.AVG):
                val = val // count if count else 0
            results.append(val)
        reveal_piv = (
            list(root_piv[0:8]) + block_root
            + [f for o in results for f in u256_to_fields(o)] + [count]
        )
        reveal_piv += [0] * (W - len(reveal_piv))
        foreign_children = [chunk_envs[0]] + ([ivc_env] if ivc_env else [])
        env = self.revelation.prove_aggregation(
            "revelation", [], (), reveal_piv, foreign_children=foreign_children
        )
        return env, reveal_piv

    def verify(self, env: WrappedEnvelope) -> bool:
        return self.revelation.verify(env)
