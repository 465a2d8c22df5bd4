"""Per-query row circuit: a REAL TP2 circuit evaluating the assembled
predicate/result operations over one row of U256 columns.

Design note vs the reference: the reference's universal query circuit
(verifiable-db/src/query/universal_circuit/) takes the operation list as
WITNESS and exposes a `computational_hash` committing to the query, so one
circuit (and one VK) serves every query.  Here — TPU-first, where circuits
compile like kernels — the operation list is BAKED into a per-query circuit:
the circuit digest plays the computational-hash role (it commits to exactly
the baked operations), and one compiled circuit proves every row of the
query batch (vmap-style amortization; repeat proofs reuse the jitted
stages).  The witness-driven universal variant is the planned next step once
the in-circuit verifier lands, restoring the fixed-VK property across
queries.

Supported in-circuit ops: the full universal-circuit set — ADD, SUB, MUL,
DIV, MOD (witnessed quotient/remainder), EQ, NE, LT, GT, LE, GE, AND, OR,
NOT, XOR.

Public inputs: [column_commitment(4)] || [predicate_bit] || output values
(8 limbs each) || placeholder values (8 limbs each, bound by the verifier to
the claimed bindings).  The column commitment is the in-circuit Poseidon2
hash of ALL column limb values, so the aggregation layer can bind the row's
claimed values to the committed cells/rows tree (the reference binds rows
via tree-hash public inputs in the universal query circuit)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.circuit.gadgets.u256 import (
    U256Target,
    add_virtual_u256,
    set_u256,
    u256_add,
    u256_constant,
    u256_div_mod,
    u256_equal,
    u256_from_bool,
    u256_is_zero,
    u256_less_than,
    u256_mul,
    u256_sub,
)
from mp2_tpu.prover.config import CircuitConfig, test_config
from mp2_tpu.prover.prove import CircuitData, prove
from mp2_tpu.utils.u256 import u256_from_fields
from mp2_tpu.vdb.query.ops import BasicOperation, Operand, Operation

_SUPPORTED = {
    Operation.ADD, Operation.SUB, Operation.MUL, Operation.DIV, Operation.MOD,
    Operation.EQ, Operation.NE, Operation.LT, Operation.GT, Operation.LE,
    Operation.GE, Operation.AND, Operation.OR, Operation.NOT, Operation.XOR,
}


@dataclass
class RowQueryCircuit:
    data: CircuitData
    column_targets: List[U256Target]
    placeholder_targets: Dict[str, U256Target]
    num_outputs: int

    def prove_row(
        self, column_values: Sequence[int], placeholders: Dict[str, int],
        public_inputs: List[int],
    ):
        inputs = {}
        for t, v in zip(self.column_targets, column_values):
            set_u256(inputs, t, v)
        for name, t in self.placeholder_targets.items():
            set_u256(inputs, t, placeholders[name])
        w = self.data.generate_witness(inputs)
        return prove(self.data, w, public_inputs)

    @staticmethod
    def column_commitment(column_values: Sequence[int]) -> List[int]:
        """Host mirror of the in-circuit column hash (PI slots 0..3)."""
        from mp2_tpu.hash import poseidon2_host as p2h
        from mp2_tpu.utils.u256 import u256_to_fields

        flat = [f for v in column_values for f in u256_to_fields(v)]
        return list(p2h.hash_no_pad(flat))

    def expected_public_inputs(
        self, predicate: bool, outputs: Sequence[int], placeholders: Dict[str, int],
        column_values: Sequence[int],
    ) -> List[int]:
        from mp2_tpu.utils.u256 import u256_to_fields

        pis = self.column_commitment(column_values)
        pis.append(1 if predicate else 0)
        for v in outputs:
            pis.extend(u256_to_fields(v))
        for name in self.placeholder_targets:
            pis.extend(u256_to_fields(placeholders[name]))
        return pis


def _truthy(b: CircuitBuilder, v: U256Target):
    return b.logic_not(u256_is_zero(b, v))


def build_row_query_circuit(
    pis, num_columns: int, config: Optional[CircuitConfig] = None
) -> RowQueryCircuit:
    """pis: a parsil CircuitPis (predicate_ops + result)."""
    b = CircuitBuilder(config or test_config())
    cols = [add_virtual_u256(b) for _ in range(num_columns)]
    ph_targets: Dict[str, U256Target] = {}

    def placeholder(name: str) -> U256Target:
        if name not in ph_targets:
            ph_targets[name] = add_virtual_u256(b)
        return ph_targets[name]

    def operand(o: Operand, prev: List[U256Target]) -> U256Target:
        if o.kind == "constant":
            return u256_constant(b, o.value)
        if o.kind == "placeholder":
            return placeholder(o.value)
        if o.kind == "column":
            return cols[o.value]
        return prev[o.value]

    def eval_ops(ops: Sequence[BasicOperation]) -> List[U256Target]:
        prev: List[U256Target] = []
        for op in ops:
            if op.op not in _SUPPORTED:
                raise NotImplementedError(
                    f"in-circuit {op.op.name} pending u256 mul gadget"
                )
            x = operand(op.first, prev)
            y = operand(op.second, prev) if op.second is not None else None
            o = op.op
            if o == Operation.ADD:
                res, _ = u256_add(b, x, y)
            elif o == Operation.SUB:
                res, _ = u256_sub(b, x, y)
            elif o == Operation.MUL:
                res, _ = u256_mul(b, x, y)
            elif o == Operation.DIV:
                res, _ = u256_div_mod(b, x, y)
            elif o == Operation.MOD:
                _, res = u256_div_mod(b, x, y)
            elif o == Operation.EQ:
                res = u256_from_bool(b, u256_equal(b, x, y))
            elif o == Operation.NE:
                res = u256_from_bool(b, b.logic_not(u256_equal(b, x, y)))
            elif o == Operation.LT:
                res = u256_from_bool(b, u256_less_than(b, x, y))
            elif o == Operation.GT:
                res = u256_from_bool(b, u256_less_than(b, y, x))
            elif o == Operation.LE:
                res = u256_from_bool(b, b.logic_not(u256_less_than(b, y, x)))
            elif o == Operation.GE:
                res = u256_from_bool(b, b.logic_not(u256_less_than(b, x, y)))
            elif o == Operation.NOT:
                res = u256_from_bool(b, u256_is_zero(b, x))
            else:
                xb = _truthy(b, x)
                yb = _truthy(b, y)
                if o == Operation.AND:
                    res = u256_from_bool(b, b.logic_and(xb, yb))
                elif o == Operation.OR:
                    res = u256_from_bool(b, b.logic_or(xb, yb))
                else:
                    res = u256_from_bool(b, b.logic_xor(xb, yb))
            prev.append(res)
        return prev

    pred_vals = eval_ops(pis.predicate_ops)
    pred_bit = (
        _truthy(b, pred_vals[-1]) if pred_vals else b.one()
    )
    res_vals = eval_ops(pis.result.result_operations)

    # column commitment: binds the (private) column witnesses to the tree
    # the aggregation layer committed to
    col_hash = b.hash_no_pad([l for c in cols for l in c.limbs])
    b.register_public_inputs(col_hash)
    b.register_public_input(pred_bit)
    outputs = []
    for item in pis.result.output_items:
        v = cols[item.index] if item.kind == "column" else res_vals[item.index]
        outputs.append(v)
        b.register_public_inputs(list(v.limbs))
    for name in ph_targets:
        b.register_public_inputs(list(ph_targets[name].limbs))

    data = b.build()
    return RowQueryCircuit(
        data=data,
        column_targets=cols,
        placeholder_targets=ph_targets,
        num_outputs=len(outputs),
    )
