"""R1CSBuilder: a duck-typed CircuitBuilder over BN254-Fr R1CS with
emulated Goldilocks arithmetic — the bridge that lets the ENTIRE in-circuit
TP2 verifier stack (recursion/verifier_gadget.verify_proof_circuit, the
transcript gadget, the ext2 gadgets, every gate's `constraints()`) run
UNCHANGED inside a Groth16 statement.

Role of the reference's gnark-plonky2-verifier (gnark-utils/lib/lib.go +
succinctlabs' verifier circuit): a SNARK over BN254 whose statement is
"this TP2 proof verifies against this verification key".  Instead of
re-implementing the verifier in a second language, the adapter implements
the CircuitBuilder method surface the gadget layer consumes, so the one
canonical verifier definition serves the TPU prover, the recursive wrap,
and the Groth16 wrap.

Emulation design (sound magnitude tracking):
  * every GL target is a symbolic linear combination over Fr wires whose
    TRUE integer value and a constraint-derived BOUND are tracked;
  * additions / constant scalings are free (folded into R1CS rows);
  * multiplications auto-reduce operands only when the product bound
    would approach Fr (lazy reduction — sbox chains cost 2 reductions,
    not 4);
  * fresh witness wires (proof inputs, inversion hints) are 64-bit
    range-checked, which is what makes every downstream bound sound;
  * `connect` enforces congruence mod P with one witnessed quotient
    instead of two full canonical reductions.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

from mp2_tpu.field.goldilocks import P
from mp2_tpu.groth16.r1cs import LC, R1CS, R_FR

# auto-reduce threshold: product bounds must stay clear of Fr (~2^254)
_MAX_PRODUCT_BITS = 250


class R1CSBuilder:
    """The CircuitBuilder method surface over an R1CS instance.

    Targets are integer handles into `self._lc` / `self._bound`.  Values
    are computed eagerly (R1CS witness style), so proof inputs must be
    loaded (`load_inputs`) before the verifier gadget runs.
    """

    def __init__(self, public_values: Sequence[int] = (),
                 spill: bool = False, spill_dir: Optional[str] = None):
        self.r1cs = R1CS(spill_dir=spill_dir, spill=spill)
        self._lc: List[Optional[LC]] = []
        self._bound: List[int] = []
        self._zero: Optional[int] = None
        self._one: Optional[int] = None
        self._consts: Dict[int, int] = {}
        self.public_targets: List[int] = [
            self._new(self.r1cs.public_input(int(v) % P), P)
            for v in public_values
        ]
        for t in self.public_targets:
            self._range_check64(t)

    # ------------------------------------------------------------ internals
    def _new(self, lc: Optional[LC], bound: int) -> int:
        self._lc.append(lc)
        self._bound.append(bound)
        return len(self._lc) - 1

    def _get(self, t: int) -> LC:
        lc = self._lc[t]
        assert lc is not None, "target used before its value was loaded"
        return lc

    def _read(self, t: int) -> int:
        return self._get(t).value % P

    def _range_check64(self, t: int) -> None:
        """Constrain the target's wire to 64 bits (the bound every
        emulation step leans on)."""
        lc = self._get(t)
        acc, _ = self.r1cs.bits_of(lc.value, 64)
        self.r1cs.enforce_zero(lc + acc.scale(-1))
        self._bound[t] = 1 << 64

    def _reduce(self, t: int, canonical: bool = False) -> int:
        """Reduce to a small representative mod P.  canonical=True gives
        the unique value in [0, P) (needed before bit decompositions);
        the default gives SOME 64-bit representative, which is all the
        lazy-mul path and the Poseidon2 permutation need (congruence is
        what `connect` and the hash constraints consume) and skips the
        32-row < P AND-chain."""
        if self._bound[t] <= (P if canonical else 1 << 64):
            return t
        lc = self._get(t)
        r = self.r1cs.gl_reduce(
            lc, self._bound[t].bit_length(), canonical=canonical
        )
        return self._new(r, P if canonical else 1 << 64)

    def _maybe_reduce_for_mul(self, a: int, b: int):
        if (
            self._bound[a].bit_length() + self._bound[b].bit_length()
            > _MAX_PRODUCT_BITS
        ):
            # reduce the larger side first; re-check
            if self._bound[a] >= self._bound[b]:
                a = self._reduce(a)
            else:
                b = self._reduce(b)
            return self._maybe_reduce_for_mul(a, b)
        return a, b

    # ------------------------------------------------------------- inputs
    def add_input(self) -> int:
        return self._new(None, 1 << 64)

    def add_inputs(self, k: int) -> List[int]:
        return [self.add_input() for _ in range(k)]

    def load_inputs(self, inputs: Dict[int, int]) -> None:
        """Assign values to placeholder input targets (the eager-evaluation
        counterpart of witness generation) and range-check each to 64 bits."""
        for t, v in inputs.items():
            assert self._lc[t] is None, "input already has a value"
            w = self.r1cs.new_wire(int(v) % P)
            self._lc[t] = self.r1cs.lc(w)
            self._range_check64(t)

    def add_generator(self, t: int, fn: Callable) -> None:
        """Witness hint: evaluate immediately (dependencies already have
        values in the eager flow)."""
        v = int(fn(self._read)) % P
        assert self._lc[t] is None, "generator target already assigned"
        w = self.r1cs.new_wire(v)
        self._lc[t] = self.r1cs.lc(w)
        self._range_check64(t)

    # ----------------------------------------------------------- constants
    def constant(self, v: int) -> int:
        v = int(v) % P
        if v not in self._consts:
            self._consts[v] = self._new(self.r1cs.const_lc(v), max(v + 1, 1))
        return self._consts[v]

    def zero(self) -> int:
        if self._zero is None:
            self._zero = self.constant(0)
        return self._zero

    def one(self) -> int:
        if self._one is None:
            self._one = self.constant(1)
        return self._one

    # ----------------------------------------------------------- arithmetic
    def add(self, a: int, b: int) -> int:
        return self._new(self._get(a) + self._get(b),
                         self._bound[a] + self._bound[b])

    def add_const(self, a: int, c: int) -> int:
        c = int(c) % P
        return self._new(self._get(a) + c, self._bound[a] + c + 1)

    def sub(self, a: int, b: int) -> int:
        """(a - b) mod P, kept non-negative by adding a multiple of P that
        covers b's bound."""
        k = -(-self._bound[b] // P)  # ceil
        lc = self._get(a) + self._get(b).scale(-1) + k * P
        return self._new(lc, self._bound[a] + k * P)

    def mul(self, a: int, b: int) -> int:
        a, b = self._maybe_reduce_for_mul(a, b)
        la, lb = self._get(a), self._get(b)
        raw = self.r1cs.mul(la, lb)
        true = LC(raw.terms, raw.const, la.value * lb.value)
        return self._new(true, self._bound[a] * self._bound[b])

    def mul_const(self, k: int, a: int) -> int:
        k = int(k) % P
        if k == 0:
            return self.zero()
        return self._new(self._get(a).scale(k), self._bound[a] * k)

    def mul_add(self, a: int, b: int, c: int) -> int:
        return self.add(self.mul(a, b), c)

    def select(self, bit: int, x: int, y: int) -> int:
        """y + bit*(x - y); `bit` must be boolean-constrained (it is, for
        every bit the verifier gadget produces)."""
        d = self.sub(x, y)
        return self.add(y, self.mul(bit, d))

    def connect(self, a: int, b: int) -> None:
        """Enforce a ≡ b (mod P) with one witnessed quotient."""
        d = self.sub(a, b)
        lc = self._get(d)
        q, rem = divmod(lc.value, P)
        assert rem == 0, "connect: values differ mod P (bad witness)"
        q_bits = max(self._bound[d].bit_length() - 63, 1)
        q_lc, _ = self.r1cs.bits_of(q, q_bits)
        self.r1cs.enforce_zero(lc + q_lc.scale(-P))

    def decompose_bits(self, t: int, n: int) -> List[int]:
        """Canonical value of t decomposed into n bits (constrains the
        value < 2^n; n=64 with the <P check when full width)."""
        c = self._reduce(t, canonical=True)
        lc = self._get(c)
        assert lc.value < (1 << n), "decompose_bits: value exceeds range"
        acc, bits = self.r1cs.bits_of(lc.value, n)
        self.r1cs.enforce_zero(lc + acc.scale(-1))
        return [self._new(b, 2) for b in bits]

    # -------------------------------------------------------------- hashing
    def poseidon2_permute(self, state: List[int]) -> List[int]:
        lcs = [self._get(self._reduce(t)) for t in state]
        # stamped: identical constraints, instantiated from the recorded
        # one-permutation template (MP2_G16_STAMP=0 re-derives per call)
        import os

        if os.environ.get("MP2_G16_STAMP", "1") != "0":
            out = self.r1cs.poseidon2_permute_stamped(lcs)
        else:
            out = self.r1cs.poseidon2_permute(lcs)
        # outputs are 64-bit representatives, not canonical — bound 2^64
        # makes decompose_bits re-canonicalize before any bit extraction
        return [self._new(o, 1 << 64) for o in out]

    def hash_no_pad(self, inputs: List[int], num_outputs: int = 4) -> List[int]:
        from mp2_tpu.hash.constants import RATE, WIDTH

        state = [self.zero()] * WIDTH
        for i in range(0, len(inputs), RATE):
            chunk = inputs[i : i + RATE]
            state[: len(chunk)] = list(chunk)
            state = self.poseidon2_permute(state)
        return state[:num_outputs]

    def hash_n_to_m_no_pad(self, inputs: List[int], m: int) -> List[int]:
        from mp2_tpu.hash.constants import RATE, WIDTH

        state = [self.zero()] * WIDTH
        for i in range(0, len(inputs), RATE):
            chunk = inputs[i : i + RATE]
            state[: len(chunk)] = list(chunk)
            state = self.poseidon2_permute(state)
        out: List[int] = []
        while True:
            out.extend(state[:RATE])
            if len(out) >= m:
                return out[:m]
            state = self.poseidon2_permute(state)


def build_tp2_verifier_r1cs(inner_data, proof, num_public_inputs=None,
                            spill=False, spill_dir=None):
    """The full Groth16 wrap statement (gnark-plonky2-verifier role):
    public inputs = the TP2 proof's public inputs; the R1CS contains the
    COMPLETE verifier for `proof` against `inner_data`'s fixed commitment
    (transcript replay, zeta identity through the shared gate definitions,
    batched-FRI verification), via recursion/verifier_gadget reused through
    the adapter.

    Returns (r1cs, digest_values) — digest_values is the inner circuit
    digest recomputed in-SNARK (host-checked against the expected VK by
    the caller)."""
    from mp2_tpu.recursion.verifier_gadget import (
        CommonData,
        add_virtual_proof,
        set_proof_witness,
        verify_proof_circuit,
    )

    common = CommonData.of(inner_data, num_public_inputs)
    rb = R1CSBuilder(public_values=list(proof.public_inputs),
                     spill=spill, spill_dir=spill_dir)
    pt = add_virtual_proof(rb, common)
    inputs: Dict[int, int] = {}
    set_proof_witness(inputs, pt, proof)
    rb.load_inputs(inputs)
    fixed_cap = [
        [rb.constant(int(v)) for v in row] for row in inner_data.fixed_cap_host
    ]
    digest = verify_proof_circuit(rb, common, pt, fixed_cap)
    for t, p in zip(pt.public_inputs, rb.public_targets):
        rb.connect(t, p)
    return rb.r1cs, [rb._read(d) for d in digest]
