"""Single source of truth binding the deployable Solidity verifier to the
executed EVM bytecode.

The reference compiles its generated Verifier.sol and EXECUTES it under
revm (groth16-framework/src/verifier/evm.rs:17-29), so the deployed
artifact can never silently rot.  This environment has no solc, so the
binding is structural + semantic instead:

  * `VerifierSpec.from_vk(vk)` is the canonical statement of what the
    verifier must check (constants + pairing-row order + A-negation);
    both `solidity.generate_verifier_solidity` and
    `evm_codegen.generate_verifier_bytecode` embed exactly these values.
  * `VerifierSpec.parse_solidity(text)` recovers the spec back OUT of the
    emitted contract source (constants, input count, argument order); a
    test asserts parse(sol(vk)) == from_vk(vk), so any drift in the
    Solidity template's constants or pairing-row wiring fails loudly.
  * `VerifierSpec.evaluate(proof, public)` executes the SPEC's semantics
    directly over the same BN254 precompile backends the in-process EVM
    uses (evm/interpreter.py 0x06/0x07/0x08 -> native/bn254.cc); a test
    asserts it agrees with `verify_on_evm` (the bytecode run) on valid
    AND tampered vectors, so bytecode semantics cannot diverge from the
    contract the customer deploys.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def _g2_evm(v: Sequence[int]) -> List[int]:
    """internal (x.c0, x.c1, y.c0, y.c1) -> EVM order (x1, x0, y1, y0)."""
    return [v[1], v[0], v[3], v[2]]


def _g2_internal(v: Sequence[int]) -> List[int]:
    return [v[1], v[0], v[3], v[2]]  # involution


@dataclass(frozen=True)
class VerifierSpec:
    """The Groth16 check e(-A,B) e(alpha,beta) e(vk_x,gamma) e(C,delta)==1
    with vk_x = IC0 + sum_i input_i * IC_{i+1}."""

    alpha1: Tuple[int, int]
    beta2: Tuple[int, int, int, int]    # internal order (x.c0,x.c1,y.c0,y.c1)
    gamma2: Tuple[int, int, int, int]
    delta2: Tuple[int, int, int, int]
    ic: Tuple[Tuple[int, int], ...]

    @property
    def n_inputs(self) -> int:
        return len(self.ic) - 1

    @staticmethod
    def from_vk(vk: Dict) -> "VerifierSpec":
        return VerifierSpec(
            alpha1=tuple(int(v) for v in vk["alpha1"]),
            beta2=tuple(int(v) for v in vk["beta2"]),
            gamma2=tuple(int(v) for v in vk["gamma2"]),
            delta2=tuple(int(v) for v in vk["delta2"]),
            ic=tuple(tuple(int(x) for x in p) for p in vk["ic"]),
        )

    # -- semantics -------------------------------------------------------
    def evaluate(self, proof: Dict, public: Sequence[int]) -> bool:
        """Run the spec's own semantics over the EVM precompile backends
        (the reference implementation both artifacts must match)."""
        from mp2_tpu.evm.interpreter import _pre_ecadd, _pre_ecmul, _pre_pairing

        assert len(public) == self.n_inputs

        def w(*vals: int) -> bytes:
            return b"".join(int(v).to_bytes(32, "big") for v in vals)

        vk_x = w(*self.ic[0])
        for i, s in enumerate(public):
            mul = _pre_ecmul(w(*self.ic[i + 1], int(s)))
            vk_x = _pre_ecadd(vk_x + mul)

        ax, ay = (int(v) for v in proof["a"])
        neg_a = (0, 0) if (ax == 0 and ay == 0) else (ax, (Q - ay % Q) % Q)
        rows = (
            w(*neg_a) + w(*_g2_evm(proof["b"]))
            + w(*self.alpha1) + w(*_g2_evm(self.beta2))
            + vk_x + w(*_g2_evm(self.gamma2))
            + w(*proof["c"]) + w(*_g2_evm(self.delta2))
        )
        return int.from_bytes(_pre_pairing(rows), "big") == 1

    # -- recovery from the emitted contract ------------------------------
    @staticmethod
    def parse_solidity(text: str) -> "VerifierSpec":
        """Recover the spec from `generate_verifier_solidity` output.
        Raises ValueError if the contract does not have the expected
        pairing-row structure (negate(A) first, alpha/beta second,
        vk_x/gamma third, C/delta fourth)."""

        def ints(pattern: str, s: str) -> List[List[int]]:
            return [
                [int(g) for g in m] for m in re.findall(pattern, s)
            ]

        m = re.search(
            r"uint256\[(\d+)\] memory input\s*\)", text
        )
        if not m:
            raise ValueError("input array declaration not found")
        n = int(m.group(1))

        ic0 = ints(r"vk_x =\s*\n\s*Pairing\.G1Point\((\d+), (\d+)\);", text)
        if len(ic0) != 1:
            raise ValueError("IC0 initialiser not found")
        ic_terms = ints(
            r"Pairing\.scalar_mul\(Pairing\.G1Point\((\d+), (\d+)\), "
            r"input\[(\d+)\]\)",
            text,
        )
        if [t[2] for t in ic_terms] != list(range(n)):
            raise ValueError("IC scalar-mul terms out of order")
        ic = tuple([tuple(ic0[0])] + [tuple(t[:2]) for t in ic_terms])

        # the pairing4 call: 4 rows in fixed roles
        m = re.search(
            r"return Pairing\.pairing4\(\s*"
            r"Pairing\.negate\(Pairing\.G1Point\(a\[0\], a\[1\]\)\),\s*"
            r"Pairing\.G2Point\(\[b\[0\], b\[1\]\], \[b\[2\], b\[3\]\]\),\s*"
            r"Pairing\.G1Point\((\d+), (\d+)\),\s*"
            r"Pairing\.G2Point\(\[(\d+), (\d+)\], \[(\d+), (\d+)\]\),\s*"
            r"vk_x,\s*"
            r"Pairing\.G2Point\(\[(\d+), (\d+)\], \[(\d+), (\d+)\]\),\s*"
            r"Pairing\.G1Point\(c\[0\], c\[1\]\),\s*"
            r"Pairing\.G2Point\(\[(\d+), (\d+)\], \[(\d+), (\d+)\]\)\s*\);",
            text,
        )
        if not m:
            raise ValueError("pairing4 call does not match the spec shape")
        g = [int(x) for x in m.groups()]
        return VerifierSpec(
            alpha1=(g[0], g[1]),
            beta2=tuple(_g2_internal(g[2:6])),
            gamma2=tuple(_g2_internal(g[6:10])),
            delta2=tuple(_g2_internal(g[10:14])),
            ic=ic,
        )
