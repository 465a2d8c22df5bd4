"""Groth16 on-chain wrap (API surface; CPU-native backend pending).

Reference counterpart: groth16-framework + gnark-utils (SURVEY.md §2.7) —
the final revelation proof is re-wrapped under a standard-Poseidon config,
proven inside a gnark BN254 Groth16 circuit (Go), and verified by generated
Solidity on-chain.  BN254 pairing arithmetic is CPU-bound scalar work with
no TPU value, so the reference's architecture (host-native wrap) carries
over unchanged.

This build environment has no Go toolchain and no redistributable BN254
library, so this module provides:
  * the full API surface (`compile_and_generate_assets`, `Groth16Prover`,
    `Groth16Verifier`, `EVMVerifier`) with availability gating, so callers
    can be written against the final interface today;
  * `FinalProofBundle`: the calldata-shaped envelope combining the (future)
    Groth16 proof with the revelation public inputs — `combine_proofs`
    parity (groth16-framework/src/prover/groth16.rs:118);
  * a deterministic commitment in place of the SNARK while the C++ BN254
    backend (planned: native/bn254.cc — pairing, MSM, Groth16 prove) lands.

NOT a proof system: `available()` is False until the native backend exists,
and callers must treat bundles as unverified commitments.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import List, Optional, Tuple


def available() -> bool:
    """True once a BN254 Groth16 backend is present."""
    return False


class Groth16Unavailable(RuntimeError):
    def __init__(self):
        super().__init__(
            "BN254 Groth16 backend not built in this environment (no Go "
            "toolchain; C++ backend planned). Use FinalProofBundle for "
            "plumbing; do not treat it as a verified SNARK."
        )


def compile_and_generate_assets(circuit_digest, asset_dir: str):
    """Reference: writes circuit.bin / r1cs.bin / pk.bin / vk.bin /
    Verifier.sol (compiler.rs:27)."""
    raise Groth16Unavailable()


class Groth16Prover:
    @staticmethod
    def from_assets(asset_dir: str) -> "Groth16Prover":
        raise Groth16Unavailable()

    def prove(self, wrapped_proof_bytes: bytes) -> bytes:
        raise Groth16Unavailable()


class Groth16Verifier:
    @staticmethod
    def from_assets(asset_dir: str) -> "Groth16Verifier":
        raise Groth16Unavailable()

    def verify(self, calldata: bytes) -> bool:
        raise Groth16Unavailable()


class EVMVerifier:
    """Reference: executes the generated Solidity verifier under revm
    (verifier/evm.rs:17-29)."""

    @staticmethod
    def from_solidity(sol_path: str) -> "EVMVerifier":
        raise Groth16Unavailable()


@dataclass(frozen=True)
class FinalProofBundle:
    """combine_proofs-shaped envelope: groth16 calldata (when available)
    concatenated with the revelation public inputs."""

    revelation_public_inputs: List[int]
    groth16_calldata: Optional[bytes]  # None until the backend lands
    commitment: bytes  # sha256 over the PIs (query.rs:23-100 binds sha256(PI))

    @staticmethod
    def from_revelation(public_inputs: List[int]) -> "FinalProofBundle":
        data = json.dumps([int(x) for x in public_inputs]).encode()
        return FinalProofBundle(
            revelation_public_inputs=[int(x) for x in public_inputs],
            groth16_calldata=None,
            commitment=hashlib.sha256(data).digest(),
        )

    def serialize(self) -> bytes:
        return json.dumps(
            {
                "pis": self.revelation_public_inputs,
                "calldata": self.groth16_calldata.hex()
                if self.groth16_calldata
                else None,
                "commitment": self.commitment.hex(),
            }
        ).encode()
