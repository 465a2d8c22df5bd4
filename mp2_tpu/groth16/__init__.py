"""Groth16 on-chain wrap over the C++ BN254 backend (native/bn254.cc).

Reference counterpart: groth16-framework + gnark-utils (SURVEY.md §2.7) —
the final revelation proof is wrapped in a BN254 Groth16 proof for cheap
on-chain verification.  BN254 pairing arithmetic is CPU-bound scalar work
with no TPU value, so the reference's architecture (host-native wrap)
carries over: this module drives `native/bn254.cc`, a from-scratch C++
implementation of Montgomery Fq/Fr, the Fq2/Fq6/Fq12 tower, the Tate
pairing (generic Miller loop — bilinearity self-tested at load), Fr FFT,
and Groth16 setup/prove/verify over an R1CS.

Scope vs the reference: the reference's gnark circuit verifies the wrapped
plonky2 proof INSIDE the SNARK (gnark-plonky2-verifier).  The same holds
here: groth16/r1cs_builder.py builds the COMPLETE in-SNARK TP2 verifier
(transcript replay, zeta identity, full FRI verification, circuit-digest
binding to the wrap VK) as an R1CS over the gadget layer in
groth16/r1cs.py (Goldilocks emulation + the full Poseidon2 permutation);
proven end-to-end over the real revelation proof in
tests/test_full_stack.py.  The lighter statements
(wrap_revelation_poseidon: in-SNARK Poseidon2 PI commitment;
wrap_revelation: squaring-chain binding) remain as fast paths for tests.
The CRS is generated in-process (dev-grade trusted setup, like gnark's
test setup).
"""

from __future__ import annotations

import ctypes
import hashlib
import json
import os
import subprocess
from dataclasses import dataclass
from typing import List, Optional, Tuple

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "bn254.cc")
_OUT = os.path.join(_REPO, "native", "build", "libbn254.so")

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_OUT) or (
            os.path.getmtime(_OUT) < os.path.getmtime(_SRC)
        ):
            os.makedirs(os.path.dirname(_OUT), exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-pthread",
                 "-o", _OUT, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_OUT)
        lib.bn254_selftest.restype = ctypes.c_int
        lib.bn254_wrap_roundtrip.restype = ctypes.c_int
        lib.bn254_wrap_roundtrip.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64, ctypes.c_int,
        ]
        lib.bn254_groth16_r1cs.restype = ctypes.c_int
        lib.bn254_groth16_csr.restype = ctypes.c_int
        lib.bn254_r1cs_check_csr.restype = ctypes.c_longlong
        if lib.bn254_selftest() != 0:
            return None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    """True when the BN254 backend compiled and its pairing self-test
    (group orders, bilinearity, non-degeneracy) passes."""
    return _load() is not None


class Groth16Unavailable(RuntimeError):
    def __init__(self):
        super().__init__(
            "BN254 Groth16 backend unavailable (native build failed or "
            "self-test did not pass)."
        )


def wrap_revelation(public_inputs: List[int], seed: int = 42) -> "FinalProofBundle":
    """Groth16-prove the binding commitment of the revelation public
    inputs and verify it (prove -> verify roundtrip inside the native
    backend); returns the calldata-shaped bundle."""
    lib = _load()
    if lib is None:
        raise Groth16Unavailable()
    pis = [int(x) for x in public_inputs]
    arr = (ctypes.c_uint64 * len(pis))(*pis)
    commit = (ctypes.c_uint64 * 4)()
    rc = lib.bn254_wrap_roundtrip(arr, len(pis), commit, seed, 0)
    if rc != 0:
        raise RuntimeError(f"groth16 wrap failed: rc={rc}")
    commitment = b"".join(int(commit[i]).to_bytes(8, "little") for i in range(4))
    return FinalProofBundle(
        revelation_public_inputs=pis,
        groth16_calldata=commitment,  # Fr commitment the SNARK proved
        commitment=hashlib.sha256(
            json.dumps(pis).encode()
        ).digest(),
    )


def _run_r1cs(r1cs, seed: int, tamper: bool) -> int:
    import numpy as np

    lib = _load()
    if lib is None:
        raise Groth16Unavailable()
    (ap, aw, ac), (bp, bw, bc), (cp, cw, cc), wit = r1cs.to_arrays()
    LL = ctypes.POINTER(ctypes.c_longlong)
    II = ctypes.POINTER(ctypes.c_int)
    UU = ctypes.POINTER(ctypes.c_uint64)

    def ptr(a, t):
        return a.ctypes.data_as(t)

    return lib.bn254_groth16_r1cs(
        ctypes.c_longlong(len(r1cs.rows)),
        ctypes.c_longlong(len(r1cs.witness)),
        ctypes.c_longlong(r1cs.num_public),
        ptr(ap, LL), ptr(aw, II), ptr(ac, UU),
        ptr(bp, LL), ptr(bw, II), ptr(bc, UU),
        ptr(cp, LL), ptr(cw, II), ptr(cc, UU),
        ptr(wit, UU), ctypes.c_uint64(seed), ctypes.c_int(1 if tamper else 0),
    )


def _run_r1cs_csr(r1cs, seed: int, tamper: bool) -> int:
    """Zero-copy Groth16 run for very large statements: packs the R1CS
    into CSR arrays while FREEING the Python rows (to_arrays_consuming),
    then hands the buffers to bn254_groth16_csr, which consumes them in
    place (no native-side matrix copy).  The R1CS object is unusable
    afterwards."""
    lib = _load()
    if lib is None:
        raise Groth16Unavailable()
    n_rows = len(r1cs.rows)
    n_wires = len(r1cs.witness)
    (ap, aw, ac), (bp, bw, bc), (cp, cw, cc), wit = r1cs.to_arrays_consuming()
    r1cs.witness = []
    LL = ctypes.POINTER(ctypes.c_longlong)
    II = ctypes.POINTER(ctypes.c_int)
    UU = ctypes.POINTER(ctypes.c_uint64)

    def ptr(a, t):
        return a.ctypes.data_as(t)

    return lib.bn254_groth16_csr(
        ctypes.c_longlong(n_rows),
        ctypes.c_longlong(n_wires),
        ctypes.c_longlong(r1cs.num_public),
        ptr(ap, LL), ptr(aw, II), ptr(ac, UU),
        ptr(bp, LL), ptr(bw, II), ptr(bc, UU),
        ptr(cp, LL), ptr(cw, II), ptr(cc, UU),
        ptr(wit, UU), ctypes.c_uint64(seed), ctypes.c_int(1 if tamper else 0),
    )


def _check_csr_native(r1cs):
    """Threaded native satisfaction check for a SPILL-mode R1CS (rows
    already packed to disk-backed CSR fragments).  Returns True/False, or
    None when the native backend is unavailable (caller falls back to the
    Python row replay)."""
    lib = _load()
    if lib is None:
        return None
    # snapshot (not finalize): check() must not freeze the store — further
    # appends after a mid-build check stay legal (advisor r3, medium).
    rows = r1cs.rows
    views = rows._final if rows._final is not None else rows.snapshot()
    (ap, aw, ac), (bp, bw, bc), (cp, cw, cc) = views
    wit = r1cs.pack_witness()
    LL = ctypes.POINTER(ctypes.c_longlong)
    II = ctypes.POINTER(ctypes.c_int)
    UU = ctypes.POINTER(ctypes.c_uint64)

    def ptr(a, t):
        return a.ctypes.data_as(t)

    bad = lib.bn254_r1cs_check_csr(
        ctypes.c_longlong(len(r1cs.rows)),
        ctypes.c_longlong(len(r1cs.witness)),
        ptr(ap, LL), ptr(aw, II), ptr(ac, UU),
        ptr(bp, LL), ptr(bw, II), ptr(bc, UU),
        ptr(cp, LL), ptr(cw, II), ptr(cc, UU),
        ptr(wit, UU),
    )
    return bad < 0


def wrap_revelation_poseidon(
    public_inputs: List[int], seed: int = 42, tamper: bool = False
) -> "FinalProofBundle":
    """Groth16-prove the POSEIDON2 commitment of the revelation public
    inputs: the SNARK recomputes hash_no_pad(PIs) over emulated Goldilocks
    (groth16/r1cs.py) and exposes PIs + hash as public inputs — the same
    commitment the TP2 transcript binds.  `tamper=True` runs the
    negative path (returns normally iff the forged proof was rejected)."""
    from mp2_tpu.groth16.r1cs import build_pi_binding_circuit
    from mp2_tpu.hash import poseidon2_host as p2h

    pis = [int(x) for x in public_inputs]
    r1cs, want = build_pi_binding_circuit(pis)
    rc = _run_r1cs(r1cs, seed, tamper)
    if tamper:
        if rc != 1:
            raise RuntimeError(f"tampered proof was NOT rejected: rc={rc}")
    elif rc != 0:
        raise RuntimeError(f"groth16 poseidon wrap failed: rc={rc}")
    commitment = b"".join(int(h).to_bytes(8, "little") for h in want)
    return FinalProofBundle(
        revelation_public_inputs=pis,
        groth16_calldata=commitment,
        commitment=commitment,
    )


def verify_tamper_rejected(public_inputs: List[int], seed: int = 42) -> bool:
    """Negative-path check: a proof must NOT verify against tampered
    public inputs (used by tests)."""
    lib = _load()
    if lib is None:
        raise Groth16Unavailable()
    pis = [int(x) for x in public_inputs]
    arr = (ctypes.c_uint64 * len(pis))(*pis)
    commit = (ctypes.c_uint64 * 4)()
    return lib.bn254_wrap_roundtrip(arr, len(pis), commit, seed, 1) == 1


def compile_and_generate_assets(public_inputs, asset_dir: str, seed: int = 42):
    """Generate verifier.sol + vk.json + proof.json for the Poseidon2
    PI-binding statement (groth16-framework utils.rs asset layout)."""
    from mp2_tpu.groth16.solidity import compile_and_generate_assets as gen

    return gen(public_inputs, asset_dir, seed)


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
    (verifier/evm.rs:17-29); planned with asset generation."""

    @staticmethod
    def from_solidity(sol_path: str) -> "EVMVerifier":
        raise Groth16Unavailable()


@dataclass(frozen=True)
class FinalProofBundle:
    """combine_proofs-shaped envelope: groth16-proved commitment
    concatenated with the revelation public inputs."""

    revelation_public_inputs: List[int]
    groth16_calldata: Optional[bytes]
    commitment: bytes  # sha256 over the PIs (query.rs:23-100 binds sha256(PI))

    @staticmethod
    def from_revelation(public_inputs: List[int]) -> "FinalProofBundle":
        if available():
            return wrap_revelation(public_inputs)
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
