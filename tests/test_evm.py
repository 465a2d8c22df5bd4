"""In-process EVM executor + generated Groth16 verifier bytecode
(the reference's revm-backed EVMVerifier, groth16-framework/src/verifier/
evm.rs:17-29 and tests/query.rs:23-100)."""

import pytest

from mp2_tpu.evm.interpreter import EvmResult, encode_call, execute

# BN254 generators (canonical affine)
G1 = (1, 2)
G2_EVM = (  # (x_im, x_re, y_im, y_re) — EVM precompile order
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
)
Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def _groth16_available():
    from mp2_tpu.groth16 import available

    return available()


needs_bn254 = pytest.mark.skipif(
    not _groth16_available(), reason="native bn254 backend not built"
)


# ---------------------------------------------------------------- interpreter
def test_interpreter_add_return():
    # return calldata[0] + calldata[4:36]... program: two words summed
    code = bytes(
        [
            0x60, 0x00, 0x35,        # PUSH1 0; CALLDATALOAD
            0x60, 0x20, 0x35,        # PUSH1 32; CALLDATALOAD
            0x01,                    # ADD
            0x60, 0x00, 0x52,        # PUSH1 0; MSTORE
            0x60, 0x20, 0x60, 0x00, 0xF3,  # RETURN(0, 32)
        ]
    )
    data = (41).to_bytes(32, "big") + (1).to_bytes(32, "big")
    res = execute(code, data)
    assert res.success and res.word() == 42


def test_interpreter_revert_and_jump():
    # JUMPI over a revert, then return 7
    code = bytes(
        [
            0x60, 0x01,              # PUSH1 1 (cond)
            0x60, 0x08,              # PUSH1 8 (dest)
            0x57,                    # JUMPI
            0x5F, 0x5F, 0xFD,        # REVERT(0,0)
            0x5B,                    # JUMPDEST @8
            0x60, 0x07, 0x5F, 0x52,  # MSTORE(0, 7)
            0x60, 0x20, 0x5F, 0xF3,  # RETURN(0, 32)
        ]
    )
    res = execute(code, b"")
    assert res.success and res.word() == 7
    # flipping the condition hits the revert
    bad = bytearray(code)
    bad[1] = 0
    res2 = execute(bytes(bad), b"")
    assert isinstance(res2, EvmResult) and not res2.success


def test_interpreter_keccak_and_mod():
    from mp2_tpu.utils.keccak import keccak256

    # KECCAK256 over 3 calldata bytes copied to memory
    code = bytes(
        [
            0x60, 0x03, 0x60, 0x00, 0x60, 0x00, 0x37,  # CALLDATACOPY(0,0,3)
            0x60, 0x03, 0x60, 0x00, 0x20,              # KECCAK256(0,3)
            0x60, 0x00, 0x52,
            0x60, 0x20, 0x60, 0x00, 0xF3,
        ]
    )
    res = execute(code, b"abc")
    assert res.word() == int.from_bytes(keccak256(b"abc"), "big")


# ---------------------------------------------------------------- precompiles
@needs_bn254
def test_ec_precompiles_consistent():
    from mp2_tpu.evm.interpreter import _pre_ecadd, _pre_ecmul

    w = lambda v: int(v).to_bytes(32, "big")
    twoG_add = _pre_ecadd(w(G1[0]) + w(G1[1]) + w(G1[0]) + w(G1[1]))
    twoG_mul = _pre_ecmul(w(G1[0]) + w(G1[1]) + w(2))
    assert twoG_add == twoG_mul
    # identity: P + O == P
    same = _pre_ecadd(w(G1[0]) + w(G1[1]) + w(0) + w(0))
    assert same == w(G1[0]) + w(G1[1])
    # invalid point rejected
    from mp2_tpu.evm.interpreter import EvmError

    with pytest.raises(EvmError):
        _pre_ecadd(w(G1[0]) + w(G1[1] + 1) + w(0) + w(0))


@needs_bn254
def test_pairing_precompile():
    from mp2_tpu.evm.interpreter import _pre_pairing

    w = lambda v: int(v).to_bytes(32, "big")
    g2 = b"".join(w(v) for v in G2_EVM)
    negG1 = w(G1[0]) + w(Q - G1[1])
    posG1 = w(G1[0]) + w(G1[1])
    # e(G,H) * e(-G,H) == 1
    assert _pre_pairing(posG1 + g2 + negG1 + g2) == (1).to_bytes(32, "big")
    # e(G,H) != 1
    assert _pre_pairing(posG1 + g2) == (0).to_bytes(32, "big")


# ------------------------------------------------------- generated verifier
@needs_bn254
def test_groth16_verifier_on_evm():
    """Full on-chain story in-process: PI-binding R1CS -> Groth16 ->
    generated verifier bytecode -> EVM execution (tests/query.rs role)."""
    from mp2_tpu.groth16.evm_codegen import (
        generate_verifier_bytecode,
        verifier_signature,
        verify_on_evm,
    )
    from mp2_tpu.groth16.r1cs import build_pi_binding_circuit
    from mp2_tpu.groth16.solidity import export_vk_and_proof

    pis = [3, 1, 4, 1, 5]
    r1cs, want = build_pi_binding_circuit(pis)
    vk, pf = export_vk_and_proof(r1cs, seed=7)
    assert pf["public"][: len(pis)] == pis
    assert verify_on_evm(vk, pf["proof"], pf["public"])

    # tampering with any public input flips the verdict
    bad = list(pf["public"])
    bad[0] += 1
    assert not verify_on_evm(vk, pf["proof"], bad)

    # wrong selector reverts
    code = generate_verifier_bytecode(vk)
    res = execute(code, encode_call("bogus()", []))
    assert not res.success

    # proof words mangled -> pairing check fails (returns 0) or reverts
    from mp2_tpu.groth16.evm_codegen import _g2_evm

    words = (
        list(pf["proof"]["a"])
        + _g2_evm(pf["proof"]["b"])
        + list(pf["proof"]["c"])
        + [int(x) for x in pf["public"]]
    )
    words[0] += 1  # off-curve A
    res = execute(
        code, encode_call(verifier_signature(len(pf["public"])), words)
    )
    assert (not res.success) or res.word() == 0
