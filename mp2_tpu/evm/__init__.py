"""Minimal EVM execution for verifying the generated Groth16 contract
in-process (the reference's revm-backed `EVMVerifier`,
groth16-framework/src/verifier/evm.rs:17-29 + evm/executor.rs)."""

from mp2_tpu.evm.interpreter import EvmError, EvmResult, execute

__all__ = ["execute", "EvmResult", "EvmError"]
