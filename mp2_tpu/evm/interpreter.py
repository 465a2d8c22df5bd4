"""A compact EVM bytecode interpreter: enough of the Cancun instruction
set to execute verifier contracts (stack machine, byte-addressed memory,
calldata, STATICCALL into the BN254 precompiles, KECCAK256/SHA256).

Role of `revm` in the reference (groth16-framework/src/evm/executor.rs:
deploy compiled Verifier.sol, call `verifyProof`, read the returned bool).
This environment has no solc, so the companion codegen
(`groth16/evm_codegen.py`) emits the verifier's *runtime bytecode*
directly from the verifying key; this module executes any such bytecode
against calldata, faithfully to EVM semantics for the implemented subset:

  * 256-bit wrapping integer ops incl. signed variants and MULMOD/ADDMOD
  * memory with word-aligned expansion, RETURNDATACOPY plumbing
  * precompiles 0x02 (SHA-256), 0x04 (identity), 0x06/0x07/0x08
    (BN254 add / scalar-mul / pairing-check, backed by native/bn254.cc —
    bilinearity-equivalent to the on-chain optimal-ate precompile, see
    groth16/solidity.py)
  * gas is metered coarsely (per-instruction unit cost) purely to bound
    runaway programs; verifier codegen never depends on gas values.

Unsupported opcodes raise EvmError (= transaction failure), they never
silently no-op.
"""

from __future__ import annotations

import ctypes
import hashlib
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

from mp2_tpu.utils.keccak import keccak256

WORD = (1 << 256) - 1
SIGN_BIT = 1 << 255

# BN254 base-field modulus (precompile input validation)
Q_BN254 = 21888242871839275222246405745257275088696311157297823662689037894645226208583


class EvmError(Exception):
    """Execution failure (bad opcode, stack underflow, out of gas, ...)."""


@dataclass
class EvmResult:
    success: bool
    output: bytes

    def word(self, i: int = 0) -> int:
        return int.from_bytes(self.output[32 * i : 32 * (i + 1)], "big")


# --------------------------------------------------------------------------
# precompiles
# --------------------------------------------------------------------------

_bn_lib = None


def _bn254():
    global _bn_lib
    if _bn_lib is None:
        from mp2_tpu.groth16 import Groth16Unavailable, _load

        lib = _load()
        if lib is None:
            raise Groth16Unavailable("bn254 native backend required for EC precompiles")
        lib.bn254_ec_add.restype = ctypes.c_int
        lib.bn254_ec_mul.restype = ctypes.c_int
        lib.bn254_pairing_prod.restype = ctypes.c_int
        _bn_lib = lib
    return _bn_lib


def _words_to_limbs(data: bytes, n_words: int) -> "ctypes.Array":
    """Big-endian 32-byte words -> per-word little-endian u64 limbs."""
    data = data.ljust(32 * n_words, b"\x00")[: 32 * n_words]
    out = (ctypes.c_uint64 * (4 * n_words))()
    for w in range(n_words):
        v = int.from_bytes(data[32 * w : 32 * w + 32], "big")
        for i in range(4):
            out[4 * w + i] = (v >> (64 * i)) & ((1 << 64) - 1)
    return out


def _limbs_to_words(arr, n_words: int) -> bytes:
    out = b""
    for w in range(n_words):
        v = sum(int(arr[4 * w + i]) << (64 * i) for i in range(4))
        out += v.to_bytes(32, "big")
    return out


def _pre_ecadd(data: bytes) -> bytes:
    inp = _words_to_limbs(data, 4)
    out = (ctypes.c_uint64 * 8)()
    if _bn254().bn254_ec_add(inp, out) != 0:
        raise EvmError("ecAdd: invalid point")
    return _limbs_to_words(out, 2)


def _pre_ecmul(data: bytes) -> bytes:
    inp = _words_to_limbs(data, 3)
    out = (ctypes.c_uint64 * 8)()
    if _bn254().bn254_ec_mul(inp, out) != 0:
        raise EvmError("ecMul: invalid point")
    return _limbs_to_words(out, 2)


def _pre_pairing(data: bytes) -> bytes:
    if len(data) % 192 != 0:
        raise EvmError("ecPairing: input not a multiple of 192 bytes")
    k = len(data) // 192
    inp = _words_to_limbs(data, 6 * k)
    rc = _bn254().bn254_pairing_prod(inp, ctypes.c_int(k))
    if rc < 0:
        raise EvmError("ecPairing: invalid point")
    return int(rc).to_bytes(32, "big")


PRECOMPILES: Dict[int, Callable[[bytes], bytes]] = {
    0x02: lambda d: hashlib.sha256(d).digest(),
    0x04: lambda d: d,
    0x06: _pre_ecadd,
    0x07: _pre_ecmul,
    0x08: _pre_pairing,
}


# --------------------------------------------------------------------------
# interpreter
# --------------------------------------------------------------------------

def _signed(v: int) -> int:
    return v - (1 << 256) if v & SIGN_BIT else v


class _Memory:
    __slots__ = ("buf",)

    def __init__(self):
        self.buf = bytearray()

    def _expand(self, end: int):
        if end > len(self.buf):
            # word-aligned growth like the EVM
            self.buf.extend(b"\x00" * (((end + 31) // 32) * 32 - len(self.buf)))

    def load(self, off: int, n: int) -> bytes:
        if n == 0:
            return b""
        self._expand(off + n)
        return bytes(self.buf[off : off + n])

    def store(self, off: int, data: bytes):
        if not data:
            return
        self._expand(off + len(data))
        self.buf[off : off + len(data)] = data


def _valid_jumpdests(code: bytes) -> set:
    dests = set()
    i = 0
    while i < len(code):
        op = code[i]
        if op == 0x5B:
            dests.add(i)
        if 0x60 <= op <= 0x7F:
            i += op - 0x5F
        i += 1
    return dests


def execute(
    code: bytes,
    calldata: bytes = b"",
    gas: int = 10_000_000,
    storage: Optional[Dict[int, int]] = None,
) -> EvmResult:
    """Run `code` as runtime bytecode against `calldata`.  Returns the
    RETURN/REVERT payload; raises EvmError only on interpreter-level
    failures surfaced as exceptions by the caller's contract (a REVERT is
    reported as success=False, not an exception)."""
    stack: List[int] = []
    mem = _Memory()
    store = storage if storage is not None else {}
    returndata = b""
    dests = _valid_jumpdests(code)
    pc = 0
    steps = gas

    def push(v: int):
        if len(stack) >= 1024:
            raise EvmError("stack overflow")
        stack.append(v & WORD)

    def pop(n: int = 1):
        if len(stack) < n:
            raise EvmError("stack underflow")
        if n == 1:
            return stack.pop()
        return [stack.pop() for _ in range(n)]

    while True:
        steps -= 1
        if steps <= 0:
            raise EvmError("out of gas")
        if pc >= len(code):
            return EvmResult(True, b"")  # implicit STOP
        op = code[pc]
        pc += 1

        if 0x60 <= op <= 0x7F:  # PUSH1..PUSH32
            n = op - 0x5F
            push(int.from_bytes(code[pc : pc + n], "big"))
            pc += n
        elif 0x80 <= op <= 0x8F:  # DUP1..DUP16
            n = op - 0x7F
            if len(stack) < n:
                raise EvmError("stack underflow")
            push(stack[-n])
        elif 0x90 <= op <= 0x9F:  # SWAP1..SWAP16
            n = op - 0x8F
            if len(stack) < n + 1:
                raise EvmError("stack underflow")
            stack[-1], stack[-n - 1] = stack[-n - 1], stack[-1]
        elif op == 0x00:  # STOP
            return EvmResult(True, b"")
        elif op == 0x01:  # ADD
            push(pop() + pop())
        elif op == 0x02:  # MUL
            push(pop() * pop())
        elif op == 0x03:  # SUB
            a, b = pop(), pop()
            push(a - b)
        elif op == 0x04:  # DIV
            a, b = pop(), pop()
            push(0 if b == 0 else a // b)
        elif op == 0x05:  # SDIV
            a, b = _signed(pop()), _signed(pop())
            push(0 if b == 0 else abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1))
        elif op == 0x06:  # MOD
            a, b = pop(), pop()
            push(0 if b == 0 else a % b)
        elif op == 0x07:  # SMOD
            a, b = _signed(pop()), _signed(pop())
            push(0 if b == 0 else (abs(a) % abs(b)) * (1 if a >= 0 else -1))
        elif op == 0x08:  # ADDMOD
            a, b, m = pop(), pop(), pop()
            push(0 if m == 0 else (a + b) % m)
        elif op == 0x09:  # MULMOD
            a, b, m = pop(), pop(), pop()
            push(0 if m == 0 else (a * b) % m)
        elif op == 0x0A:  # EXP
            a, b = pop(), pop()
            push(pow(a, b, 1 << 256))
        elif op == 0x10:  # LT
            a, b = pop(), pop()
            push(1 if a < b else 0)
        elif op == 0x11:  # GT
            a, b = pop(), pop()
            push(1 if a > b else 0)
        elif op == 0x12:  # SLT
            a, b = _signed(pop()), _signed(pop())
            push(1 if a < b else 0)
        elif op == 0x13:  # SGT
            a, b = _signed(pop()), _signed(pop())
            push(1 if a > b else 0)
        elif op == 0x14:  # EQ
            push(1 if pop() == pop() else 0)
        elif op == 0x15:  # ISZERO
            push(1 if pop() == 0 else 0)
        elif op == 0x16:  # AND
            push(pop() & pop())
        elif op == 0x17:  # OR
            push(pop() | pop())
        elif op == 0x18:  # XOR
            push(pop() ^ pop())
        elif op == 0x19:  # NOT
            push(~pop())
        elif op == 0x1A:  # BYTE
            i, x = pop(), pop()
            push((x >> (8 * (31 - i))) & 0xFF if i < 32 else 0)
        elif op == 0x1B:  # SHL
            s, v = pop(), pop()
            push(0 if s >= 256 else v << s)
        elif op == 0x1C:  # SHR
            s, v = pop(), pop()
            push(0 if s >= 256 else v >> s)
        elif op == 0x1D:  # SAR
            s, v = pop(), _signed(pop())
            push((v >> s) if s < 256 else (0 if v >= 0 else WORD))
        elif op == 0x20:  # KECCAK256
            off, n = pop(), pop()
            push(int.from_bytes(keccak256(mem.load(off, n)), "big"))
        elif op == 0x34:  # CALLVALUE
            push(0)
        elif op == 0x35:  # CALLDATALOAD
            off = pop()
            push(int.from_bytes(calldata[off : off + 32].ljust(32, b"\x00"), "big"))
        elif op == 0x36:  # CALLDATASIZE
            push(len(calldata))
        elif op == 0x37:  # CALLDATACOPY
            dst, src, n = pop(), pop(), pop()
            mem.store(dst, calldata[src : src + n].ljust(n, b"\x00"))
        elif op == 0x38:  # CODESIZE
            push(len(code))
        elif op == 0x39:  # CODECOPY
            dst, src, n = pop(), pop(), pop()
            mem.store(dst, code[src : src + n].ljust(n, b"\x00"))
        elif op == 0x3D:  # RETURNDATASIZE
            push(len(returndata))
        elif op == 0x3E:  # RETURNDATACOPY
            dst, src, n = pop(), pop(), pop()
            if src + n > len(returndata):
                raise EvmError("returndatacopy out of bounds")
            mem.store(dst, returndata[src : src + n])
        elif op == 0x50:  # POP
            pop()
        elif op == 0x51:  # MLOAD
            push(int.from_bytes(mem.load(pop(), 32), "big"))
        elif op == 0x52:  # MSTORE
            off, v = pop(), pop()
            mem.store(off, v.to_bytes(32, "big"))
        elif op == 0x53:  # MSTORE8
            off, v = pop(), pop()
            mem.store(off, bytes([v & 0xFF]))
        elif op == 0x54:  # SLOAD
            push(store.get(pop(), 0))
        elif op == 0x55:  # SSTORE
            k, v = pop(), pop()
            store[k] = v
        elif op == 0x56:  # JUMP
            pc = pop()
            if pc not in dests:
                raise EvmError(f"invalid jump target {pc}")
        elif op == 0x57:  # JUMPI
            t, c = pop(), pop()
            if c:
                if t not in dests:
                    raise EvmError(f"invalid jump target {t}")
                pc = t
        elif op == 0x58:  # PC
            push(pc - 1)
        elif op == 0x59:  # MSIZE
            push(len(mem.buf))
        elif op == 0x5A:  # GAS
            push(steps)
        elif op == 0x5B:  # JUMPDEST
            pass
        elif op == 0x5F:  # PUSH0
            push(0)
        elif op in (0xFA, 0xF1):  # STATICCALL / CALL (value-less only)
            if op == 0xFA:
                _gas, addr, aoff, alen, roff, rlen = (
                    pop(), pop(), pop(), pop(), pop(), pop(),
                )
            else:
                _gas, addr, value, aoff, alen, roff, rlen = (
                    pop(), pop(), pop(), pop(), pop(), pop(), pop(),
                )
                if value != 0:
                    raise EvmError("CALL with value unsupported")
            fn = PRECOMPILES.get(addr)
            if fn is None:
                raise EvmError(f"call to unsupported address {addr:#x}")
            try:
                returndata = fn(mem.load(aoff, alen))
            except EvmError:
                returndata = b""
                push(0)
            else:
                mem.store(roff, returndata[:rlen])
                push(1)
        elif op == 0xF3:  # RETURN
            off, n = pop(), pop()
            return EvmResult(True, mem.load(off, n))
        elif op == 0xFD:  # REVERT
            off, n = pop(), pop()
            return EvmResult(False, mem.load(off, n))
        elif op == 0xFE:  # INVALID
            raise EvmError("INVALID opcode")
        else:
            raise EvmError(f"unsupported opcode {op:#04x} at {pc - 1}")


# --------------------------------------------------------------------------
# calldata ABI helpers (static types only — all the verifier needs)
# --------------------------------------------------------------------------

def selector(signature: str) -> bytes:
    return keccak256(signature.encode())[:4]


def encode_call(signature: str, words: List[int]) -> bytes:
    """ABI-encode a call whose arguments flatten to static 32-byte words
    (uint256 / fixed-size uint256 arrays)."""
    return selector(signature) + b"".join(
        (int(w) & WORD).to_bytes(32, "big") for w in words
    )
