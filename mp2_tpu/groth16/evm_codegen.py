"""EVM runtime-bytecode generation for the Groth16 verifier.

The reference compiles its generated `Verifier.sol` with solc and executes
it under revm (groth16-framework/src/verifier/evm.rs + tests/query.rs).
This environment has no solc, so the same contract is emitted directly as
runtime bytecode — semantically identical to `groth16/solidity.py`'s
source: `verifyProof(uint256[2],uint256[4],uint256[2],uint256[N])` computes

    vk_x  = IC0 + sum_i input_i * IC_{i+1}          (ecMul/ecAdd precompiles)
    check e(-A, B) * e(alpha, beta) * e(vk_x, gamma) * e(C, delta) == 1

and returns the pairing-precompile verdict word.  Wrong selectors and
failed precompile calls revert, like the Solidity `require`s.

The bytecode runs under `mp2_tpu.evm.execute` (in-process, precompiles
backed by native/bn254.cc) and is equally deployable on a real chain.
"""

from __future__ import annotations

from typing import Dict, List

from mp2_tpu.evm.interpreter import selector

Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583

# memory map (bytes)
_VKX = 0x100        # running vk_x accumulator (2 words)
_MUL = 0x140        # ecMul input: point (2 words) + scalar (1 word)
_PAIR = 0x200       # pairing input: 4 x (G1 2 words + G2 4 words) = 0x300
_OUT = 0x00         # pairing output word


class Asm:
    """Two-pass EVM assembler: ops append bytes; labels patch PUSH2s."""

    def __init__(self):
        self.code = bytearray()
        self._fixups: List[tuple] = []
        self._labels: Dict[str, int] = {}

    def raw(self, *bs: int):
        self.code.extend(bs)

    def push(self, v: int):
        assert v >= 0
        b = v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")
        assert len(b) <= 32
        self.raw(0x5F + len(b), *b)

    def push_label(self, name: str):
        self.raw(0x61)  # PUSH2
        self._fixups.append((len(self.code), name))
        self.raw(0, 0)

    def label(self, name: str):
        assert name not in self._labels
        self._labels[name] = len(self.code)
        self.raw(0x5B)  # JUMPDEST

    def op(self, name: str):
        self.raw(_OPS[name])

    def mstore(self, off: int, value: int):
        self.push(value)
        self.push(off)
        self.op("MSTORE")

    def calldataload_to(self, mem_off: int, cd_off: int):
        self.push(cd_off)
        self.op("CALLDATALOAD")
        self.push(mem_off)
        self.op("MSTORE")

    def staticcall_checked(self, addr: int, in_off: int, in_len: int,
                           out_off: int, out_len: int, fail: str):
        """staticcall(gas, addr, ...); JUMPI to `fail` unless success."""
        self.push(out_len)
        self.push(out_off)
        self.push(in_len)
        self.push(in_off)
        self.push(addr)
        self.op("GAS")
        self.op("STATICCALL")
        self.op("ISZERO")
        self.push_label(fail)
        self.op("JUMPI")

    def assemble(self) -> bytes:
        for pos, name in self._fixups:
            tgt = self._labels[name]
            assert tgt < (1 << 16)
            self.code[pos : pos + 2] = tgt.to_bytes(2, "big")
        return bytes(self.code)


_OPS = {
    "STOP": 0x00, "ADD": 0x01, "MUL": 0x02, "SUB": 0x03, "MOD": 0x06,
    "EQ": 0x14, "ISZERO": 0x15, "SHR": 0x1C, "CALLDATALOAD": 0x35,
    "CALLDATASIZE": 0x36, "CALLDATACOPY": 0x37, "MLOAD": 0x51,
    "MSTORE": 0x52, "JUMP": 0x56, "JUMPI": 0x57, "GAS": 0x5A,
    "JUMPDEST": 0x5B, "PUSH0": 0x5F, "DUP1": 0x80, "DUP2": 0x81,
    "SWAP1": 0x90, "STATICCALL": 0xFA, "RETURN": 0xF3, "REVERT": 0xFD,
}


def verifier_signature(n_inputs: int) -> str:
    return f"verifyProof(uint256[2],uint256[4],uint256[2],uint256[{n_inputs}])"


def generate_verifier_bytecode(vk: Dict) -> bytes:
    """Runtime bytecode for the vk exported by `solidity.export_vk_and_proof`
    (same dict the Solidity generator consumes)."""
    ic = vk["ic"]
    n = len(ic) - 1
    sig = verifier_signature(n)
    sel = int.from_bytes(selector(sig), "big")

    def arg(i: int) -> int:  # calldata offset of flattened word i
        return 4 + 32 * i

    a = Asm()
    # selector dispatch
    a.push(0)
    a.op("CALLDATALOAD")
    a.push(224)
    a.op("SHR")
    a.push(sel)
    a.op("EQ")
    a.op("ISZERO")
    a.push_label("fail")
    a.op("JUMPI")

    # vk_x = IC0
    a.mstore(_VKX, ic[0][0])
    a.mstore(_VKX + 0x20, ic[0][1])
    for i in range(n):
        # ecMul(IC[i+1], input[i]) -> writes directly after vk_x
        a.mstore(_MUL, ic[i + 1][0])
        a.mstore(_MUL + 0x20, ic[i + 1][1])
        a.calldataload_to(_MUL + 0x40, arg(8 + i))
        a.staticcall_checked(0x07, _MUL, 0x60, _MUL, 0x40, "fail")
        # ecAdd(vk_x, mul_result): contiguous at _VKX..+0x80
        a.staticcall_checked(0x06, _VKX, 0x80, _VKX, 0x40, "fail")

    # pairing input ------------------------------------------------------
    # pair 0: -A, B
    a.calldataload_to(_PAIR, arg(0))          # A.x verbatim
    a.push(Q)                                  # [q]
    a.push(Q)                                  # [q, q]
    a.push(arg(1))
    a.op("CALLDATALOAD")                       # [q, q, a.y]
    a.op("MOD")                                # [q, a.y % q]
    a.op("SWAP1")                              # [m, q]
    a.op("SUB")                                # [q - m]
    a.push(Q)
    a.op("SWAP1")
    a.op("MOD")                                # [(q - m) % q]
    a.push(_PAIR + 0x20)
    a.op("MSTORE")
    # B: 4 words straight from calldata (already EVM G2 order)
    a.push(0x80)
    a.push(arg(2))
    a.push(_PAIR + 0x40)
    a.op("CALLDATACOPY")
    # pair 1: alpha, beta
    a.mstore(_PAIR + 0xC0, vk["alpha1"][0])
    a.mstore(_PAIR + 0xE0, vk["alpha1"][1])
    b2 = _g2_evm(vk["beta2"])
    for k in range(4):
        a.mstore(_PAIR + 0x100 + 0x20 * k, b2[k])
    # pair 2: vk_x, gamma
    a.push(_VKX)
    a.op("MLOAD")
    a.push(_PAIR + 0x180)
    a.op("MSTORE")
    a.push(_VKX + 0x20)
    a.op("MLOAD")
    a.push(_PAIR + 0x1A0)
    a.op("MSTORE")
    g2 = _g2_evm(vk["gamma2"])
    for k in range(4):
        a.mstore(_PAIR + 0x1C0 + 0x20 * k, g2[k])
    # pair 3: C, delta
    a.push(0x40)
    a.push(arg(6))
    a.push(_PAIR + 0x240)
    a.op("CALLDATACOPY")
    d2 = _g2_evm(vk["delta2"])
    for k in range(4):
        a.mstore(_PAIR + 0x280 + 0x20 * k, d2[k])

    a.staticcall_checked(0x08, _PAIR, 0x300, _OUT, 0x20, "fail")
    a.push(0x20)
    a.push(_OUT)
    a.op("RETURN")

    a.label("fail")
    a.op("PUSH0")
    a.op("PUSH0")
    a.op("REVERT")
    return a.assemble()


def _g2_evm(v: List[int]) -> List[int]:
    return [v[1], v[0], v[3], v[2]]


def verify_on_evm(vk: Dict, proof: Dict, public: List[int]) -> bool:
    """Execute the generated verifier against one proof in the in-process
    EVM (the EVMVerifier.verify path).  Returns the contract's verdict."""
    from mp2_tpu.evm.interpreter import encode_call, execute

    code = generate_verifier_bytecode(vk)
    p = proof
    words = list(p["a"]) + _g2_evm(p["b"]) + list(p["c"]) + [
        int(x) for x in public
    ]
    res = execute(code, encode_call(verifier_signature(len(public)), words))
    return res.success and res.word() == 1
