"""Solidity verifier generation for the Groth16 wrap (the reference's
groth16-framework/src/utils.rs + verifier/ role: emit a standalone
contract embedding the verifying key, plus calldata for one proof).

The emitted contract is the canonical Groth16 pairing-check verifier over
the EVM precompiles (ecAdd 0x06, ecMul 0x07, pairing 0x08):

    e(-A, B) * e(alpha, beta) * e(vk_x, gamma) * e(C, delta) == 1

Any two non-degenerate bilinear pairings on the same (G1, G2) differ by a
fixed GT exponent, so the equation proved by the native Tate-pairing
backend holds under the EVM's optimal-ate precompile too — the generated
verifier is sound on-chain even though the prover never computes an ate
pairing.  (No EVM is available in this environment to execute it; the
reference runs revm, tracked in STATUS.md.)
"""

from __future__ import annotations

import ctypes
import json
import os
from typing import Dict, List, Tuple


def _limbs_to_int(limbs) -> int:
    return sum(int(l) << (64 * i) for i, l in enumerate(limbs))


def export_vk_and_proof(r1cs, seed: int = 42) -> Tuple[Dict, Dict]:
    """Run setup+prove+verify in the native backend and export the
    verifying key + proof in canonical affine coordinates."""
    from mp2_tpu.groth16 import Groth16Unavailable, _load

    lib = _load()
    if lib is None:
        raise Groth16Unavailable()
    lib.bn254_groth16_r1cs_export.restype = ctypes.c_int
    (ap, aw, ac), (bp, bw, bc), (cp, cw, cc), wit = r1cs.to_arrays()
    n_ic = r1cs.num_public + 1
    out_vk = (ctypes.c_uint64 * (4 * (2 + 4 * 3) + 8 * n_ic))()
    out_proof = (ctypes.c_uint64 * (4 * 8))()
    LL = ctypes.POINTER(ctypes.c_longlong)
    II = ctypes.POINTER(ctypes.c_int)
    UU = ctypes.POINTER(ctypes.c_uint64)

    def ptr(a, t):
        return a.ctypes.data_as(t)

    rc = lib.bn254_groth16_r1cs_export(
        ctypes.c_longlong(len(r1cs.rows)),
        ctypes.c_longlong(len(r1cs.witness)),
        ctypes.c_longlong(r1cs.num_public),
        ptr(ap, LL), ptr(aw, II), ptr(ac, UU),
        ptr(bp, LL), ptr(bw, II), ptr(bc, UU),
        ptr(cp, LL), ptr(cw, II), ptr(cc, UU),
        ptr(wit, UU), ctypes.c_uint64(seed), out_vk, out_proof,
    )
    if rc != 0:
        raise RuntimeError(f"groth16 export failed: rc={rc}")

    vals = [_limbs_to_int(out_vk[4 * i : 4 * i + 4])
            for i in range(len(out_vk) // 4)]
    vk = {
        "alpha1": vals[0:2],
        "beta2": vals[2:6],    # x.c0, x.c1, y.c0, y.c1
        "gamma2": vals[6:10],
        "delta2": vals[10:14],
        "ic": [vals[14 + 2 * i : 16 + 2 * i] for i in range(n_ic)],
    }
    pvals = [_limbs_to_int(out_proof[4 * i : 4 * i + 4]) for i in range(8)]
    proof = {"a": pvals[0:2], "b": pvals[2:6], "c": pvals[6:8]}
    public = [int(v) for v in r1cs.witness[1:n_ic]]
    return vk, {"proof": proof, "public": public}


def _g2_evm(v: List[int]) -> List[int]:
    """(x.c0, x.c1, y.c0, y.c1) -> EVM precompile order (x1, x0, y1, y0)."""
    return [v[1], v[0], v[3], v[2]]


def generate_verifier_solidity(vk: Dict, name: str = "Mp2Verifier") -> str:
    ic_lines = "\n".join(
        f"        vk_x = Pairing.addition(vk_x, Pairing.scalar_mul("
        f"Pairing.G1Point({p[0]}, {p[1]}), input[{i}]));"
        for i, p in enumerate(vk["ic"][1:])
    )
    b2 = _g2_evm(vk["beta2"])
    g2 = _g2_evm(vk["gamma2"])
    d2 = _g2_evm(vk["delta2"])
    return f"""// SPDX-License-Identifier: MIT
// Auto-generated Groth16 verifier (mp2-tpu groth16/solidity.py).
pragma solidity ^0.8.0;

library Pairing {{
    struct G1Point {{ uint256 X; uint256 Y; }}
    struct G2Point {{ uint256[2] X; uint256[2] Y; }}

    function negate(G1Point memory p) internal pure returns (G1Point memory) {{
        uint256 q = 21888242871839275222246405745257275088696311157297823662689037894645226208583;
        if (p.X == 0 && p.Y == 0) return G1Point(0, 0);
        return G1Point(p.X, q - (p.Y % q));
    }}

    function addition(G1Point memory p1, G1Point memory p2)
        internal view returns (G1Point memory r)
    {{
        uint256[4] memory input = [p1.X, p1.Y, p2.X, p2.Y];
        bool ok;
        assembly {{ ok := staticcall(sub(gas(), 2000), 6, input, 0x80, r, 0x40) }}
        require(ok, "ec-add failed");
    }}

    function scalar_mul(G1Point memory p, uint256 s)
        internal view returns (G1Point memory r)
    {{
        uint256[3] memory input = [p.X, p.Y, s];
        bool ok;
        assembly {{ ok := staticcall(sub(gas(), 2000), 7, input, 0x60, r, 0x40) }}
        require(ok, "ec-mul failed");
    }}

    function pairing4(
        G1Point memory a1, G2Point memory a2,
        G1Point memory b1, G2Point memory b2,
        G1Point memory c1, G2Point memory c2,
        G1Point memory d1, G2Point memory d2
    ) internal view returns (bool) {{
        uint256[24] memory input = [
            a1.X, a1.Y, a2.X[0], a2.X[1], a2.Y[0], a2.Y[1],
            b1.X, b1.Y, b2.X[0], b2.X[1], b2.Y[0], b2.Y[1],
            c1.X, c1.Y, c2.X[0], c2.X[1], c2.Y[0], c2.Y[1],
            d1.X, d1.Y, d2.X[0], d2.X[1], d2.Y[0], d2.Y[1]
        ];
        uint256[1] memory out;
        bool ok;
        assembly {{ ok := staticcall(sub(gas(), 2000), 8, input, 0x300, out, 0x20) }}
        require(ok, "pairing failed");
        return out[0] == 1;
    }}
}}

contract {name} {{
    using Pairing for *;

    function verifyProof(
        uint256[2] memory a,
        uint256[4] memory b,
        uint256[2] memory c,
        uint256[{len(vk['ic']) - 1}] memory input
    ) public view returns (bool) {{
        Pairing.G1Point memory vk_x =
            Pairing.G1Point({vk['ic'][0][0]}, {vk['ic'][0][1]});
{ic_lines}
        return Pairing.pairing4(
            Pairing.negate(Pairing.G1Point(a[0], a[1])),
            Pairing.G2Point([b[0], b[1]], [b[2], b[3]]),
            Pairing.G1Point({vk['alpha1'][0]}, {vk['alpha1'][1]}),
            Pairing.G2Point([{b2[0]}, {b2[1]}], [{b2[2]}, {b2[3]}]),
            vk_x,
            Pairing.G2Point([{g2[0]}, {g2[1]}], [{g2[2]}, {g2[3]}]),
            Pairing.G1Point(c[0], c[1]),
            Pairing.G2Point([{d2[0]}, {d2[1]}], [{d2[2]}, {d2[3]}])
        );
    }}
}}
"""


def compile_and_generate_assets(public_inputs: List[int], asset_dir: str,
                                seed: int = 42) -> Dict[str, str]:
    """Build the PI-binding circuit, export vk + one proof, and write
    verifier.sol / vk.json / proof.json under `asset_dir`
    (groth16-framework utils.rs asset layout role)."""
    from mp2_tpu.groth16.r1cs import build_pi_binding_circuit

    r1cs, want = build_pi_binding_circuit([int(x) for x in public_inputs])
    vk, proof = export_vk_and_proof(r1cs, seed)
    os.makedirs(asset_dir, exist_ok=True)
    paths = {}
    sol = generate_verifier_solidity(vk)
    paths["verifier.sol"] = os.path.join(asset_dir, "verifier.sol")
    with open(paths["verifier.sol"], "w") as f:
        f.write(sol)
    paths["vk.json"] = os.path.join(asset_dir, "vk.json")
    with open(paths["vk.json"], "w") as f:
        json.dump(vk, f)
    paths["proof.json"] = os.path.join(asset_dir, "proof.json")
    with open(paths["proof.json"], "w") as f:
        json.dump({**proof, "pi_hash": want}, f)
    return paths
