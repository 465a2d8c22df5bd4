"""FRI low-degree proof system (batched polynomial commitment opening core).

plonky2-shaped protocol (the engine behind every proof in the reference's
stack, cf. SURVEY.md §3.5): evaluation vectors live on the coset g*H in
BIT-REVERSED order so arity-2 fold partners are adjacent; commit rounds
Merkle-cap each folded codeword; a grinding proof-of-work precedes query
sampling; each query opens the initial oracles (the plonk layer's wire/
constant/quotient commitments) plus one pair per fold round.

Prover: device (JAX) folding + Merkle builds, host extraction of query
openings.  Verifier: host-exact python ints (`verify`), the golden model the
future in-circuit verifier gadget must match.

Transcript order (per prove/verify, must stay in lockstep):
  [caller: observed oracles, sampled alphas, observed openings]
  for each fold round: observe cap -> sample beta (extension)
  observe final poly coefficients (extension)
  grind pow_bits -> observe pow witness
  sample num_queries indices (low bits of base-field challenges)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from mp2_tpu.field import ext2
from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.ext2 import GF2
from mp2_tpu.field.goldilocks import GF, P
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.hash.challenger import Challenger, HostChallenger
from mp2_tpu.prover import ntt
from mp2_tpu.prover.merkle import MerkleTree, verify_merkle_proof


@dataclass(frozen=True)
class FriConfig:
    rate_bits: int = 3
    cap_height: int = 4
    proof_of_work_bits: int = 16
    num_query_rounds: int = 28

    def salt_size(self) -> int:
        return 0  # zero-knowledge off, like the reference's configs


@dataclass
class FriQueryStep:
    """One fold round of one query: the sibling pair and its Merkle path."""

    pair: Tuple[Tuple[int, int], Tuple[int, int]]  # two extension values
    siblings: np.ndarray  # (depth, 4) uint64


@dataclass
class FriQueryRound:
    initial_leaves: List[np.ndarray]  # per oracle: opened row
    initial_siblings: List[np.ndarray]  # per oracle: (depth, 4)
    steps: List[FriQueryStep]


@dataclass
class FriProof:
    commit_caps: List[np.ndarray]  # per fold round: (2^cap, 4) uint64
    final_poly: List[Tuple[int, int]]  # extension coefficients
    pow_witness: int
    query_rounds: List[FriQueryRound]


# ---------------------------------------------------------------------------
# domain helpers
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _bitrev(log_n: int) -> np.ndarray:
    return ntt._bitrev_indices(log_n)


@lru_cache(maxsize=None)
def _fold_inv_2x(log_n: int, shift: int) -> np.ndarray:
    """inv(2*x_i) for rev-order pair index i in a domain of size 2^log_n
    with coset shift; x_i = shift * w^bitrev(2i)."""
    n = 1 << log_n
    w = ntt._root_of_unity(log_n)
    rev = _bitrev(log_n)
    out = np.empty(n // 2, dtype=np.uint64)
    for i in range(n // 2):
        x = shift * pow(w, int(rev[2 * i]), P) % P
        out[i] = pow(2 * x % P, P - 2, P)
    return out


def bit_reverse(x: GF) -> GF:
    n = x.shape[-1]
    return gl.take(x, _bitrev(n.bit_length() - 1), axis=-1)


def bit_reverse_ext(x: GF2) -> GF2:
    return GF2(bit_reverse(x.c0), bit_reverse(x.c1))


def _ext_leaves(v: GF2) -> GF:
    """Pack rev-order extension vector (N,) into arity-2 leaves (N/2, 4)."""
    n = v.shape[-1]
    cols = gl.stack(
        [v.c0[0::2], v.c1[0::2], v.c0[1::2], v.c1[1::2]], axis=-1
    )
    return cols.reshape((n // 2, 4))


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


import jax


@jax.jit
def fold_codeword(v: GF2, beta: GF2, inv_2x: GF) -> GF2:
    """Arity-2 fold in rev order:
    next_i = (e + o)/2 + beta * (e - o) * inv(2 x_i)."""
    e = v[..., 0::2]
    o = v[..., 1::2]
    half_sum = ext2.scalar_mul(ext2.add(e, o), gl.full(e.shape, (P + 1) // 2))
    diff = ext2.scalar_mul(ext2.sub(e, o), inv_2x)
    return ext2.add(half_sum, ext2.mul(ext2.GF2(beta.c0, beta.c1), diff))


def prove(
    challenger: Challenger,
    evals_rev: GF2,
    initial_trees: Sequence[MerkleTree],
    config: FriConfig,
    final_poly_bits: int,
    lde_shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
) -> FriProof:
    """evals_rev: the combined polynomial's LDE values, bit-reversed order."""
    n = evals_rev.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    num_folds = log_n - config.rate_bits - final_poly_bits
    assert num_folds >= 0

    # --- commit phase ---
    cur = evals_rev
    cur_shift = lde_shift
    cur_log = log_n
    trees: List[MerkleTree] = []
    betas: List[GF2] = []
    for _ in range(num_folds):
        t = MerkleTree(_ext_leaves(cur), cap_height=min(config.cap_height, cur_log - 1))
        trees.append(t)
        challenger.observe(t.cap.reshape((-1,)))
        beta = challenger.get_extension_challenge()
        betas.append(beta)
        inv2x = gl.from_u64(_fold_inv_2x(cur_log, cur_shift))
        cur = fold_codeword(cur, beta, inv2x)
        cur_shift = cur_shift * cur_shift % P
        cur_log -= 1

    # --- final polynomial ---
    # un-bit-reverse, coset-iNTT back to coefficients
    nat = bit_reverse_ext(cur)
    coeffs_ext = GF2(
        ntt.coset_intt(nat.c0, cur_shift), ntt.coset_intt(nat.c1, cur_shift)
    )
    final_len = 1 << final_poly_bits
    c0 = gl.to_u64(coeffs_ext.c0)
    c1 = gl.to_u64(coeffs_ext.c1)
    assert int(np.max(c0[final_len:], initial=0)) == 0 and (
        int(np.max(c1[final_len:], initial=0)) == 0
    ), "combined polynomial exceeds claimed degree"
    final_poly = [(int(a), int(b)) for a, b in zip(c0[:final_len], c1[:final_len])]
    for a, b in final_poly:
        challenger.observe(gl.from_u64(a))
        challenger.observe(gl.from_u64(b))

    # --- proof of work ---
    pow_witness = _grind(challenger, config.proof_of_work_bits)
    challenger.observe(gl.from_u64(pow_witness))
    challenger.get_challenge()  # pow response: keep transcript in lockstep

    # --- queries ---
    query_rounds: List[FriQueryRound] = []
    indices = []
    for _ in range(config.num_query_rounds):
        c = int(gl.to_u64(challenger.get_challenge()))
        indices.append(c % n)
    for idx in indices:
        initial_leaves, initial_sibs = [], []
        for t in initial_trees:
            leaf, sibs = t.open(idx)
            initial_leaves.append(leaf)
            initial_sibs.append(sibs)
        steps: List[FriQueryStep] = []
        i = idx
        for r, t in enumerate(trees):
            pair_idx = i // 2
            leaf, sibs = t.open(pair_idx)
            steps.append(
                FriQueryStep(
                    pair=(
                        (int(leaf[0]), int(leaf[1])),
                        (int(leaf[2]), int(leaf[3])),
                    ),
                    siblings=sibs,
                )
            )
            i = pair_idx
        query_rounds.append(
            FriQueryRound(
                initial_leaves=initial_leaves,
                initial_siblings=initial_sibs,
                steps=steps,
            )
        )

    return FriProof(
        commit_caps=[gl.to_u64(t.cap) for t in trees],
        final_poly=final_poly,
        pow_witness=pow_witness,
        query_rounds=query_rounds,
    )


def _grind(challenger: Challenger, pow_bits: int) -> int:
    """Find nonce s.t. the derived challenge has >= pow_bits leading zeros.

    Vectorized on device: clone the challenger state over a nonce batch,
    duplex once per batch, test all lanes at once.
    """
    if pow_bits == 0:
        return 0
    batch = 4096
    base = 0
    while True:
        nonces = np.arange(base, base + batch, dtype=np.uint64)
        import jax.numpy as jnp

        clone = Challenger(batch=(batch,))
        clone._state = [
            GF(jnp.broadcast_to(s.v, (batch,))) for s in challenger._state
        ]
        clone._input_buffer = [
            GF(jnp.broadcast_to(b.v, (batch,))) for b in challenger._input_buffer
        ]
        clone.observe(gl.from_u64(nonces))
        ch = gl.to_u64(clone.get_challenge())
        ok = np.nonzero((ch >> np.uint64(64 - pow_bits)) == 0)[0]
        if ok.size:
            return int(base + int(ok[0]))
        base += batch


# ---------------------------------------------------------------------------
# host verifier (golden model)
# ---------------------------------------------------------------------------

ExpectedEvalFn = Callable[[int, List[np.ndarray]], Tuple[int, int]]


def verify(
    challenger: HostChallenger,
    proof: FriProof,
    initial_caps: Sequence[Sequence[Tuple[int, int, int, int]]],
    config: FriConfig,
    final_poly_bits: int,
    log_n: int,
    expected_eval: ExpectedEvalFn,
    lde_shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
) -> bool:
    n = 1 << log_n
    num_folds = log_n - config.rate_bits - final_poly_bits
    # --- proof-shape validation (mirrors plonky2's validate_proof_shape):
    # without these, a prover could send zero fold steps plus an oversized
    # final_poly interpolating the claimed values, voiding the LDT.
    if len(proof.commit_caps) != num_folds:
        return False
    if len(proof.final_poly) != (1 << final_poly_bits):
        return False
    for r, cap in enumerate(proof.commit_caps):
        ch = min(config.cap_height, log_n - r - 1)
        if len(cap) != (1 << ch):
            return False
    for qr in proof.query_rounds:
        if len(qr.steps) != num_folds:
            return False

    betas: List[Tuple[int, int]] = []
    for cap in proof.commit_caps:
        for row in cap:
            challenger.observe([int(x) for x in row])
        betas.append(challenger.get_extension_challenge())
    for a, b in proof.final_poly:
        challenger.observe(a)
        challenger.observe(b)

    challenger.observe(proof.pow_witness)
    pow_response = challenger.get_challenge()
    if config.proof_of_work_bits and (
        pow_response >> (64 - config.proof_of_work_bits)
    ):
        return False

    indices = [
        challenger.get_challenge() % n for _ in range(config.num_query_rounds)
    ]
    if len(proof.query_rounds) != len(indices):
        return False

    w_tables = {}
    for qr, idx in zip(proof.query_rounds, indices):
        # 1. initial oracle openings
        if len(qr.initial_leaves) != len(initial_caps):
            return False
        for leaf, sibs, cap in zip(qr.initial_leaves, qr.initial_siblings, initial_caps):
            depth = log_n - (len(cap).bit_length() - 1)
            if not verify_merkle_proof(leaf, idx, sibs, cap, depth=depth):
                return False
        # 2. derived evaluation at idx
        ev = expected_eval(idx, qr.initial_leaves)
        # 3. fold rounds
        i = idx
        cur_log = log_n
        cur_shift = lde_shift
        for r, step in enumerate(qr.steps):
            pair_idx = i // 2
            leaf = [
                step.pair[0][0],
                step.pair[0][1],
                step.pair[1][0],
                step.pair[1][1],
            ]
            step_depth = (cur_log - 1) - min(config.cap_height, cur_log - 1)
            if not verify_merkle_proof(
                leaf, pair_idx, step.siblings, proof.commit_caps[r],
                depth=step_depth,
            ):
                return False
            # consistency: our derived value must equal the opened slot
            mine = step.pair[i & 1]
            if (ev[0] % P, ev[1] % P) != (mine[0] % P, mine[1] % P):
                return False
            # fold
            e, o = step.pair
            if cur_log not in w_tables:
                w_tables[cur_log] = ntt._root_of_unity(cur_log)
            w = w_tables[cur_log]
            rev = _bitrev(cur_log)
            x = cur_shift * pow(w, int(rev[2 * pair_idx]), P) % P
            inv2x = pow(2 * x % P, P - 2, P)
            half = (P + 1) // 2
            s = ext2.host_mul(
                ((e[0] + o[0]) % P, (e[1] + o[1]) % P), (half, 0)
            )
            d = ext2.host_mul(
                ((e[0] - o[0]) % P, (e[1] - o[1]) % P), (inv2x, 0)
            )
            ev = tuple(
                (a + b) % P
                for a, b in zip(s, ext2.host_mul(betas[r], d))
            )
            i = pair_idx
            cur_log -= 1
            cur_shift = cur_shift * cur_shift % P
        # 4. final polynomial evaluation at the residual domain point
        rev = _bitrev(cur_log)
        w = ntt._root_of_unity(cur_log)
        x = cur_shift * pow(w, int(rev[i]), P) % P
        acc = (0, 0)
        for c in reversed(proof.final_poly):
            acc = ext2.host_mul(acc, (x, 0))
            acc = ((acc[0] + c[0]) % P, (acc[1] + c[1]) % P)
        if (ev[0] % P, ev[1] % P) != acc:
            return False
    return True
