"""Batched prover: B independent witnesses of ONE circuit per dispatch.

The map phase of the proof map-reduce (SURVEY.md §2.9, §7.3): leaf proofs
are embarrassingly parallel, so all device stages run with a leading batch
axis — one iNTT/LDE/Merkle/quotient/FRI dispatch sequence serves B proofs.
On TPU this amortizes the per-dispatch tunnel latency that dominates
single-proof latency (the round-1 bottleneck: 0.6 proofs/s serial).

Transcript safety: each batch element runs its OWN duplex challenger lane
(`Challenger(batch=(B,))`), so the B transcripts are exactly the transcripts
the serial prover would produce — proofs remain individually verifiable by
`prover.verify.verify` and by the recursive verifier gadget.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mp2_tpu.field import ext2
from mp2_tpu.field import goldilocks as gl
from mp2_tpu.field.ext2 import GF2
from mp2_tpu.field.goldilocks import GF, P
from mp2_tpu.hash import poseidon2 as p2
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.hash.challenger import Challenger
from mp2_tpu.prover import fri as fri_mod
from mp2_tpu.prover import ntt
from mp2_tpu.prover.algebra import DeviceAlgebra
from mp2_tpu.prover.fri import FriProof, FriQueryRound, FriQueryStep
from mp2_tpu.prover.merkle import MerkleTree
from mp2_tpu.prover.prove import (
    SHIFT,
    CircuitData,
    Openings,
    Proof,
    _lde_tables,
    _powers_device,
    _SHAPE_JITS,
    _shape_key,
)


class BatchedMerkleTree:
    """Merkle-cap trees over a batch: leaves (B, m, w) -> cap (B, 2^ch, 4)."""

    def __init__(self, leaves: GF, cap_height: int = 0):
        B, m = leaves.shape[0], leaves.shape[1]
        assert m & (m - 1) == 0
        self.cap_height = cap_height
        self.leaves = leaves
        digests = p2.hash_or_noop(leaves)  # (B, m, 4)
        self.digest_levels: List[GF] = [digests]
        while digests.shape[1] > (1 << cap_height):
            digests = p2.two_to_one(digests[:, 0::2], digests[:, 1::2])
            self.digest_levels.append(digests)

    @property
    def cap(self) -> GF:
        return self.digest_levels[-1]

    def to_host(self):
        """Pull leaves + levels once for host query extraction."""
        return (
            gl.to_u64(self.leaves),
            [gl.to_u64(l) for l in self.digest_levels[:-1]],
        )


def _grind_batch(challenger: Challenger, pow_bits: int, B: int) -> np.ndarray:
    """Per-element grinding: find nonce[b] whose derived challenge has
    pow_bits leading zeros, all elements searched in parallel."""
    if pow_bits == 0:
        return np.zeros(B, dtype=np.uint64)
    span = 2048
    found = np.zeros(B, dtype=bool)
    out = np.zeros(B, dtype=np.uint64)
    base = 0
    while not found.all():
        nonces = np.arange(base, base + span, dtype=np.uint64)
        clone = Challenger(batch=(B, span))
        clone._state = [
            GF(jnp.broadcast_to(s.v[:, None], (B, span))) for s in challenger._state
        ]
        clone._input_buffer = [
            GF(jnp.broadcast_to(b.v[:, None], (B, span)))
            for b in challenger._input_buffer
        ]
        clone.observe(GF(jnp.broadcast_to(jnp.asarray(nonces), (B, span))))
        ch = gl.to_u64(clone.get_challenge())  # (B, span)
        ok = (ch >> np.uint64(64 - pow_bits)) == 0
        for b in range(B):
            if not found[b]:
                hits = np.nonzero(ok[b])[0]
                if hits.size:
                    out[b] = base + hits[0]
                    found[b] = True
        base += span
    return out


def _make_zs_fn_batched(data: CircuitData):
    cfg = data.config
    n, W = data.n, cfg.num_wires
    chunk = cfg.permutation_chunk_size
    n_chunks = -(-W // chunk)
    nc = cfg.num_challenges
    npp = cfg.num_partial_products
    g = ntt._root_of_unity(data.log_n)
    x_pows = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        x_pows[i] = cur
        cur = cur * g % P
    ks = np.array(data.k_coeffs, dtype=np.uint64)
    kx_t = np.array(
        [[int(k) * int(x) % P for k in ks] for x in x_pows], dtype=np.uint64
    )
    sigma_t = data.sigma_values

    def fn(wit: GF, betas: GF, gammas: GF) -> GF:
        # wit (B, n, W); betas/gammas (nc, B)
        B = wit.shape[0]
        kx = gl.from_u64(kx_t)  # (n, W)
        sg = gl.from_u64(sigma_t)
        cols = []
        for c in range(nc):
            beta = GF(betas.v[c][:, None, None])  # (B,1,1)
            gamma = GF(gammas.v[c][:, None, None])
            num = gl.add(gl.add(wit, gl.mul(GF(kx.v[None]), beta)), gamma)
            den = gl.add(gl.add(wit, gl.mul(GF(sg.v[None]), beta)), gamma)

            def chunk_prod(m):
                v = m.reshape(B, n, n_chunks, chunk)
                while v.shape[-1] > 1:
                    h = v.shape[-1] // 2
                    v = gl.mul(v[..., :h], v[..., h : 2 * h])
                return v.reshape(B, n, n_chunks)

            nums = chunk_prod(num)
            dens = chunk_prod(den)
            ratios = gl.mul(nums, gl.inv(dens))  # (B, n, n_chunks)
            row_pref = ratios
            shift = 1
            while shift < n_chunks:
                shifted = gl.roll(row_pref, shift, axis=-1)
                mask = jnp.arange(n_chunks) >= shift
                row_pref = gl.mul(
                    row_pref, gl.select(mask, shifted, gl.ones(row_pref.shape))
                )
                shift *= 2
            row_full = row_pref[..., n_chunks - 1]  # (B, n)
            # inclusive prefix product along rows
            incl = row_full
            shift = 1
            while shift < n:
                shifted = gl.roll(incl, shift, axis=-1)
                mask = jnp.arange(n) >= shift
                incl = gl.mul(incl, gl.select(mask, shifted, gl.ones(incl.shape)))
                shift *= 2
            z = gl.concat([gl.ones((B, 1)), incl[:, : n - 1]], axis=-1)  # (B, n)
            pps = gl.mul(row_pref[:, :, :npp], GF(z.v[:, :, None]))
            cols.append(z.reshape(B, 1, n))
            cols.append(GF(jnp.swapaxes(pps.v, 1, 2)))  # (B, npp, n)
        return gl.concat(cols, axis=1)  # (B, zcols, n)

    return jax.jit(fn)


def _make_quotient_fn_batched(data: CircuitData):
    cfg = data.config
    n, log_n = data.n, data.log_n
    rate = cfg.fri.rate_bits
    big = n << rate
    W = cfg.num_wires
    T = data.num_gate_types
    nC = cfg.num_constants
    chunk = cfg.permutation_chunk_size
    n_chunks = -(-W // chunk)
    k_coeffs = list(data.k_coeffs)
    gate_types = list(data.gate_types)
    x_t, zh_inv_t, l0_t = _lde_tables(log_n, rate)

    def fn(fixed_lde, wire_lde, zs_lde, betas, gammas, alphas, pi_hash):
        # fixed_lde (F, big) shared; wire_lde (B, W, big); zs (B, zc, big);
        # betas/gammas/alphas (nc, B); pi_hash (B, 4)
        B = wire_lde.shape[0]
        x = gl.from_u64(x_t)
        zh_inv = gl.from_u64(zh_inv_t)
        l0 = gl.from_u64(l0_t)
        alg = DeviceAlgebra((B, big))
        sel = [GF(fixed_lde.v[t][None]) for t in range(T)]
        consts = [GF(fixed_lde.v[T + j][None]) for j in range(nC)]
        sigma_m = fixed_lde[T + nC : T + nC + W]  # (W, big)
        wires = [wire_lde[:, j] for j in range(W)]
        extras = {"pi_hash": [GF(pi_hash.v[:, i][:, None]) for i in range(4)]}

        gate_term_list = []
        for t, (name, gate) in enumerate(gate_types):
            for c in gate.constraints(alg, wires, consts, extras):
                gate_term_list.append(gl.mul(sel[t], c))
        groups = [gl.stack(gate_term_list, axis=0)]  # (Kg, B, big)

        k_vec = gl.from_u64(np.array(k_coeffs, dtype=np.uint64))
        for c in range(cfg.num_challenges):
            beta = GF(betas.v[c][:, None, None])  # (B,1,1)
            gamma = GF(gammas.v[c][:, None, None])
            base = c * (1 + cfg.num_partial_products)
            z = zs_lde[:, base]  # (B, big)
            partials = zs_lde[:, base + 1 : base + 1 + cfg.num_partial_products]
            z_next = gl.roll(z, -(1 << rate), axis=-1)
            groups.append(
                gl.mul(l0, gl.sub(z, gl.ones((B, big)))).reshape(1, B, big)
            )
            bk = gl.mul(GF(k_vec.v[None, :, None]), beta)  # (B, W, 1)
            num_all = gl.add(
                gl.add(wire_lde, gl.mul(bk, GF(x.v[None, None]))), gamma
            )
            den_all = gl.add(
                gl.add(wire_lde, gl.mul(GF(sigma_m.v[None]), beta)), gamma
            )

            def chunk_prod(m):
                v = m.reshape(B, n_chunks, chunk, big)
                while v.shape[2] > 1:
                    h = v.shape[2] // 2
                    v = gl.mul(v[:, :, :h], v[:, :, h : 2 * h])
                return v.reshape(B, n_chunks, big)

            nums = chunk_prod(num_all)
            dens = chunk_prod(den_all)
            pps = gl.concat(
                [z.reshape(B, 1, big), partials, z_next.reshape(B, 1, big)],
                axis=1,
            )
            diff = gl.sub(
                gl.mul(pps[:, 1:], dens), gl.mul(pps[:, :-1], nums)
            )  # (B, n_chunks, big)
            groups.append(GF(jnp.swapaxes(diff.v, 0, 1)))

        all_terms = gl.concat(groups, axis=0)  # (K, B, big)
        K = all_terms.shape[0]
        outs = []
        for c in range(cfg.num_challenges):
            apows = _powers_batched(GF(alphas.v[c]), K)  # (K, B)
            acc = gl.sum_axis(
                gl.mul(all_terms, GF(apows.v[:, :, None])), axis=0
            )  # (B, big)
            outs.append(gl.mul(acc, zh_inv))
        return gl.stack(outs, axis=1)  # (B, nc, big)

    return jax.jit(fn)


def _powers_batched(a: GF, count: int) -> GF:
    """(count, B) powers [1, a, a^2, ...] per batch element."""
    B = a.shape[0]
    pows = gl.ones((1, B))
    step = GF(a.v[None])
    while pows.shape[0] < count:
        pows = gl.concat([pows, gl.mul(pows, step)], axis=0)
        step = gl.mul(step, step)
    return pows[:count]


def _ext_powers_batched(z: GF2, count: int) -> GF2:
    """(count, B) extension powers."""
    B = z.c0.shape[0]
    pows = ext2.ones((1, B))
    step = GF2(GF(z.c0.v[None]), GF(z.c1.v[None]))
    while pows.c0.shape[0] < count:
        shifted = ext2.mul(pows, step)
        pows = GF2(
            gl.concat([pows.c0, shifted.c0], axis=0),
            gl.concat([pows.c1, shifted.c1], axis=0),
        )
        step = ext2.mul(step, step)
    return pows[:count]


def _eval_at_ext_batched(coeffs: GF, zpows: GF2) -> GF2:
    """coeffs (B, C, n) at per-element points via zpows (n, B) -> (B, C)."""
    zp0 = GF(jnp.swapaxes(zpows.c0.v, 0, 1)[:, None, :])  # (B,1,n)
    zp1 = GF(jnp.swapaxes(zpows.c1.v, 0, 1)[:, None, :])
    c0 = gl.sum_axis(gl.mul(coeffs, zp0), axis=-1)
    c1 = gl.sum_axis(gl.mul(coeffs, zp1), axis=-1)
    return GF2(c0, c1)


def _stage1_fn(data: CircuitData, witnesses_u64, pi_h):
    """The ENTIRE device part of the batched prover up to the grinding
    point, traceable as ONE jit: through the axon tunnel every eager
    dispatch costs a round trip, so the round-1 serial prover was latency-
    bound; a single compiled program amortizes it over the whole batch."""
    cfg = data.config
    n, log_n = data.n, data.log_n
    W = cfg.num_wires
    nc = cfg.num_challenges
    rate = cfg.fri.rate_bits
    big = n << rate
    cap_h = min(cfg.fri.cap_height, log_n)
    B = witnesses_u64.shape[0]

    ch = Challenger(batch=(B,))
    dig = np.broadcast_to(
        np.array(data.circuit_digest, dtype=np.uint64), (B, 4)
    )
    ch.observe(GF(jnp.asarray(np.ascontiguousarray(dig))))
    ch.observe(GF(pi_h))

    # --- wires ---
    wire_vals = GF(jnp.swapaxes(witnesses_u64, 1, 2))  # (B, W, n)
    wire_coeffs = ntt.intt(wire_vals)
    wire_lde = _lde_batched(wire_coeffs, rate)
    wires_tree = BatchedMerkleTree(_leaves_batched(wire_lde), cap_height=cap_h)
    ch.observe(wires_tree.cap.reshape(B, -1))

    betas = gl.stack(ch.get_n_challenges(nc), axis=0)  # (nc, B)
    gammas = gl.stack(ch.get_n_challenges(nc), axis=0)

    # --- permutation columns ---
    zs_fn = _make_zs_fn_batched(data)
    zs_vals = zs_fn(GF(witnesses_u64), betas, gammas)
    zs_coeffs = ntt.intt(zs_vals)
    zs_lde = _lde_batched(zs_coeffs, rate)
    zs_tree = BatchedMerkleTree(_leaves_batched(zs_lde), cap_height=cap_h)
    ch.observe(zs_tree.cap.reshape(B, -1))

    alphas = gl.stack(ch.get_n_challenges(nc), axis=0)

    # --- quotient ---
    quo_fn = _make_quotient_fn_batched(data)
    quo_vals = quo_fn(
        data.fixed_lde, wire_lde, zs_lde, betas, gammas, alphas, GF(pi_h)
    )  # (B, nc, big)
    quo_coeffs_full = ntt.coset_intt(quo_vals, SHIFT)
    qk = cfg.quotient_degree_factor
    quo_chunk_coeffs = GF(quo_coeffs_full.v.reshape(B, nc * qk, n))
    quo_lde = _lde_batched(quo_chunk_coeffs, rate)
    quo_tree = BatchedMerkleTree(_leaves_batched(quo_lde), cap_height=cap_h)
    ch.observe(quo_tree.cap.reshape(B, -1))

    zeta = ch.get_extension_challenge()  # GF2 of (B,)

    # --- openings ---
    g = ntt._root_of_unity(log_n)
    zpows = _ext_powers_batched(zeta, n)  # (n, B)
    gzeta = GF2(gl.mul_const(zeta.c0, g), gl.mul_const(zeta.c1, g))
    gzpows = _ext_powers_batched(gzeta, n)
    fixed_coeffs_b = GF(jnp.broadcast_to(
        data.fixed_coeffs.v[None], (B,) + data.fixed_coeffs.shape
    ))
    z_cols_idx = np.array([c * (1 + cfg.num_partial_products) for c in range(nc)])
    z_coeffs_only = gl.take(zs_coeffs, z_cols_idx, axis=1)
    fixed_open = _eval_at_ext_batched(fixed_coeffs_b, zpows)
    wires_open = _eval_at_ext_batched(wire_coeffs, zpows)
    zsp_open = _eval_at_ext_batched(zs_coeffs, zpows)
    quo_open = _eval_at_ext_batched(quo_chunk_coeffs, zpows)
    zs_next_open = _eval_at_ext_batched(z_coeffs_only, gzpows)

    all_opens = GF2(
        gl.concat(
            [fixed_open.c0, wires_open.c0, zsp_open.c0, quo_open.c0,
             zs_next_open.c0], axis=1,
        ),
        gl.concat(
            [fixed_open.c1, wires_open.c1, zsp_open.c1, quo_open.c1,
             zs_next_open.c1], axis=1,
        ),
    )  # (B, n_open)
    # observe openings in flat order, interleaving c0/c1 per opening
    n_open = all_opens.c0.shape[1]
    inter = GF(
        jnp.stack([all_opens.c0.v, all_opens.c1.v], axis=2).reshape(
            B, 2 * n_open
        )
    )
    ch.observe(inter)
    alpha_fri = ch.get_extension_challenge()

    return {
        "caps": {
            "wires": wires_tree.cap.v,
            "zs": zs_tree.cap.v,
            "quo": quo_tree.cap.v,
        },
        "opens": (all_opens.c0.v, all_opens.c1.v),
        "zeta": (zeta.c0.v, zeta.c1.v),
        "gzeta": (gzeta.c0.v, gzeta.c1.v),
        "alpha_fri": (alpha_fri.c0.v, alpha_fri.c1.v),
        "wire_lde": wire_lde.v,
        "zs_lde": zs_lde.v,
        "quo_lde": quo_lde.v,
        "state": jnp.stack([st.v for st in ch._state], axis=0),
        "buffer": (
            jnp.stack([x.v for x in ch._input_buffer], axis=0)
            if ch._input_buffer
            else jnp.zeros((0, B), dtype=jnp.uint64)
        ),
        "trees": {
            "wires": (wires_tree.leaves.v,
                      [l.v for l in wires_tree.digest_levels[:-1]]),
            "zs": (zs_tree.leaves.v, [l.v for l in zs_tree.digest_levels[:-1]]),
            "quo": (quo_tree.leaves.v,
                    [l.v for l in quo_tree.digest_levels[:-1]]),
        },
    }


def _stage1b_fn(data: CircuitData, s1, inv1, inv2):
    """FRI combine + commit phase, resumed from stage1's transcript state.
    The (x - zeta)^-1 chains arrive precomputed from their own jit: fusing
    the 64-bit inversion pow-chain into this module sends XLA-CPU
    optimization superlinear (see _combine_invs)."""
    cfg = data.config
    n, log_n = data.n, data.log_n
    rate = cfg.fri.rate_bits
    big = n << rate
    B = s1["wire_lde"].shape[0]
    wire_lde = GF(s1["wire_lde"])
    zs_lde = GF(s1["zs_lde"])
    quo_lde = GF(s1["quo_lde"])
    all_opens = GF2(GF(s1["opens"][0]), GF(s1["opens"][1]))
    alpha_fri = GF2(GF(s1["alpha_fri"][0]), GF(s1["alpha_fri"][1]))
    nc = cfg.num_challenges
    z_cols_idx = np.array([c * (1 + cfg.num_partial_products) for c in range(nc)])
    W = cfg.num_wires

    ch = Challenger(batch=(B,))
    ch._state = [GF(s1["state"][i]) for i in range(s1["state"].shape[0])]
    ch._input_buffer = [
        GF(s1["buffer"][i]) for i in range(s1["buffer"].shape[0])
    ]

    F = data.fixed_lde.shape[0]
    fixed_lde_b = GF(jnp.broadcast_to(
        data.fixed_lde.v[None], (B, F, big)
    ))
    all_lde = gl.concat([fixed_lde_b, wire_lde, zs_lde, quo_lde], axis=1)
    z_lde_only = gl.take(zs_lde, z_cols_idx, axis=1)
    n1 = F + W + zs_lde.shape[1] + quo_lde.shape[1]
    opens1 = GF2(all_opens.c0[:, :n1], all_opens.c1[:, :n1])
    opens2 = GF2(all_opens.c0[:, n1:], all_opens.c1[:, n1:])
    final_evals = _combine_core(
        all_lde, z_lde_only, opens1, opens2, alpha_fri, inv1, inv2
    )  # GF2 (B, big)
    final_rev = fri_mod.bit_reverse_ext(final_evals)

    # --- FRI commit phase (batched) ---
    fri_cfg = cfg.fri
    final_poly_bits = cfg.fri_final_poly_bits
    num_folds = log_n - final_poly_bits
    cur = final_rev
    cur_shift = SHIFT
    cur_log = log_n + rate
    fold_trees: List[BatchedMerkleTree] = []
    for _ in range(num_folds):
        leaves = _ext_leaves_batched(cur)
        t = BatchedMerkleTree(
            leaves, cap_height=min(fri_cfg.cap_height, cur_log - 1)
        )
        fold_trees.append(t)
        ch.observe(t.cap.reshape(B, -1))
        beta = ch.get_extension_challenge()
        inv2x = gl.from_u64(fri_mod._fold_inv_2x(cur_log, cur_shift))
        cur = _fold_batched(cur, beta, inv2x)
        cur_shift = cur_shift * cur_shift % P
        cur_log -= 1

    nat = fri_mod.bit_reverse_ext(cur)
    coeffs_ext = GF2(
        ntt.coset_intt(nat.c0, cur_shift), ntt.coset_intt(nat.c1, cur_shift)
    )
    final_len = 1 << final_poly_bits
    fc0_full, fc1_full = coeffs_ext.c0, coeffs_ext.c1
    inter_fp = GF(
        jnp.stack(
            [fc0_full.v[:, :final_len], fc1_full.v[:, :final_len]], axis=2
        ).reshape(B, 2 * final_len)
    )
    ch.observe(inter_fp)

    return {
        "fold_caps": [t.cap.v for t in fold_trees],
        "final_poly": (fc0_full.v, fc1_full.v),
        "state": jnp.stack([st.v for st in ch._state], axis=0),
        "buffer": (
            jnp.stack([x.v for x in ch._input_buffer], axis=0)
            if ch._input_buffer
            else jnp.zeros((0, B), dtype=jnp.uint64)
        ),
        "fold_trees": [
            (t.leaves.v, [l.v for l in t.digest_levels[:-1]])
            for t in fold_trees
        ],
    }


def _stage_queries_fn(data: CircuitData, state, buffer, pow_w, trees, fold_trees):
    """Post-grind device stage: replay the transcript tail to the query
    indices, then gather every opened leaf/sibling ON DEVICE (one dispatch
    instead of hundreds of host round trips through the tunnel)."""
    cfg = data.config
    B = state.shape[1]
    big = data.n << cfg.fri.rate_bits
    ch = Challenger(batch=(B,))
    ch._state = [GF(state[i]) for i in range(state.shape[0])]
    ch._input_buffer = [GF(buffer[i]) for i in range(buffer.shape[0])]
    ch.observe(GF(pow_w))
    ch.get_challenge()  # pow response, keep transcripts in lockstep
    qs = [ch.get_challenge() for _ in range(cfg.fri.num_query_rounds)]
    idx = jnp.stack([q.v for q in qs], axis=1) % np.uint64(big)  # (B, q)
    idx32 = idx.astype(jnp.int32)

    def gather_batched(leaves, levels, i0):
        lf = jnp.take_along_axis(leaves, i0[..., None], axis=1)  # (B, q, w)
        sibs = []
        i = i0
        for lvl in levels:
            sibs.append(jnp.take_along_axis(lvl, (i ^ 1)[..., None], axis=1))
            i = i >> 1
        sib = (
            jnp.stack(sibs, axis=2)
            if sibs
            else jnp.zeros(i0.shape + (0, 4), dtype=leaves.dtype)
        )
        return lf, sib

    fixed_lf = jnp.take(data.fixed_tree.leaves.v, idx32, axis=0)  # (B, q, F)
    fsibs = []
    i = idx32
    for lvl in data.fixed_tree.digest_levels[:-1]:
        fsibs.append(jnp.take(lvl.v, (i ^ 1), axis=0))
        i = i >> 1
    fixed_sib = (
        jnp.stack(fsibs, axis=2)
        if fsibs
        else jnp.zeros(idx32.shape + (0, 4), dtype=jnp.uint64)
    )

    out = {"idx": idx, "fixed": (fixed_lf, fixed_sib)}
    for name in ("wires", "zs", "quo"):
        leaves, levels = trees[name]
        out[name] = gather_batched(leaves, levels, idx32)
    folds = []
    i = idx32
    for leaves, levels in fold_trees:
        pair_idx = i >> 1
        folds.append(gather_batched(leaves, levels, pair_idx))
        i = pair_idx
    out["folds"] = folds
    return out


def _grind_span_fn(n_state: int, n_buffer: int, span: int):
    """ONE jitted dispatch per grinding span: the eager clone-challenger
    path cost ~41 ms/batch in tunnel round trips (r5 stage profile) —
    each gl op dispatched separately; this compiles the whole
    (B, span) duplex squeeze into a single program."""

    def fn(state, buffer, base):
        B = state.shape[1]
        clone = Challenger(batch=(B, span))
        clone._state = [
            GF(jnp.broadcast_to(state[i][:, None], (B, span)))
            for i in range(n_state)
        ]
        clone._input_buffer = [
            GF(jnp.broadcast_to(buffer[i][:, None], (B, span)))
            for i in range(n_buffer)
        ]
        nonces = base + jnp.arange(span, dtype=jnp.uint64)
        clone.observe(GF(jnp.broadcast_to(nonces[None, :], (B, span))))
        return clone.get_challenge().v  # (B, span) u64

    return jax.jit(fn)


_GRIND_JITS: Dict = {}


def _grind_from_state(state_v, buffer_v, pow_bits: int) -> np.ndarray:
    """Vectorized grinding from a raw challenger-state snapshot."""
    B = state_v.shape[1]
    if pow_bits == 0:
        return np.zeros(B, dtype=np.uint64)
    span = max(2048, 1 << (pow_bits + 3))
    key = (state_v.shape[0], buffer_v.shape[0], span)
    if key not in _GRIND_JITS:
        _GRIND_JITS[key] = _grind_span_fn(*key)
    fn = _GRIND_JITS[key]
    state_j = jnp.asarray(state_v)
    buffer_j = jnp.asarray(buffer_v)
    found = np.zeros(B, dtype=bool)
    out = np.zeros(B, dtype=np.uint64)
    base = 0
    while not found.all():
        chl = np.asarray(jax.device_get(
            fn(state_j, buffer_j, jnp.uint64(base))
        ))  # (B, span)
        ok = (chl >> np.uint64(64 - pow_bits)) == 0
        for b in range(B):
            if not found[b]:
                hits = np.nonzero(ok[b])[0]
                if hits.size:
                    out[b] = base + hits[0]
                    found[b] = True
        base += span
    return out


def prove_batch(
    data: CircuitData,
    witnesses: np.ndarray,  # (B, n, W) uint64
    public_inputs: Sequence[Sequence[int]],
) -> List[Proof]:
    """B proofs per dispatch sequence: ONE jitted device program to the
    grinding point, host grind, ONE jitted gather stage, ONE transfer."""
    cfg = data.config
    W = cfg.num_wires
    nc = cfg.num_challenges
    qk = cfg.quotient_degree_factor
    npp = cfg.num_partial_products
    final_len = 1 << cfg.fri_final_poly_bits
    B = witnesses.shape[0]
    assert len(public_inputs) == B

    lens = {len(p) for p in public_inputs}
    if len(lens) == 1:
        # one device dispatch for all B pi hashes (the pure-Python host
        # sponge cost ~53 ms/batch at B=32 — r5 stage profile)
        pi_arr = np.array([[int(x) % gl.P for x in p] for p in public_inputs],
                          dtype=np.uint64)
        pi_hashes = p2.hash_no_pad(GF(jnp.asarray(pi_arr))).v  # (B, 4) dev
    else:  # mixed layouts: host fallback
        pi_hashes = np.array(
            [p2h.hash_no_pad(list(pis)) for pis in public_inputs],
            dtype=np.uint64,
        )

    cache = getattr(data, "_batch_jits", None)
    if cache is None:
        cache = {}
        object.__setattr__(data, "_batch_jits", cache)
    if ("stage1", B) not in cache:
        cache[("stage1", B)] = jax.jit(lambda w, p: _stage1_fn(data, w, p))
        cache[("stage1b", B)] = jax.jit(
            lambda s, i1, i2: _stage1b_fn(data, s, i1, i2)
        )
        cache[("queries", B)] = jax.jit(
            lambda s, bu, pw, t, ft: _stage_queries_fn(data, s, bu, pw, t, ft)
        )
    s1 = cache[("stage1", B)](jnp.asarray(witnesses), jnp.asarray(pi_hashes))

    big = data.n << cfg.fri.rate_bits
    zeta = GF2(GF(s1["zeta"][0]), GF(s1["zeta"][1]))
    gzeta = GF2(GF(s1["gzeta"][0]), GF(s1["gzeta"][1]))
    inv1, inv2 = _combine_invs(zeta, gzeta, big)
    s1b = cache[("stage1b", B)](s1, inv1, inv2)

    state_v, buffer_v = jax.device_get((s1b["state"], s1b["buffer"]))
    pow_witnesses = _grind_from_state(
        state_v, buffer_v, cfg.fri.proof_of_work_bits
    )

    q_out = cache[("queries", B)](
        s1b["state"], s1b["buffer"], jnp.asarray(pow_witnesses),
        s1["trees"], s1b["fold_trees"],
    )

    # ---- single transfer of everything the serialized proofs need ----
    host = jax.device_get(
        {
            "caps": s1["caps"],
            "fold_caps": s1b["fold_caps"],
            "opens": s1["opens"],
            "final_poly": s1b["final_poly"],
            "q": dict(q_out),
        }
    )
    fc0, fc1 = host["final_poly"]
    assert int(np.max(fc0[:, final_len:], initial=0)) == 0, (
        "combined polynomial exceeds claimed degree"
    )
    assert int(np.max(fc1[:, final_len:], initial=0)) == 0
    o0_all, o1_all = host["opens"]
    caps = host["caps"]
    fold_caps = host["fold_caps"]
    qh = host["q"]
    F = data.fixed_lde.shape[0]
    zc = nc * (1 + npp)
    qc = nc * qk
    num_folds = len(fold_caps)

    # Bulk ndarray->list conversion ONCE (r5 stage profile: the previous
    # per-element int() loops cost ~118 ms/batch — 42% of prove time)
    fc0_l = fc0[:, :final_len].tolist()
    fc1_l = fc1[:, :final_len].tolist()
    o0_l = o0_all.tolist()
    o1_l = o1_all.tolist()
    fold_pairs = [np.asarray(qh["folds"][r][0]).tolist()
                  for r in range(num_folds)]
    pow_l = [int(x) for x in pow_witnesses]

    proofs: List[Proof] = []
    for b in range(B):
        query_rounds = []
        for q in range(cfg.fri.num_query_rounds):
            leaves_l = [
                qh["fixed"][0][b, q],
                qh["wires"][0][b, q],
                qh["zs"][0][b, q],
                qh["quo"][0][b, q],
            ]
            sibs_l = [
                qh["fixed"][1][b, q],
                qh["wires"][1][b, q],
                qh["zs"][1][b, q],
                qh["quo"][1][b, q],
            ]
            steps = []
            for r in range(num_folds):
                row = fold_pairs[r][b][q]
                steps.append(
                    FriQueryStep(
                        pair=((row[0], row[1]), (row[2], row[3])),
                        siblings=np.asarray(
                            qh["folds"][r][1][b, q], dtype=np.uint64
                        ),
                    )
                )
            query_rounds.append(
                FriQueryRound(
                    initial_leaves=leaves_l,
                    initial_siblings=sibs_l,
                    steps=steps,
                )
            )
        fri_proof = FriProof(
            commit_caps=[c[b] for c in fold_caps],
            final_poly=list(zip(fc0_l[b], fc1_l[b])),
            pow_witness=pow_l[b],
            query_rounds=query_rounds,
        )
        o0, o1 = o0_l[b], o1_l[b]

        def seg(lo, hi):
            return list(zip(o0[lo:hi], o1[lo:hi]))

        proofs.append(
            Proof(
                wires_cap=caps["wires"][b],
                zs_cap=caps["zs"][b],
                quotient_cap=caps["quo"][b],
                openings=Openings(
                    fixed=seg(0, F),
                    wires=seg(F, F + W),
                    zs_partials=seg(F + W, F + W + zc),
                    quotient=seg(F + W + zc, F + W + zc + qc),
                    zs_next=seg(F + W + zc + qc, F + W + zc + qc + nc),
                ),
                fri=fri_proof,
                public_inputs=[int(x) for x in public_inputs[b]],
            )
        )
    return proofs


def permutation_count(data: CircuitData) -> int:
    """Analytic count of DEVICE Poseidon2 permutations executed per proof
    by the staged batched prover (Merkle commitments + FRI fold trees +
    the duplex challenger lane).  Used by bench.py to report effective
    perms/s inside the prover (occupancy vs the standalone kernel)."""
    cfg = data.config
    n, log_n = data.n, data.log_n
    rate = cfg.fri.rate_bits
    big = n << rate
    cap_h = min(cfg.fri.cap_height, log_n)
    W = cfg.num_wires
    nc = cfg.num_challenges
    zc = nc * (1 + cfg.num_partial_products)
    qc = nc * cfg.quotient_degree_factor

    def tree(m: int, width: int, ch: int) -> int:
        leaf = 0 if width <= 4 else -(-width // 8) * m  # hash_or_noop
        return leaf + (m - (1 << ch))  # internal two_to_one nodes

    total = tree(big, W, cap_h) + tree(big, zc, cap_h) + tree(big, qc, cap_h)
    # FRI fold trees: pairs-of-ext leaves are width 4 (noop)
    cur_log = log_n + rate
    for _ in range(log_n - cfg.fri_final_poly_bits):
        ch = min(cfg.fri.cap_height, cur_log - 1)
        total += tree(1 << (cur_log - 1), 4, ch)
        cur_log -= 1
    # challenger duplex: one permutation per 8 absorbed elements plus one
    # per squeeze refill (approximate; small vs the trees)
    n_open = (
        data.fixed_lde.shape[0] + W + zc + qc + nc
    )
    absorbed = (
        8  # circuit digest + pi hash
        + 3 * (1 << cap_h) * 4  # commitment caps
        + 2 * n_open  # openings (ext pairs)
        + (log_n - cfg.fri_final_poly_bits) * (1 << cfg.fri.cap_height) * 4
        + 2 * (1 << cfg.fri_final_poly_bits)  # final poly
        + 2  # pow
    )
    squeezes = 3 * nc + 4 + cfg.fri.num_query_rounds + 8
    total += -(-absorbed // 8) + squeezes
    return total


def _lde_batched(coeffs: GF, rate_bits: int) -> GF:
    n = coeffs.shape[-1]
    big = n << rate_bits
    pad = gl.zeros(coeffs.shape[:-1] + (big - n,))
    return ntt.coset_ntt(gl.concat([coeffs, pad], axis=-1), SHIFT)


def _leaves_batched(lde_nat: GF) -> GF:
    rev = fri_mod.bit_reverse(lde_nat)  # (B, C, big)
    return GF(jnp.swapaxes(rev.v, 1, 2))  # (B, big, C)


def _ext_leaves_batched(v: GF2) -> GF:
    B, m = v.c0.shape
    cols = gl.stack(
        [
            GF(v.c0.v[:, 0::2]),
            GF(v.c1.v[:, 0::2]),
            GF(v.c0.v[:, 1::2]),
            GF(v.c1.v[:, 1::2]),
        ],
        axis=-1,
    )  # (B, m/2, 4)
    return cols


def _fold_batched(v: GF2, beta: GF2, inv_2x: GF) -> GF2:
    e = GF2(GF(v.c0.v[:, 0::2]), GF(v.c1.v[:, 0::2]))
    o = GF2(GF(v.c0.v[:, 1::2]), GF(v.c1.v[:, 1::2]))
    half_sum = ext2.scalar_mul(
        ext2.add(e, o), gl.full(e.c0.shape, (P + 1) // 2)
    )
    diff = ext2.scalar_mul(ext2.sub(e, o), GF(inv_2x.v[None]))
    beta_b = GF2(GF(beta.c0.v[:, None]), GF(beta.c1.v[:, None]))
    return ext2.add(half_sum, ext2.mul(beta_b, diff))


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(2,))
def _combine_invs(zeta: GF2, gzeta: GF2, big: int):
    """(x - zeta)^-1 and (x - g zeta)^-1 over the LDE domain, batched.
    Kept in its OWN jit: fusing the 64-bit inversion pow-chain into the big
    combine graph sends XLA-CPU optimization superlinear."""
    B = zeta.c0.shape[0]
    log_big = big.bit_length() - 1
    x_t = np.asarray(
        [(SHIFT * int(v)) % P for v in ntt._power_table(
            ntt._root_of_unity(log_big), big
        )],
        dtype=np.uint64,
    )
    x = gl.from_u64(x_t)
    xe = GF2(GF(jnp.broadcast_to(x.v[None], (B, big))), gl.zeros((B, big)))

    def bscalar(z: GF2):
        return GF2(GF(z.c0.v[:, None]), GF(z.c1.v[:, None]))

    def ext_inv(x_: GF2):
        nrm = gl.sub(gl.sqr(x_.c0), gl.mul_const(gl.sqr(x_.c1), ext2.W))
        ninv = gl.inv(nrm)
        return GF2(gl.mul(x_.c0, ninv), gl.mul(gl.neg(x_.c1), ninv))

    inv1 = ext_inv(ext2.sub(xe, bscalar(zeta)))
    inv2 = ext_inv(ext2.sub(xe, bscalar(gzeta)))
    return inv1, inv2


@jax.jit
def _combine_core(
    all_lde: GF, z_lde: GF, opens1: GF2, opens2: GF2, alpha: GF2,
    inv1: GF2, inv2: GF2,
) -> GF2:
    B, C1, big = all_lde.shape
    C2 = z_lde.shape[1]
    apows = _ext_powers_batched(alpha, max(C1, C2) + 1)  # (k, B)

    def batch_sum(lde: GF, opens: GF2, k: int):
        ap = GF2(
            GF(jnp.swapaxes(apows.c0.v[:k], 0, 1)),
            GF(jnp.swapaxes(apows.c1.v[:k], 0, 1)),
        )  # (B, k)
        acc0 = gl.sum_axis(gl.mul(lde, GF(ap.c0.v[:, :, None])), 1)  # (B, big)
        acc1 = gl.sum_axis(gl.mul(lde, GF(ap.c1.v[:, :, None])), 1)
        o = ext2.sum_axis(ext2.mul(ap, opens), axis=1)  # (B,)
        return ext2.sub(
            GF2(acc0, acc1),
            GF2(GF(o.c0.v[:, None]), GF(o.c1.v[:, None])),
        )

    num1 = batch_sum(all_lde, opens1, C1)
    num2 = batch_sum(z_lde, opens2, C2)
    q1 = ext2.mul(num1, inv1)
    q2 = ext2.mul(num2, inv2)
    shift = GF2(GF(apows.c0.v[C1]), GF(apows.c1.v[C1]))  # (B,)
    q2s = ext2.mul(q2, GF2(GF(shift.c0.v[:, None]), GF(shift.c1.v[:, None])))
    return ext2.add(q1, q2s)


def _combine_batched(
    all_lde: GF, z_lde: GF, opens1: GF2, opens2: GF2, alpha: GF2,
    zeta: GF2, gzeta: GF2,
) -> GF2:
    big = all_lde.shape[-1]
    inv1, inv2 = _combine_invs(zeta, gzeta, big)
    return _combine_core(all_lde, z_lde, opens1, opens2, alpha, inv1, inv2)
