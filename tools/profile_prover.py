"""Stage-level wall profile of the batched prover (VERDICT r4 item 2).

Times each piece of prove_batch separately on the current backend:
stage1 / inv / stage1b / grind / queries device programs, plus the host
sections (PI hashing, witness stacking, proof assembly).  Run on the
real chip (default backend) with warm caches:

    python tools/profile_prover.py [B]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
os.environ.setdefault("MP2_FIXED_CACHE", os.path.join(REPO, ".fixed_cache"))

import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def sync(x):
    return jax.block_until_ready(x)


def main():
    from mp2_tpu.field.goldilocks import GF
    from mp2_tpu.field.ext2 import GF2
    from mp2_tpu.hash import poseidon2_host as p2h
    from mp2_tpu.prover import batch as pb
    from mp2_tpu.prover.config import test_config
    from mp2_tpu.recursion.tp2_backend import _build_tree_node

    print(f"backend: {jax.devices()[0]}")
    t0 = time.perf_counter()
    data, input_targets = _build_tree_node(test_config())
    print(f"circuit build: {time.perf_counter()-t0:.2f}s  "
          f"n={data.n} W={data.config.num_wires} "
          f"F={data.fixed_lde.shape[0]} big={data.n << data.config.fri.rate_bits}")

    rng = np.random.default_rng(0)
    wits, pis_list = [], []
    t0 = time.perf_counter()
    for _ in range(B):
        vals = [int(v) for v in rng.integers(0, 2**31, 37)]
        h = p2h.hash_no_pad(vals)
        lh, rh = vals[0:4], vals[4:8]
        mn, mx = vals[8:16], vals[16:24]
        ident, value, inner = vals[24], vals[25:33], vals[33:37]
        pis_list.append(list(h) + [ident] + value + mn + mx + lh + rh + inner)
        wits.append(data.generate_witness(dict(zip(input_targets, vals))))
    wits = np.stack(wits)
    print(f"witness gen ({B}): {time.perf_counter()-t0:.2f}s")

    # full warm (compiles everything)
    t0 = time.perf_counter()
    pb.prove_batch(data, wits, pis_list)
    print(f"prove_batch warm (incl compile): {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    proofs = pb.prove_batch(data, wits, pis_list)
    full = time.perf_counter() - t0
    print(f"prove_batch steady: {full:.3f}s  -> {B/full:.1f} proofs/s")

    # ---- now stage by stage (replicating prove_batch) ----
    cfg = data.config
    cache = data._batch_jits
    s1j = cache[("stage1", B)]
    s1bj = cache[("stage1b", B)]
    qj = cache[("queries", B)]

    t0 = time.perf_counter()
    pi_hashes = np.array([p2h.hash_no_pad(list(p)) for p in pis_list],
                         dtype=np.uint64)
    t_pih = time.perf_counter() - t0

    wdev = jnp.asarray(wits)
    pdev = jnp.asarray(pi_hashes)
    sync((wdev, pdev))

    for it in range(3):
        t0 = time.perf_counter()
        s1 = sync(s1j(wdev, pdev))
        t_s1 = time.perf_counter() - t0

        big = data.n << cfg.fri.rate_bits
        t0 = time.perf_counter()
        zeta = GF2(GF(s1["zeta"][0]), GF(s1["zeta"][1]))
        gzeta = GF2(GF(s1["gzeta"][0]), GF(s1["gzeta"][1]))
        inv1, inv2 = pb._combine_invs(zeta, gzeta, big)
        sync((inv1.c0.v, inv2.c0.v))
        t_inv = time.perf_counter() - t0

        t0 = time.perf_counter()
        s1b = sync(s1bj(s1, inv1, inv2))
        t_s1b = time.perf_counter() - t0

        t0 = time.perf_counter()
        state_v, buffer_v = jax.device_get((s1b["state"], s1b["buffer"]))
        t_get1 = time.perf_counter() - t0

        t0 = time.perf_counter()
        pow_w = pb._grind_from_state(state_v, buffer_v,
                                     cfg.fri.proof_of_work_bits)
        t_grind = time.perf_counter() - t0

        t0 = time.perf_counter()
        q_out = sync(qj(s1b["state"], s1b["buffer"], jnp.asarray(pow_w),
                        s1["trees"], s1b["fold_trees"]))
        t_q = time.perf_counter() - t0

        t0 = time.perf_counter()
        host = jax.device_get({
            "caps": s1["caps"], "fold_caps": s1b["fold_caps"],
            "opens": s1["opens"], "final_poly": s1b["final_poly"],
            "q": dict(q_out),
        })
        t_get2 = time.perf_counter() - t0

        tot = t_s1 + t_inv + t_s1b + t_get1 + t_grind + t_q + t_get2
        print(f"[iter {it}] stage1 {t_s1*1e3:7.1f}ms | inv {t_inv*1e3:6.1f}ms"
              f" | stage1b {t_s1b*1e3:7.1f}ms | get_state {t_get1*1e3:6.1f}ms"
              f" | grind {t_grind*1e3:6.1f}ms | queries {t_q*1e3:6.1f}ms"
              f" | get_final {t_get2*1e3:6.1f}ms | sum {tot*1e3:7.1f}ms")
    print(f"pi hashing (host): {t_pih*1e3:.1f}ms")

    # host assembly: time the python loop part by re-running prove_batch
    # minus device time is awkward; instead time proofs-from-host directly
    t0 = time.perf_counter()
    # reuse last host dict: replicate assembly loop cost
    from mp2_tpu.prover.batch import FriProof, FriQueryRound, FriQueryStep, Openings, Proof  # noqa
    fc0, fc1 = host["final_poly"]
    o0_all, o1_all = host["opens"]
    caps, fold_caps, qh = host["caps"], host["fold_caps"], host["q"]
    F = data.fixed_lde.shape[0]
    nc = cfg.num_challenges
    zc = nc * (1 + cfg.num_partial_products)
    qc = nc * cfg.quotient_degree_factor
    W = cfg.num_wires
    final_len = 1 << cfg.fri_final_poly_bits
    num_folds = len(fold_caps)
    cnt = 0
    for b in range(B):
        for q in range(cfg.fri.num_query_rounds):
            for r in range(num_folds):
                row = qh["folds"][r][0][b, q]
                cnt += int(row[0]) & 1
    t_asm_probe = time.perf_counter() - t0
    print(f"assembly probe (gather loops only): {t_asm_probe*1e3:.1f}ms")

    perms = pb.permutation_count(data)
    print(f"perms/proof (analytic): {perms}; perms/s in steady prove: "
          f"{perms*B/full/1e6:.2f}M")


if __name__ == "__main__":
    main()
