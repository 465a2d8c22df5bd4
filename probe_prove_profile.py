"""Stage-level profile of the batched tree-node prover on the real chip.

VERDICT r4 item 2: explain where the batch time goes.  Methodology:
cumulative-prefix timing — each measurement runs the pipeline from the
start up to stage k and syncs ONCE on one small leaf (bench.py _sync
style; per-leaf block_until_ready through the axon tunnel pays a round
trip per leaf and inflates per-stage numbers ~6x).  Differences between
prefixes are the marginal cost of each stage inside the real pipeline.

Pure measurement — reuses the exact jitted programs bench.py compiles.
Run standalone (the only axon process): python probe_prove_profile.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("MP2_FIXED_CACHE", os.path.join(REPO, ".fixed_cache"))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from mp2_tpu.field.ext2 import GF2
from mp2_tpu.field.goldilocks import GF
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.prover import batch as BA
from mp2_tpu.prover.config import test_config
from mp2_tpu.recursion.tp2_backend import _build_tree_node


def sync1(out):
    """One-leaf sync: forces execution of everything already enqueued."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def main():
    B = int(os.environ.get("BENCH_PROOF_BATCH", "32"))
    rng = np.random.default_rng(0)
    t0 = time.time()
    data, input_targets = _build_tree_node(test_config())
    print(f"[{time.time()-t0:6.1f}s] circuit built: n={data.n} "
          f"W={data.config.num_wires} rate={data.config.fri.rate_bits}")
    wits, pis_list = [], []
    for _ in range(B):
        vals = [int(v) for v in rng.integers(0, 2**31, 37)]
        h = p2h.hash_no_pad(vals)
        pis = list(h) + [vals[24]] + vals[25:33] + vals[8:16] + vals[16:24] \
            + vals[0:4] + vals[4:8] + vals[33:37]
        wits.append(data.generate_witness(dict(zip(input_targets, vals))))
        pis_list.append(pis)
    wits = np.stack(wits)

    t0 = time.time()
    BA.prove_batch(data, wits, pis_list)
    print(f"[{time.time()-t0:6.1f}s] prove_batch warm")
    t0 = time.time()
    BA.prove_batch(data, wits, pis_list)
    full = time.time() - t0
    print(f"[{full*1e3:6.1f}ms] prove_batch steady state ({B/full:.1f} proofs/s)")

    cfg = data.config
    cache = data._batch_jits
    pi_hashes = np.array([p2h.hash_no_pad(list(p)) for p in pis_list],
                         dtype=np.uint64)
    wj = jnp.asarray(wits)
    pj = jnp.asarray(pi_hashes)
    big = data.n << cfg.fri.rate_bits

    def run_to(k: int):
        """The pipeline from scratch up to checkpoint k; sync once."""
        s1 = cache[("stage1", B)](wj, pj)
        if k == 1:
            return sync1(s1["caps"])
        zeta = GF2(GF(s1["zeta"][0]), GF(s1["zeta"][1]))
        gzeta = GF2(GF(s1["gzeta"][0]), GF(s1["gzeta"][1]))
        inv1, inv2 = BA._combine_invs(zeta, gzeta, big)
        if k == 2:
            return sync1(inv1.c0)
        s1b = cache[("stage1b", B)](s1, inv1, inv2)
        if k == 3:
            return sync1(s1b["final_poly"])
        state_v, buffer_v = jax.device_get((s1b["state"], s1b["buffer"]))
        pow_w = BA._grind_from_state(state_v, buffer_v,
                                     cfg.fri.proof_of_work_bits)
        if k == 4:
            return pow_w
        q_out = cache[("queries", B)](s1b["state"], s1b["buffer"],
                                      jnp.asarray(pow_w), s1["trees"],
                                      s1b["fold_trees"])
        if k == 5:
            return sync1(q_out["idx"])
        return jax.device_get({
            "caps": s1["caps"], "fold_caps": s1b["fold_caps"],
            "opens": s1["opens"], "final_poly": s1b["final_poly"],
            "q": dict(q_out),
        })

    names = ["stage1", "+combine_invs", "+stage1b", "+grind", "+queries",
             "+device_get(all)"]
    res = {}
    prev = 0.0
    for k in range(1, 7):
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            run_to(k)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        res[names[k - 1]] = round(best * 1e3, 2)
        print(f"  prefix {names[k-1]:18s} cum {best*1e3:8.2f} ms   "
              f"marginal {max(0.0, best - prev)*1e3:8.2f} ms")
        prev = best
    res["full_ms"] = round(full * 1e3, 2)
    res["B"] = B
    print(json.dumps(res))


if __name__ == "__main__":
    main()
