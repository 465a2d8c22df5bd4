"""Stage-level profile of the batched tree-node prover on the real chip.

VERDICT r4 item 2: explain where the batch time goes (NTT vs hash vs
constraint eval vs transposes vs host grind vs gathers vs transfer).
Pure measurement — reuses the exact jitted programs bench.py compiles, so
the persistent compile cache stays valid.

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


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        leaf.block_until_ready()


def main():
    B = int(os.environ.get("BENCH_PROOF_BATCH", "32"))
    rng = np.random.default_rng(0)
    t0 = time.time()
    data, input_targets = _build_tree_node(test_config())
    print(f"[{time.time()-t0:6.1f}s] circuit built: n={data.n} "
          f"W={data.config.num_wires} rate={data.config.fri.rate_bits} "
          f"cap={data.config.fri.cap_height} q={data.config.fri.num_query_rounds}")
    wits, pis_list = [], []
    for _ in range(B):
        vals = [int(v) for v in rng.integers(0, 2**31, 37)]
        h = p2h.hash_no_pad(vals)
        pis = list(h) + [vals[24]] + vals[25:33] + vals[8:16] + vals[16:24] \
            + vals[0:4] + vals[4:8] + vals[33:37]
        wits.append(data.generate_witness(dict(zip(input_targets, vals))))
        pis_list.append(pis)
    wits = np.stack(wits)

    # one full warm run through the public API (compiles everything)
    t0 = time.time()
    BA.prove_batch(data, wits, pis_list)
    print(f"[{time.time()-t0:6.1f}s] prove_batch warm (compile or cache load)")
    t0 = time.time()
    BA.prove_batch(data, wits, pis_list)
    full = time.time() - t0
    print(f"[{full:6.3f}s] prove_batch steady-state full")

    # ---- now the staged replication with per-stage sync ----
    cfg = data.config
    cache = data._batch_jits
    pi_hashes = np.array([p2h.hash_no_pad(list(p)) for p in pis_list],
                         dtype=np.uint64)
    wj = jnp.asarray(wits)
    pj = jnp.asarray(pi_hashes)

    res = {}

    def timeit(name, fn, n=5):
        fn()  # warm
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        res[name] = round(best * 1e3, 2)
        print(f"  {name:24s} {best*1e3:9.2f} ms")
        return out

    s1 = cache[("stage1", B)](wj, pj)
    sync(s1)
    timeit("stage1", lambda: (lambda o: (sync(o), o)[1])(
        cache[("stage1", B)](wj, pj)))
    zeta = GF2(GF(s1["zeta"][0]), GF(s1["zeta"][1]))
    gzeta = GF2(GF(s1["gzeta"][0]), GF(s1["gzeta"][1]))
    big = data.n << cfg.fri.rate_bits
    inv1, inv2 = BA._combine_invs(zeta, gzeta, big)
    sync((inv1.c0, inv2.c0))
    timeit("combine_invs", lambda: (lambda o: (sync((o[0].c0, o[1].c0)), o)[1])(
        BA._combine_invs(zeta, gzeta, big)))
    s1b = cache[("stage1b", B)](s1, inv1, inv2)
    sync(s1b)
    timeit("stage1b", lambda: (lambda o: (sync(o), o)[1])(
        cache[("stage1b", B)](s1, inv1, inv2)))

    def grind():
        state_v, buffer_v = jax.device_get((s1b["state"], s1b["buffer"]))
        return BA._grind_from_state(state_v, buffer_v,
                                    cfg.fri.proof_of_work_bits)

    pow_w = timeit("grind(host+device)", grind)

    q_out = cache[("queries", B)](s1b["state"], s1b["buffer"],
                                  jnp.asarray(pow_w), s1["trees"],
                                  s1b["fold_trees"])
    sync(q_out)
    timeit("queries", lambda: (lambda o: (sync(o), o)[1])(
        cache[("queries", B)](s1b["state"], s1b["buffer"],
                              jnp.asarray(pow_w), s1["trees"],
                              s1b["fold_trees"])))

    def pull():
        return jax.device_get({
            "caps": s1["caps"], "fold_caps": s1b["fold_caps"],
            "opens": s1["opens"], "final_poly": s1b["final_poly"],
            "q": dict(q_out),
        })

    host = timeit("device_get", pull)

    # host-side proof assembly (the Python loop at the end of prove_batch)
    def assemble():
        fc0, fc1 = host["final_poly"]
        out = 0
        for b in range(B):
            for q in range(cfg.fri.num_query_rounds):
                out += int(host["q"]["fixed"][0][b, q][0])
        return out

    timeit("assembly_probe(partial)", assemble)
    s = sum(v for k, v in res.items())
    print(f"  {'SUM of stages':24s} {s:9.2f} ms   (full run {full*1e3:.2f} ms)")
    res["full_ms"] = round(full * 1e3, 2)
    res["n"] = data.n
    res["B"] = B
    print(json.dumps(res))


if __name__ == "__main__":
    main()
