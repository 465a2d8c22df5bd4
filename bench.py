"""Benchmark the prover hot kernels on the available accelerator.

Prints JSON result lines (the driver parses the LAST one in the tail):
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": ...}

Primary metric: 2^22 Goldilocks NTT wall time (BASELINE.md north-star).
The reference publishes no numbers (SURVEY.md §6), so vs_baseline is the
ratio against the driver-set target of 10 ms for a 2^22 NTT (>1 = faster
than target).  Extra measurements (Poseidon2 throughput, batched proof
throughput) ride in "extra".

Robustness contract (round-2 lesson: rc=124 with zero output is a total
loss):
  1. The primary line (NTT + Poseidon2 + dispatch calibration) is printed
     as soon as those numbers exist — BEFORE any proof-stage compile.
  2. The proof-throughput stage runs in a SUBPROCESS with a hard timeout;
     if it overruns or dies, the final line still prints with
     "proofs": "skipped: <reason>".
  3. A watchdog thread prints the best-known result and exits 0 at
     BENCH_TOTAL_BUDGET seconds no matter what is stuck.
"""

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# The cache dirs are gitignored, so a fresh checkout (driver round start)
# loses them and the proofs stage pays a ~25 min cold compile it cannot
# fit.  A committed snapshot tarball is the durable copy: restore it
# whenever the live dirs are missing (round-4 lesson — the warm caches
# built mid-round were wiped before the driver's end-of-round run).
_SNAPSHOT = os.path.join(REPO, ".cache_snapshot.tar.gz")


def _cache_missing(repo):
    """True when either cache dir is absent or effectively empty (an
    interrupted cold run leaves a near-empty .jax_cache that must not
    suppress the restore)."""
    for d in (".jax_cache", ".fixed_cache"):
        p = os.path.join(repo, d)
        if not os.path.isdir(p) or not os.listdir(p):
            return True
    return False


if os.path.exists(_SNAPSHOT) and _cache_missing(REPO):
    import tarfile

    try:
        with tarfile.open(_SNAPSHOT) as tf:
            tf.extractall(REPO, filter="data")
        print("bench: restored .jax_cache/.fixed_cache from snapshot",
              file=sys.stderr)
    except Exception as e:  # cold run is slow but correct
        print(f"bench: snapshot restore failed: {e!r}", file=sys.stderr)

# persistent compile cache: remote TPU compiles cost minutes each cold
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)
# fixed-column disk cache: circuit BUILD pays ~4 min of INTT/LDE/Merkle
# per process without it (prover/prove.py _build_fixed)
os.environ.setdefault(
    "MP2_FIXED_CACHE", os.path.join(REPO, ".fixed_cache")
)

LOG_N = int(os.environ.get("BENCH_LOG_N", "22"))
POSEIDON_BATCH = int(os.environ.get("BENCH_P2_BATCH", str(1 << 20)))
TARGET_NTT_MS = 10.0
TOTAL_BUDGET = float(os.environ.get("BENCH_TOTAL_BUDGET", "1500"))
_T0 = time.time()

# best-known result; the watchdog prints this if anything wedges
_RESULT = {"metric": f"goldilocks_ntt_2pow{LOG_N}_ms", "value": None,
           "unit": "ms", "vs_baseline": 0.0, "extra": {}}
_PRINTED_FINAL = threading.Event()


def _emit(final: bool = False):
    print(json.dumps(_RESULT), flush=True)
    if final:
        _PRINTED_FINAL.set()


def _remaining() -> float:
    return TOTAL_BUDGET - (time.time() - _T0)


def _watchdog():
    while not _PRINTED_FINAL.is_set():
        if _remaining() <= 0:
            _RESULT["extra"]["watchdog"] = "budget exhausted; partial result"
            _emit(final=True)
            os._exit(0)
        time.sleep(1.0)


def _init_device(timeout_s: int):
    """Backend init with a watchdog: a wedged TPU tunnel makes the FIRST
    backend touch hang forever — fail fast and loud instead so the driver
    can retry, rather than eating its whole bench budget.  Must run BEFORE
    the mp2_tpu imports (module-level jnp constants initialize the
    backend)."""
    import jax

    # The axon sitecustomize imports jax at interpreter start, BEFORE this
    # module's os.environ writes — so the JAX_COMPILATION_CACHE_DIR env
    # var is never seen by the config (its default was captured with the
    # var unset) and every bench process recompiled everything (the
    # 3-round-old proofs-stage timeout).  Set the config explicitly, like
    # tests/conftest.py does.
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    out = {}

    def probe():
        try:
            out["dev"] = jax.devices()[0]
        except Exception as e:  # init error: report, don't hang
            out["err"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "dev" in out:
        return out["dev"]
    if "err" in out:
        print(f"bench: backend init failed: {out['err']}", file=sys.stderr)
    else:
        print(
            f"bench: backend init did not complete within {timeout_s}s "
            "(TPU tunnel unresponsive)", file=sys.stderr,
        )
    sys.stderr.flush()
    os._exit(3)


def _sync(out):
    import jax
    import numpy as np
    # device_get of one element forces execution; block_until_ready alone is
    # not reliable through the axon tunnel backend.
    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    np.asarray(jax.device_get(leaf[..., :1]))


def _bench(fn, args, iters=5, rounds=3):
    """Min-of-rounds average: host/tunnel contention from concurrent jobs
    shows up as spikes; the min round is the clean measurement."""
    _sync(fn(*args))  # compile + warm
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def _proofs_stage(production: bool = False):
    """Batched map-phase throughput: B independent tree-node witnesses
    proved per dispatch sequence (prover/batch.py), each proof
    individually host-verifiable.  Run as `bench.py --proofs`: prints one
    JSON dict with the measurements (consumed by the parent process).

    `production` (bench.py --proofs-prod): the SAME circuit at the
    production CircuitConfig — rate 1/8, cap 4, 28 FRI query rounds,
    16 PoW bits (VERDICT r4 weak 3: the driver metric must not only
    reflect the soundness-light test shape)."""
    _init_device(int(os.environ.get("BENCH_INIT_TIMEOUT", "600")))
    import numpy as np

    from mp2_tpu.hash import poseidon2_host as p2h
    from mp2_tpu.prover.batch import prove_batch
    from mp2_tpu.prover.config import CircuitConfig, test_config
    from mp2_tpu.recursion.tp2_backend import _build_tree_node

    rng = np.random.default_rng(0)
    B = int(os.environ.get(
        "BENCH_PROD_BATCH" if production else "BENCH_PROOF_BATCH",
        "8" if production else "32"))
    _mark("proofs: circuit build")
    cfg = CircuitConfig() if production else test_config()
    data, input_targets = _build_tree_node(cfg)
    _mark("proofs: circuit built; witness gen")
    wits, pis_list = [], []
    for _ in range(B):
        vals = [int(v) for v in rng.integers(0, 2**31, 37)]
        h = p2h.hash_no_pad(vals)
        lh, rh = vals[0:4], vals[4:8]
        mn, mx = vals[8:16], vals[16:24]
        ident, value, inner = vals[24], vals[25:33], vals[33:37]
        pis = list(h) + [ident] + value + mn + mx + lh + rh + inner
        wits.append(data.generate_witness(dict(zip(input_targets, vals))))
        pis_list.append(pis)
    wits = np.stack(wits)
    _mark("proofs: prove_batch compile+warm")
    prove_batch(data, wits, pis_list)  # compile + warm
    _mark("proofs: timed run")
    t0 = time.perf_counter()
    prove_batch(data, wits, pis_list)
    dt = time.perf_counter() - t0
    _mark("proofs: done")
    if production:
        print(json.dumps({
            "tree_node_proofs_per_s_production": round(B / dt, 2),
            "production_proof_batch": B,
        }), flush=True)
        return
    out = {
        "tree_node_proofs_per_s": round(B / dt, 2),
        "proof_batch": B,
    }
    # Poseidon2 occupancy inside the staged prover (VERDICT r2 item 8):
    # permutations actually executed per batched prove / the prove time.
    try:
        from mp2_tpu.prover.batch import permutation_count
        perms = permutation_count(data) * B
        out["poseidon2_perms_per_s_in_prover"] = int(perms / dt)
        out["poseidon2_perms_per_prove"] = int(perms)
    except Exception as e:  # never fail the stage over the extra metric
        out["perm_count_err"] = repr(e)[:120]
    print(json.dumps(out), flush=True)


def _mark(stage):
    print(f"bench: [{time.time()-_T0:7.1f}s] {stage}", file=sys.stderr)
    sys.stderr.flush()


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    _mark("init device")
    dev = _init_device(int(os.environ.get("BENCH_INIT_TIMEOUT", "600")))
    _mark("device ready")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mp2_tpu.field import goldilocks as gl
    from mp2_tpu.field.goldilocks import GF
    from mp2_tpu.hash import poseidon2 as p2
    from mp2_tpu.prover import ntt

    n = 1 << LOG_N
    rng = np.random.default_rng(0)

    x = GF(jnp.asarray(rng.integers(0, gl.P, size=(n,), dtype=np.uint64)))
    ntt_fn = jax.jit(lambda v: ntt.ntt(v))
    _mark("ntt compile+bench")
    ntt_s = _bench(ntt_fn, (x,), iters=8)
    ntt_ms = ntt_s * 1e3
    _mark("ntt done")

    states = GF(
        jnp.asarray(
            rng.integers(0, gl.P, size=(POSEIDON_BATCH, 12), dtype=np.uint64)
        )
    )
    _mark("poseidon2 compile+bench")
    p2_s = _bench(p2.permute, (states,), iters=8)
    perms_per_s = POSEIDON_BATCH / p2_s
    # planar (per-lane) entry: the prover's layout — no (B,12)<->(12,B)
    # transposes around the kernel (hash/poseidon2.py permute_lanes)
    lanes = [states[..., i] for i in range(12)]
    p2p_s = _bench(lambda *ls: p2.permute_lanes(list(ls)), tuple(lanes),
                   iters=8)
    _mark("poseidon2 done")

    # calibrate the fixed per-dispatch cost of the axon tunnel (a trivial
    # jitted op): every number above carries this constant, which a local
    # PJRT client would not pay (~10-100 us there).  Reported, not
    # subtracted — vs_baseline stays the honest wall number.
    tiny = GF(jnp.arange(8, dtype=jnp.uint64))
    dispatch_s = _bench(jax.jit(lambda v: gl.add_const(v, 1)), (tiny,), iters=10)

    _RESULT["value"] = round(ntt_ms, 3)
    _RESULT["vs_baseline"] = round(TARGET_NTT_MS / ntt_ms, 3)
    _RESULT["extra"].update({
        "device": str(dev),
        "poseidon2_perms_per_s": int(perms_per_s),
        "poseidon2_planar_perms_per_s": int(POSEIDON_BATCH / p2p_s),
        "poseidon2_batch": POSEIDON_BATCH,
        "dispatch_overhead_ms": round(dispatch_s * 1e3, 2),
        "ntt_ms_minus_dispatch": round(ntt_ms - dispatch_s * 1e3, 3),
    })
    _emit()  # PRIMARY line: on the wire before any proof-stage compile

    def _proof_substage(flag: str, label: str, default_timeout: str):
        budget = min(_remaining() - 60.0,
                     float(os.environ.get("BENCH_PROOF_TIMEOUT",
                                          default_timeout)))
        if budget < 60:
            _RESULT["extra"][label] = "skipped: insufficient budget"
            return
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), flag],
                capture_output=True, text=True, timeout=budget,
            )
            line = next(
                (ln for ln in reversed(r.stdout.splitlines())
                 if ln.startswith("{")), None)
            if r.returncode == 0 and line:
                _RESULT["extra"].update(json.loads(line))
            else:
                _RESULT["extra"][label] = (
                    f"failed rc={r.returncode}: {r.stderr[-200:]}")
        except subprocess.TimeoutExpired:
            _RESULT["extra"][label] = f"skipped: timeout {budget:.0f}s"
        except Exception as e:
            _RESULT["extra"][label] = f"skipped: {e!r}"[:200]

    if os.environ.get("BENCH_PROOFS", "1") != "0":
        _proof_substage("--proofs", "proofs", "1200")
        _emit()  # light-shape proofs metric on the wire before prod stage
    if os.environ.get("BENCH_PROOFS_PROD", "1") != "0":
        # production-config metric (VERDICT r4 item 4): cheap when its
        # compile cache is warm; times out gracefully when cold
        _proof_substage("--proofs-prod", "proofs_production", "900")

    _RESULT["extra"]["bench_wall_s"] = round(time.time() - _T0, 1)
    _emit(final=True)


if __name__ == "__main__":
    if "--proofs-prod" in sys.argv:
        _proofs_stage(production=True)
    elif "--proofs" in sys.argv:
        _proofs_stage()
    else:
        main()
