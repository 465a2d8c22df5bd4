"""REAL-PROOF end-to-end: the committed DB stack (cells -> rows -> block ->
IVC, every layer verified in-circuit against the lower layer's fixed-VK set)
chained into the tree-bound query stack, whose revelation proof verifies BOTH
the query chunk root and the IVC proof in-circuit and binds them together
(index root == IVC block-tree root).

This is the product loop of the reference (verifiable-db/src/api.rs +
query/api.rs + revelation/revelation_without_results_tree.rs): one final
proof attests "this SQL result is correct over the committed database".
"""

import os

import pytest

from mp2_tpu.parsil.assembler import parse_and_assemble
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.prover.config import test_config
from mp2_tpu.vdb import circuits as C
from mp2_tpu.vdb import digests as D
from mp2_tpu.vdb.query.chunks import QueryCircuits, make_row_binding
from mp2_tpu.vdb.query.ops import Placeholders, QueryBounds
from mp2_tpu.vdb.query.universal import UniversalQueryParams
from mp2_tpu.vdb.trees import (
    BlockPayload,
    Cell,
    RowPayload,
    build_cells_tree,
    new_block_tree,
    new_row_tree,
)

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)

BLOCK_ID, KEY_ID, VALUE_ID = 1, 2, 3
COLUMN_IDS = [BLOCK_ID, KEY_ID, VALUE_ID]
TABLE = ZkTable(
    "t",
    [
        ZkColumn("block", BLOCK_ID, "primary_index"),
        ZkColumn("key", KEY_ID, "secondary_index"),
        ZkColumn("value", VALUE_ID),
    ],
)
PARAMS = UniversalQueryParams(
    num_columns=3, num_placeholders=4, num_predicate_ops=4,
    num_result_ops=2, num_outputs=2,
)
SQL = (
    "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK "
    "AND block <= $MAX_BLOCK"
)


def _prove_rows_tree(vdb, rows_db, cells_envs):
    """One real proof per rows-tree node, children verified in-circuit."""

    def prove(key):
        l, r = rows_db.tree.children(key)
        payload = rows_db.payload(key)
        children = [prove(c) for c in (l, r) if c is not None]
        pis = C.rows_pi_values(payload)
        if not children:
            return vdb.rows.prove_aggregation(
                "rows_leaf", [],
                (payload.secondary, payload.row_unique_data), pis,
                foreign_children=[cells_envs[key]],
            )
        if l is not None and r is not None:
            return vdb.rows.prove_aggregation(
                "rows_full", children,
                (payload.secondary, payload.row_unique_data), pis,
                foreign_children=[cells_envs[key]],
            )
        return vdb.rows.prove_aggregation(
            "rows_partial", children,
            (payload.secondary, payload.row_unique_data, l is not None), pis,
            foreign_children=[cells_envs[key]],
        )

    return prove(rows_db.root())


def _run_full_stack(cfg):
    """Shared pipeline: committed DB (cells->rows->block->IVC) + tree-bound
    query stack; returns (qc, revelation envelope, revelation PIs, block
    payload)."""
    vdb = C.VerifiableDbCircuits(cfg)

    entries = {7: 10, 8: 99}
    block_no = 100
    rows_db = new_row_tree()
    block_db = new_block_tree()
    cells_results = {}

    def tx(t):
        for k, v in entries.items():
            cells = build_cells_tree([Cell(VALUE_ID, v, False)])
            cells_results[(k, 0)] = cells
            t.store(
                (k, 0),
                RowPayload(
                    secondary=Cell(KEY_ID, k, False),
                    row_unique_data=(k, k, k, k),
                    cells=cells,
                ),
            )

    rows_db.in_transaction(tx)
    epoch = rows_db.epoch

    # cells trees: one real proof chain per row
    cells_envs = {
        key: vdb.prove_cells_tree(res) for key, res in cells_results.items()
    }
    rows_env = _prove_rows_tree(vdb, rows_db, cells_envs)
    assert vdb.rows.verify(rows_env)

    root_pl = rows_db.payload(rows_db.root())
    digest = D.compute_final_digest(
        False, root_pl.individual_vd, root_pl.multiplier_vd,
        root_pl.multiplier_cnt,
    )
    block_db.in_transaction(
        lambda t: t.store(
            block_no,
            BlockPayload(
                index_id=BLOCK_ID, block_number=block_no,
                rows_hash=root_pl.hash, rows_digest=digest,
            ),
        )
    )
    blk = block_db.payload(block_no)
    blk_env = vdb.block.prove_aggregation(
        "block_leaf", [], (BLOCK_ID, block_no, False),
        C.block_pi_values(blk), foreign_children=[rows_env],
    )
    assert vdb.block.verify(blk_env)

    from mp2_tpu.hash import poseidon2_host as p2h

    md = p2h.hash_no_pad([11, 22, 33])
    ivc_env = vdb.ivc.prove_aggregation(
        "ivc_first", [], (md, block_no),
        C.ivc_pi_values(blk.hash, md, block_no), foreign_children=[blk_env],
    )
    assert vdb.ivc.verify(ivc_env)

    # --- query stack bound to the committed trees AND the IVC proof
    qc = QueryCircuits(
        cfg, PARAMS, ivc_framework=vdb.ivc,
        row_tree_depth=4, index_tree_depth=4,
    )
    pis = parse_and_assemble(SQL, TABLE)
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)

    view = rows_db.view_at(epoch)
    rows, bindings = [], []
    for k in sorted(entries):
        rows.append([block_no, k, entries[k]])
        bindings.append(make_row_binding(view, (k, 0), block_db, block_no))

    env, reveal = qc.prove_query(
        pis, COLUMN_IDS, rows, ph, bounds, ivc_env=ivc_env, bindings=bindings
    )
    assert qc.verify(env)
    return qc, env, reveal, blk


@slow
def test_real_full_stack_db_to_revelation():
    qc, env, reveal, blk = _run_full_stack(test_config())
    # the revelation exposes the IVC's block-tree root
    assert list(reveal[8:12]) == [int(x) for x in blk.hash]
    # SUM(value) = 109, COUNT = 2
    got = 0
    for l in reveal[12:20]:
        got = (got << 32) | l
    assert got == 109
    assert reveal[12 + 16] == 2


@slow
def test_real_revelation_groth16_wrap():
    """The on-chain story over the REAL revelation proof (not a toy inner):
    the full DB+query pipeline's revelation envelope -> complete in-SNARK
    TP2 verifier R1CS against the revelation wrap circuit's fixed
    commitment, digest-bound to its VK -> BN254 Groth16 setup/prove/verify
    (reference: verifiable-db/src/api.rs:150-215 WrapCircuitParams +
    groth16-framework/src/lib.rs:70-100 + gnark-utils/lib/lib.go).

    Runs at the light FRI shape (rate 3, cap 1, 2 query rounds — same
    shape as tests/test_groth16_verifier.py's inner fixture); the wrapped
    revelation proof still yields a ~30.6M-row R1CS (measured: build 197s,
    check 75s).  The BN254 Groth16 setup/prove/verify over it is >1h, so
    that half runs only under MP2_SLOW_G16=1 (the Groth16 machinery itself
    is already covered at 14.4M rows by test_tp2_verifier_groth16_roundtrip
    and at 293k-row CSR parity by the native tests); the production-shape
    verifier statement is exercised separately by
    test_tp2_verifier_groth16_production."""
    from mp2_tpu.groth16 import _run_r1cs_csr, available
    from mp2_tpu.groth16.r1cs_builder import build_tp2_verifier_r1cs
    from mp2_tpu.prover.fri import FriConfig

    cfg = test_config(
        fri=FriConfig(
            rate_bits=3, cap_height=1, proof_of_work_bits=4,
            num_query_rounds=2,
        ),
    )
    qc, env, reveal, blk = _run_full_stack(cfg)
    assert list(reveal[8:12]) == [int(x) for x in blk.hash]

    m = qc.revelation.members["revelation"]
    # spill=True streams the ~30.6M rows to disk-backed CSR fragments as
    # they are stamped (RSS bounded by the witness, not the row dicts)
    r1cs, digest = build_tp2_verifier_r1cs(m.wrap.data, env.proof,
                                           spill=True)
    assert r1cs.check()
    # the in-SNARK recomputed circuit digest IS the revelation wrap VK
    assert digest == list(m.wrap.data.circuit_digest)
    # Groth16 publics = the revelation proof's public inputs, in order
    P = (1 << 64) - (1 << 32) + 1
    assert r1cs.witness[1 : 1 + len(env.proof.public_inputs)] == [
        int(v) % P for v in env.proof.public_inputs
    ]
    print(
        f"REAL revelation wrap statement: {len(r1cs.rows)} rows / "
        f"{len(r1cs.witness)} wires, digest-bound to the revelation VK"
    )
    if os.environ.get("MP2_SLOW_G16"):
        assert available(), "native bn254 backend not built"
        assert _run_r1cs_csr(r1cs, 42, False) == 0
        print("REAL revelation Groth16 setup/prove/verify OK")


@pytest.mark.skipif(
    not os.environ.get("MP2_SLOW_PROD"),
    reason="set MP2_SLOW_PROD=1: multi-hour production-config run",
)
def test_real_revelation_wrap_statement_production_config():
    """The REAL pipeline at the PRODUCTION CircuitConfig (rate 1/8, cap 4,
    28 FRI query rounds, 16 PoW bits): full DB build + tree-bound query +
    revelation, proven and host-verified.  Measured 2026-08-20 (4-core
    box, niced, under load): vdb sets 1301s, cells 251s, rows 742s,
    block 338s, IVC 144s, query sets 263s, query+revelation 309s — 56 min
    end-to-end; the wrapped revelation lands on the 2^14-row standard
    shape.

    The in-SNARK verifier R1CS over THIS proof additionally needs
    MP2_SLOW_PROD_R1CS=1: at the production proof shape it exceeds 125 GB
    RSS with the in-memory row intake (measured OOM at 130 GB; the
    102.43M-row statement over a small production-config proof fits —
    tests/test_groth16_verifier.py).  Streaming the stamped rows to the
    CSR intake is the tracked fix (NEXT.md)."""
    from mp2_tpu.prover.config import CircuitConfig

    cfg = CircuitConfig()
    assert cfg.fri.num_query_rounds == 28 and cfg.fri.cap_height == 4
    qc, env, reveal, blk = _run_full_stack(cfg)
    assert list(reveal[8:12]) == [int(x) for x in blk.hash]
    got = 0
    for l in reveal[12:20]:
        got = (got << 32) | l
    assert got == 109 and reveal[12 + 16] == 2
    print(
        "PRODUCTION-config revelation proven; wrapped standard shape = "
        f"2^{qc.revelation.standard.n.bit_length() - 1} rows"
    )

    if os.environ.get("MP2_SLOW_PROD_R1CS"):
        from mp2_tpu.groth16.r1cs_builder import build_tp2_verifier_r1cs

        m = qc.revelation.members["revelation"]
        # spill mode: stamped rows stream to disk-backed CSR fragments, so
        # peak RSS is the witness vector, not the 130 GB row-dict list
        # that OOMed in round 3 (NEXT.md item 1)
        r1cs, digest = build_tp2_verifier_r1cs(m.wrap.data, env.proof,
                                               spill=True)
        assert r1cs.check()
        assert digest == list(m.wrap.data.circuit_digest)
        n_rows, n_wires = len(r1cs.rows), len(r1cs.witness)
        print(
            f"PRODUCTION revelation wrap statement: {n_rows} rows / "
            f"{n_wires} wires (spill-streamed)"
        )
        if os.environ.get("MP2_SLOW_G16"):
            import gc

            import jax

            from mp2_tpu.groth16 import _run_r1cs_csr, available

            assert available(), "native bn254 backend not built"
            # Release the pipeline's retained state before the native
            # setup/prove: the circuit sets + compiled executables +
            # proof envelopes hold ~60 GB, and the second r5 production
            # attempt OOMed at 128 GB with them still alive alongside
            # the native CRS tables.
            del qc, env, reveal, blk, m
            jax.clear_caches()
            gc.collect()
            assert _run_r1cs_csr(r1cs, 42, False) == 0
            print("PRODUCTION revelation Groth16 setup/prove/verify OK")
