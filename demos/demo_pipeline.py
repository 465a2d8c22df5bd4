"""Demo: full pipeline — Ethereum state -> verifiable DB -> IVC -> SQL query.

Run: python demos/demo_pipeline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from mp2_tpu.models.pipeline import MappingTableConfig, TableIndexer, make_chain
from mp2_tpu.vdb.query.ops import Placeholders

t0 = time.time()
cfg = MappingTableConfig(contract_address=bytes(range(20)), chain_id=1, slot=3)
chain = make_chain(
    cfg,
    [
        {b"\x01": 100, b"\x02": 200},
        {b"\x01": 150, b"\x02": 200, b"\x03": 300},
        {b"\x02": 200, b"\x03": 350},
    ],
)
print(f"fixture chain: {len(chain)} blocks ({time.time()-t0:.2f}s)")

t0 = time.time()
idx = TableIndexer(cfg)
for blk in chain:
    final = idx.apply_block(blk)
    print(
        f"  block {blk.number}: extracted {len(blk.entries)} rows, "
        f"rows-tree size {idx.rows_db.size()}, "
        f"digest invariant OK, proofs {len(idx.proofs)}"
    )
print(f"indexed {len(chain)} epochs ({time.time()-t0:.2f}s)")

sql = (
    "SELECT SUM(value), COUNT(*) FROM t "
    "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK"
)
res, reveal = idx.run_query(
    sql, Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 102})
)
print(f"query: {sql}")
print(f"  result: SUM={res.rows[0][0]} COUNT={res.rows[0][1]} "
      f"(matching rows: {res.num_matching_rows})")
want_sum = 100 + 200 + 150 + 200 + 300 + 200 + 350
ok = res.rows[0][0] == want_sum and res.rows[0][1] == 7
print(f"  expected SUM={want_sum}: {'OK' if ok else 'MISMATCH'}")
print(f"  revelation binds block-tree root: "
      f"{list(idx.ivc.block_tree_root) == reveal.public_inputs[8:12]}")
sys.exit(0 if ok else 1)
