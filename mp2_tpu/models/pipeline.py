"""HOST-GOLDEN end-to-end pipeline: Ethereum state -> verifiable DB -> SQL.

NOTE: the FLAGSHIP pipeline with real proofs at every stage is
`models.circuit_pipeline.CircuitTableIndexer` / `MergedTableIndexer`; this
module is the exact-value golden model it is tested against (and the
fixture factory both share).  Kept because the host model computes every
cross-layer value independently of the circuits.

The minimum end-to-end slice of SURVEY.md §7.5, at host-golden level with the
recursion framework's proof envelopes: every stage consumes/produces the same
values its circuit counterpart exposes, and the cross-layer invariants the
circuits enforce are asserted here:

  * block-tree leaf: extraction values digest == rows-tree final digest
    (block_tree/mod.rs:37-60) — the deep consistency between the extraction
    digest conventions and the rows-tree digest conventions;
  * IVC chain: parent-hash linkage across epochs + running metadata hash;
  * revelation: query result bound to (computational hash, placeholder hash,
    IVC commitment).

Proofs: generated through RecursiveCircuits over the declared circuit set,
scheduled by the ryhope UpdateTree workplans (the map-reduce DAG).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from mp2_tpu.extraction import storage_key as SK
from mp2_tpu.extraction import values as V
from mp2_tpu.extraction.api import (
    FinalExtractionOutput,
    SlotEntry,
    extract_block,
    extract_contract,
    extract_storage_slots,
    final_extraction,
)
from mp2_tpu.extraction.columns import simple_column
from mp2_tpu.field.ecgfp5 import NEUTRAL, Point
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.parsil.assembler import CircuitPis, parse_and_assemble
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.recursion.framework import ProofWithVK, RecursiveCircuits
from mp2_tpu.ryhope.updatetree import UpdateTree
from mp2_tpu.utils import rlp
from mp2_tpu.utils.keccak import keccak256
from mp2_tpu.utils.trie import MPT
from mp2_tpu.vdb import digests as D
from mp2_tpu.vdb.query.api import Placeholders, QueryResult, TableData, execute_query
from mp2_tpu.vdb.trees import (
    BlockPayload,
    Cell,
    RowPayload,
    build_cells_tree,
    new_block_tree,
    new_row_tree,
)

CIRCUITS = [
    "values_leaf", "values_branch", "contract", "block_extraction",
    "final_extraction", "cells_leaf", "cells_full", "cells_partial",
    "rows_leaf", "rows_full", "rows_partial", "block_leaf", "block_parent",
    "block_membership", "ivc_first", "ivc_subsequent",
    "row_chunk", "chunk_aggregation", "non_existence", "revelation",
]


@dataclass
class MappingTableConfig:
    """A table extracted from one mapping slot: rows keyed by mapping key."""

    contract_address: bytes
    chain_id: int
    slot: int

    def __post_init__(self):
        self.key_id = V.identifier_for_mapping_key_column(
            self.slot, self.contract_address, self.chain_id
        )
        self.value_id = V.identifier_for_value_column(
            self.slot, 0, 256, 0, self.contract_address, self.chain_id
        )
        self.block_id = V.identifier_block_column()
        self.column = simple_column(self.slot, self.value_id)

    def schema(self) -> ZkTable:
        return ZkTable(
            "t",
            [
                ZkColumn("block", self.block_id, "primary_index"),
                ZkColumn("key", self.key_id, "secondary_index"),
                ZkColumn("value", self.value_id),
            ],
        )


@dataclass
class MergedTableConfig(MappingTableConfig):
    """A MERGED table (final_extraction merge_circuit.rs): a mapping table
    (individual rows) joined with a single-slot table whose columns repeat
    on every row (the multiplier side of the split-digest scheme) — e.g.
    ERC-20 balances merged with the total supply."""

    single_slot: int = 0

    def __post_init__(self):
        super().__post_init__()
        assert self.single_slot != self.slot
        self.supply_id = V.identifier_for_value_column(
            self.single_slot, 0, 256, 0, self.contract_address, self.chain_id
        )
        self.single_column = simple_column(self.single_slot, self.supply_id)

    def schema(self) -> ZkTable:
        return ZkTable(
            "t",
            [
                ZkColumn("block", self.block_id, "primary_index"),
                ZkColumn("key", self.key_id, "secondary_index"),
                ZkColumn("value", self.value_id),
                ZkColumn("supply", self.supply_id),
            ],
        )


@dataclass
class BlockFixture:
    number: int
    header_rlp: bytes
    state: MPT
    storage: MPT
    entries: Dict[bytes, int]  # mapping key -> value
    single_value: Optional[int] = None  # merged tables: the multiplier slot


def make_chain(
    cfg: MappingTableConfig, per_block_entries: Sequence[Dict[bytes, int]],
    start_block: int = 100,
    single_values: Optional[Sequence[int]] = None,
) -> List[BlockFixture]:
    """Build a fixture chain: each block's storage trie holds the mapping
    (and, for merged tables, the single multiplier slot per
    `single_values[i]`)."""
    blocks = []
    parent = keccak256(b"genesis")
    for i, entries in enumerate(per_block_entries):
        number = start_block + i
        storage = MPT(secure=True)
        for k, v in entries.items():
            storage.insert(SK.mapping_location(cfg.slot, k), rlp.encode_int(v))
        single_v = single_values[i] if single_values is not None else None
        if single_v is not None:
            storage.insert(
                SK.simple_slot_location(cfg.single_slot),
                rlp.encode_int(single_v),
            )
        storage.insert(keccak256(b"unrelated"), rlp.encode_int(7))
        state = MPT(secure=True)
        account = rlp.encode(
            [b"\x01", b"\x00", storage.root_hash(), keccak256(b"code")]
        )
        state.insert(cfg.contract_address, account)
        header = rlp.encode(
            [
                parent,
                keccak256(b"uncles"),
                bytes(20),
                state.root_hash(),
                keccak256(b"tx"),
                keccak256(b"rc"),
                b"\x00" * 32,
                b"\x01",
                number.to_bytes(4, "big"),
            ]
        )
        blocks.append(
            BlockFixture(number, header, state, storage, dict(entries),
                         single_value=single_v)
        )
        parent = keccak256(header)
    return blocks


@dataclass
class IvcOutput:
    first_block: int
    latest_block: int
    latest_block_hash: bytes
    block_tree_root: Tuple[int, int, int, int]
    metadata_hash: Tuple[int, int, int, int]


class TableIndexer:
    """Drives extraction -> rows tree -> block tree -> IVC per block, with
    proofs over the update-tree workplans (map-reduce DAG)."""

    def __init__(self, cfg: MappingTableConfig, backend=None,
                 proof_store=None):
        from mp2_tpu.models.proof_store import MemoryProofStore, ProofDict

        self.cfg = cfg
        self.rows_db = new_row_tree()
        self.block_db = new_block_tree()
        self.framework = RecursiveCircuits(CIRCUITS, backend=backend)
        # ProofKV (proof_storage.rs role): typed stage keys into ONE
        # pluggable store — pass SqliteProofKV(path) for durable storage
        # `is not None`: an EMPTY SqliteProofKV is len()==0 hence falsy
        self.proof_store = (
            proof_store if proof_store is not None else MemoryProofStore()
        )
        self.proofs = ProofDict(self.proof_store)
        # latest proof per tree node (across blocks): lets a parent proved in
        # epoch N reference a child proof generated in an earlier epoch
        self.node_proofs = ProofDict(self.proof_store, "node")
        self.table_data = TableData(cfg.schema())
        self.ivc: Optional[IvcOutput] = None
        self.metadata_hash: Optional[Tuple[int, int, int, int]] = None

    # -- per block ----------------------------------------------------------
    def apply_block(self, blk: BlockFixture) -> FinalExtractionOutput:
        cfg = self.cfg
        # 1. extraction (map-reduce over the storage trie)
        entries = [
            SlotEntry(cfg.slot, SK.mapping_location(cfg.slot, k),
                      mapping_key=k, key_id=cfg.key_id)
            for k in sorted(blk.entries)
        ]
        values_out = extract_storage_slots(blk.storage, [cfg.column], entries)
        contract_out = extract_contract(blk.state, cfg.contract_address)
        block_out = extract_block(blk.header_rlp)
        final = final_extraction(
            block_out, contract_out, values_out,
            blk.storage.root_hash(), blk.state.root_hash(),
        )
        self.proofs[("final_extraction", blk.number)] = (
            self.framework.generate_proof(
                "final_extraction", [], final.values_digest.to_fields()
            )
        )

        # 2. rows tree update (scapegoat keyed by (key_as_int, 0))
        def tx(t):
            for k, v in blk.entries.items():
                key_int = int.from_bytes(k, "big")
                sec = Cell(cfg.key_id, key_int, False)
                cells = build_cells_tree([Cell(cfg.value_id, v, False)])
                t.store(
                    (key_int, 0),
                    RowPayload(
                        secondary=sec,
                        row_unique_data=V.row_unique_data_for_mapping_leaf(k),
                        cells=cells,
                    ),
                )
            # remove rows whose key disappeared
            for key in list(self.rows_db.payloads):
                if not any(
                    int.from_bytes(k, "big") == key[0] for k in blk.entries
                ):
                    t.remove(key)

        row_plan = self.rows_db.in_transaction(tx)
        self._prove_tree_plan(row_plan, self.rows_db, "rows", blk.number)

        root_payload = self.rows_db.payload(self.rows_db.root())
        rows_final_digest = D.compute_final_digest(
            False, root_payload.individual_vd, root_payload.multiplier_vd,
            root_payload.multiplier_cnt,
        )
        # === cross-layer invariant (block_tree leaf circuit) ===
        assert rows_final_digest == final.values_digest, (
            "extraction values digest != rows tree digest"
        )

        # 3. block tree append
        node_payload = BlockPayload(
            index_id=cfg.block_id,
            block_number=blk.number,
            rows_hash=root_payload.hash,
            rows_digest=rows_final_digest,
        )
        block_plan = self.block_db.in_transaction(
            lambda t: t.store(blk.number, node_payload)
        )
        self._prove_tree_plan(block_plan, self.block_db, "block", blk.number)

        # 4. IVC step
        md = D.block_metadata_hash(final.metadata_digest, cfg.block_id)
        if self.metadata_hash is None:
            self.metadata_hash = md
            circuit = "ivc_first"
        else:
            assert md == self.metadata_hash, "metadata hash changed"
            circuit = "ivc_subsequent"
        root_hash = self.block_db.payload(self.block_db.root()).hash
        prev = [self.proofs[("ivc", self.ivc.latest_block)]] if self.ivc else []
        pis = list(root_hash) + list(md) + [blk.number]
        self.proofs[("ivc", blk.number)] = self.framework.generate_proof(
            circuit, prev + [self.proofs[("final_extraction", blk.number)]], pis
        )
        self.ivc = IvcOutput(
            first_block=self.ivc.first_block if self.ivc else blk.number,
            latest_block=blk.number,
            latest_block_hash=final.block_hash,
            block_tree_root=root_hash,
            metadata_hash=md,
        )

        # 5. materialized query view
        for k, v in blk.entries.items():
            self.table_data.add_row(
                blk.number, [blk.number, int.from_bytes(k, "big"), v]
            )
        return final

    def _prove_tree_plan(self, plan: UpdateTree, db, prefix: str, block: int):
        """Walk the workplan (children before parents), emitting one proof
        per dirtied node — the reduce phase of the map-reduce.

        PI layout matches the TP2 tree_node circuit:
          h(4) || id || value(8) || min(8) || max(8) || lh(4) || rh(4) || inner(4)
        """
        from mp2_tpu.utils.u256 import u256_to_fields

        wp = plan.into_workplan()
        for key in wp:
            l, r = db.tree.children(key)
            kind = "leaf" if (l is None and r is None) else (
                "full" if (l is not None and r is not None) else "partial"
            )
            name = {
                ("rows", "leaf"): "rows_leaf",
                ("rows", "full"): "rows_full",
                ("rows", "partial"): "rows_partial",
                ("block", "leaf"): "block_leaf",
                ("block", "full"): "block_parent",
                ("block", "partial"): "block_parent",
            }[(prefix, kind)]
            children = [
                self.node_proofs[(prefix, c)] for c in (l, r) if c is not None
            ]
            payload = db.payload(key)
            lh = list(db.payload(l).hash) if l is not None else list(D.EMPTY_HASH)
            rh = list(db.payload(r).hash) if r is not None else list(D.EMPTY_HASH)
            if prefix == "rows":
                ident = payload.secondary.identifier
                value = u256_to_fields(payload.secondary.value)
                inner = list(payload.cells.root_hash)
            else:
                ident = payload.index_id
                value = u256_to_fields(payload.block_number)
                inner = list(payload.rows_hash)
            pis = (
                list(payload.hash)
                + [ident]
                + value
                + u256_to_fields(payload.min_value)
                + u256_to_fields(payload.max_value)
                + lh
                + rh
                + inner
            )
            pf = self.framework.generate_proof(name, children, pis)
            self.proofs[(prefix, block, key)] = pf
            self.node_proofs[(prefix, key)] = pf

    # -- query --------------------------------------------------------------
    def run_query(self, sql: str, ph: Placeholders) -> Tuple[QueryResult, ProofWithVK]:
        pis = parse_and_assemble(sql, self.cfg.schema())
        res = execute_query(pis, self.table_data, ph)
        # chunk proofs -> aggregation -> revelation (dummy envelopes bound to
        # the real computed commitments)
        chunk_proofs = [
            self.framework.generate_proof(
                "row_chunk", [], [len(c)] + list(res.computational_hash)
            )
            for c in res.chunks
        ]
        if not chunk_proofs:
            chunk_proofs = [
                self.framework.generate_proof(
                    "non_existence", [], list(res.computational_hash)
                )
            ]
        while len(chunk_proofs) > 1:
            groups = [chunk_proofs[i : i + 5] for i in range(0, len(chunk_proofs), 5)]
            chunk_proofs = [
                self.framework.generate_proof(
                    "chunk_aggregation", g, list(res.computational_hash)
                )
                for g in groups
            ]
        assert self.ivc is not None, "no epochs indexed"
        reveal_pis = (
            list(res.computational_hash)
            + list(res.placeholder_hash)
            + list(self.ivc.block_tree_root)
            + [v for row in res.rows for v in row]
        )
        reveal = self.framework.generate_proof(
            "revelation",
            [chunk_proofs[0], self.proofs[("ivc", self.ivc.latest_block)]],
            reveal_pis,
        )
        return res, reveal
