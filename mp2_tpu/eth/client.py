"""ProofQuery / BlockUtil client over a pluggable JSON-RPC transport.

Reference: mp2-common/src/eth.rs — `ProofQuery` (:153-343),
`verify_storage_proof` (:345-366), `verify_state_proof` (:370-400),
`BlockUtil` (the header-RLP accessor the block-extraction circuit consumes)
and the retrying fetch helpers (:120-151).

Transport seam: anything with `request(method, params) -> value`.  The
recorded-fixture transport replays canonical JSON responses (and can
RECORD them from the in-repo MPT fixtures via `record_fixtures`), so the
whole extraction pipeline runs from EIP-1186-shaped responses exactly as
production would consume them from a node; `HttpTransport` is the live
shape (urllib JSON-RPC POST) a deployment points at an RPC endpoint.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Protocol, Sequence

from mp2_tpu.extraction import storage_key as SK
from mp2_tpu.utils import rlp
from mp2_tpu.utils.keccak import keccak256
from mp2_tpu.utils.trie import MPT, to_nibbles, verify_proof


def _hex(b: bytes) -> str:
    return "0x" + b.hex()


def _unhex(s: str) -> bytes:
    s = s[2:] if s.startswith("0x") else s
    if len(s) % 2:
        s = "0" + s
    return bytes.fromhex(s)


def _hex_int(v: int) -> str:
    return hex(int(v))


# ---------------------------------------------------------------------------
# storage slots (eth.rs StorageSlot / StorageSlotNode)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StorageSlot:
    """A (possibly nested) storage location: eth.rs:202-301.

    kind: "simple" | "mapping" | "mapping_of_mappings" | any of those with
    a struct `evm_word` offset.
    """

    slot: int
    mapping_keys_: tuple = ()
    evm_word: int = 0

    @staticmethod
    def simple(slot: int, evm_word: int = 0) -> "StorageSlot":
        return StorageSlot(slot, (), evm_word)

    @staticmethod
    def mapping(slot: int, key: bytes, evm_word: int = 0) -> "StorageSlot":
        return StorageSlot(slot, (bytes(key),), evm_word)

    @staticmethod
    def mapping_of_mappings(
        slot: int, outer: bytes, inner: bytes, evm_word: int = 0
    ) -> "StorageSlot":
        return StorageSlot(slot, (bytes(outer), bytes(inner)), evm_word)

    def is_simple_slot(self) -> bool:
        return not self.mapping_keys_ and self.evm_word == 0

    def mapping_keys(self) -> List[bytes]:
        return list(self.mapping_keys_)

    def location(self) -> bytes:
        """The 32-byte storage location (eth.rs StorageSlot::location)."""
        if not self.mapping_keys_:
            return SK.simple_slot_location(self.slot, self.evm_word)
        if len(self.mapping_keys_) == 1:
            return SK.mapping_location(
                self.slot, self.mapping_keys_[0], self.evm_word
            )
        return SK.mapping_of_mappings_location(
            self.slot, self.mapping_keys_[0], self.mapping_keys_[1],
            self.evm_word,
        )

    def mpt_key(self) -> bytes:
        """keccak(location) — the secure-trie key (eth.rs:270-272)."""
        return keccak256(self.location())

    def mpt_nibbles(self) -> List[int]:
        return to_nibbles(self.mpt_key())


# ---------------------------------------------------------------------------
# responses (alloy EIP1186AccountProofResponse / Block shapes)
# ---------------------------------------------------------------------------


@dataclass
class StorageProofEntry:
    key: bytes  # the queried location (pre-hash)
    value: int
    proof: List[bytes]

    def to_json(self) -> dict:
        return {"key": _hex(self.key), "value": _hex_int(self.value),
                "proof": [_hex(p) for p in self.proof]}

    @staticmethod
    def from_json(d: dict) -> "StorageProofEntry":
        return StorageProofEntry(
            key=_unhex(d["key"]), value=int(d["value"], 16),
            proof=[_unhex(p) for p in d["proof"]],
        )


@dataclass
class EIP1186Response:
    address: bytes
    account_proof: List[bytes]
    storage_hash: bytes
    storage_proof: List[StorageProofEntry]

    def to_json(self) -> dict:
        return {
            "address": _hex(self.address),
            "accountProof": [_hex(p) for p in self.account_proof],
            "storageHash": _hex(self.storage_hash),
            "storageProof": [e.to_json() for e in self.storage_proof],
        }

    @staticmethod
    def from_json(d: dict) -> "EIP1186Response":
        return EIP1186Response(
            address=_unhex(d["address"]),
            account_proof=[_unhex(p) for p in d["accountProof"]],
            storage_hash=_unhex(d["storageHash"]),
            storage_proof=[
                StorageProofEntry.from_json(e) for e in d["storageProof"]
            ],
        )


@dataclass
class EthBlock:
    """BlockUtil role: the fields extraction needs + the exact header RLP
    whose keccak is the block hash (eth.rs BlockUtil::rlp)."""

    number: int
    header_rlp: bytes

    def rlp(self) -> bytes:
        return self.header_rlp

    def hash(self) -> bytes:
        return keccak256(self.header_rlp)

    @property
    def parent_hash(self) -> bytes:
        return bytes(rlp.decode(self.header_rlp)[0])

    @property
    def state_root(self) -> bytes:
        return bytes(rlp.decode(self.header_rlp)[3])

    def to_json(self) -> dict:
        return {"number": _hex_int(self.number),
                "headerRlp": _hex(self.header_rlp)}

    @staticmethod
    def from_json(d: dict) -> "EthBlock":
        return EthBlock(number=int(d["number"], 16),
                        header_rlp=_unhex(d["headerRlp"]))


# ---------------------------------------------------------------------------
# transports
# ---------------------------------------------------------------------------


class Transport(Protocol):
    def request(self, method: str, params: Sequence) -> dict: ...


def _fixture_key(method: str, params: Sequence) -> str:
    return json.dumps([method, list(params)], separators=(",", ":"))


class FixtureTransport:
    """Replays recorded JSON-RPC responses (and records new ones).

    `responses` maps canonical `[method, params]` JSON to response dicts —
    loadable from a JSON file so extraction e2e consumes exactly what a
    node once answered."""

    def __init__(self, responses: Optional[Dict[str, dict]] = None):
        self.responses = dict(responses or {})
        self.requests: List[str] = []

    def request(self, method: str, params: Sequence) -> dict:
        k = _fixture_key(method, params)
        self.requests.append(k)
        if k not in self.responses:
            raise KeyError(f"no recorded response for {k}")
        return self.responses[k]

    def record(self, method: str, params: Sequence, response: dict):
        self.responses[_fixture_key(method, params)] = response

    def dump(self) -> str:
        return json.dumps(self.responses, indent=1, sort_keys=True)

    @staticmethod
    def load(text: str) -> "FixtureTransport":
        return FixtureTransport(json.loads(text))


class HttpTransport:
    """Live JSON-RPC over HTTP (urllib) — the production transport shape.
    Unreachable in the zero-egress build env; constructing it is free,
    requests raise whatever the socket layer raises."""

    def __init__(self, url: str, timeout: float = 30.0, retries: int = 3):
        self.url = url
        self.timeout = timeout
        self.retries = retries
        self._id = 0

    def request(self, method: str, params: Sequence) -> dict:
        import urllib.request

        self._id += 1
        body = json.dumps({
            "jsonrpc": "2.0", "id": self._id, "method": method,
            "params": list(params),
        }).encode()
        last: Optional[Exception] = None
        for _ in range(self.retries):  # eth.rs retrying fetch (:120-151)
            try:
                req = urllib.request.Request(
                    self.url, data=body,
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    out = json.loads(r.read())
                if "error" in out:
                    raise RuntimeError(f"rpc error: {out['error']}")
                return out["result"]
            except Exception as e:  # noqa: BLE001 — retry then surface
                last = e
        raise RuntimeError(f"rpc failed after {self.retries} tries: {last!r}")


# ---------------------------------------------------------------------------
# ProofQuery + client
# ---------------------------------------------------------------------------


@dataclass
class ProofQuery:
    """A contract + slot to fetch/verify an EIP-1186 proof for
    (eth.rs:153-343)."""

    contract: bytes
    slot: StorageSlot

    @staticmethod
    def new_simple_slot(address: bytes, slot: int) -> "ProofQuery":
        return ProofQuery(bytes(address), StorageSlot.simple(slot))

    @staticmethod
    def new_mapping_slot(address: bytes, slot: int,
                         mapping_key: bytes) -> "ProofQuery":
        return ProofQuery(bytes(address), StorageSlot.mapping(slot, mapping_key))

    @staticmethod
    def new_mapping_of_mappings_slot(address: bytes, slot: int, outer: bytes,
                                     inner: bytes) -> "ProofQuery":
        return ProofQuery(
            bytes(address), StorageSlot.mapping_of_mappings(slot, outer, inner)
        )

    # -- verification (eth.rs:345-400) ----------------------------------
    @staticmethod
    def verify_storage_proof(resp: EIP1186Response) -> bytes:
        """Check storage_proof[0] against storage_hash; returns the RAW
        RLP-encoded value (not the JSON-interpreted one)."""
        entry = resp.storage_proof[0]
        got = verify_proof(resp.storage_hash, entry.key, entry.proof,
                           secure=True)
        if got is None:
            raise ValueError(
                "proof says the value associated with that key does not exist"
            )
        return got

    def verify_state_proof(self, resp: EIP1186Response) -> None:
        """Check the account proof against its own first-node root and that
        the account leaf has the 4-field account shape."""
        state_root = keccak256(resp.account_proof[0])
        got = verify_proof(state_root, self.contract, resp.account_proof,
                           secure=True)
        if got is None:
            raise ValueError("account proof says the account does not exist")
        account = rlp.decode(got)
        if len(account) != 4:
            raise ValueError("account node must have 4 fields")
        if bytes(account[2]) != resp.storage_hash:
            raise ValueError("account storage_hash mismatch")


class EthClient:
    """get_block / get_proof over a transport (the ProviderBuilder role)."""

    def __init__(self, transport: Transport):
        self.transport = transport

    def get_block(self, number: int) -> EthBlock:
        d = self.transport.request("eth_getBlockByNumber",
                                   [_hex_int(number), False])
        return EthBlock.from_json(d)

    def get_proof(self, query: ProofQuery, block_number: int) -> EIP1186Response:
        d = self.transport.request(
            "eth_getProof",
            [_hex(query.contract), [_hex(query.slot.location())],
             _hex_int(block_number)],
        )
        return EIP1186Response.from_json(d)


class ProofTrieView:
    """Duck-types the fixture-MPT `get_proof` / `root_hash` surface from
    EIP-1186 responses, so the extraction pipelines consume client data
    through the exact call sites fixture tries use."""

    def __init__(self, root_hash: bytes):
        self._root = bytes(root_hash)
        self._proofs: Dict[bytes, List[bytes]] = {}

    def add(self, key: bytes, proof: List[bytes]) -> None:
        if proof and keccak256(proof[0]) != self._root:
            raise ValueError("proof does not start at the committed root")
        self._proofs[bytes(key)] = [bytes(p) for p in proof]

    def get_proof(self, key: bytes) -> List[bytes]:
        return self._proofs[bytes(key)]

    def root_hash(self) -> bytes:
        return self._root


def block_view_from_client(client: "EthClient", contract: bytes, slot: int,
                           number: int, mapping_keys: Sequence[bytes]):
    """Fetch one block's extraction inputs THROUGH the client API and shape
    them like a BlockFixture (header RLP + state/storage proof views +
    entries) — the production ingestion path of mp2-v1's TestContext, from
    EIP-1186 responses instead of a local trie."""
    from mp2_tpu.models.pipeline import BlockFixture

    block = client.get_block(number)
    state_view: Optional[ProofTrieView] = None
    storage_view: Optional[ProofTrieView] = None
    entries: Dict[bytes, int] = {}
    for k in mapping_keys:
        q = ProofQuery.new_mapping_slot(contract, slot, k)
        resp = client.get_proof(q, number)
        q.verify_state_proof(resp)
        raw = ProofQuery.verify_storage_proof(resp)
        entries[bytes(k)] = int.from_bytes(bytes(rlp.decode(raw)), "big")
        if state_view is None:
            state_view = ProofTrieView(keccak256(resp.account_proof[0]))
            state_view.add(contract, resp.account_proof)
            storage_view = ProofTrieView(resp.storage_hash)
        storage_view.add(resp.storage_proof[0].key,
                         resp.storage_proof[0].proof)
    return BlockFixture(
        number=number, header_rlp=block.rlp(), state=state_view,
        storage=storage_view, entries=entries,
    )


# ---------------------------------------------------------------------------
# fixture recording (the anvil-TestContext stand-in for zero egress)
# ---------------------------------------------------------------------------


def record_fixtures(transport: FixtureTransport, number: int,
                    header_rlp: bytes, state: MPT, storage: MPT,
                    contract: bytes,
                    locations: Sequence[bytes]) -> None:
    """Record eth_getBlockByNumber + eth_getProof responses for one block
    from in-repo MPT fixtures, in the exact JSON shapes a node returns —
    extraction then consumes them through EthClient like production."""
    transport.record(
        "eth_getBlockByNumber", [_hex_int(number), False],
        EthBlock(number, header_rlp).to_json(),
    )
    account_proof = state.get_proof(contract)
    storage_hash = storage.root_hash()
    for loc in locations:
        raw = storage.get(loc)
        value = (
            int.from_bytes(bytes(rlp.decode(raw)), "big") if raw else 0
        )
        resp = EIP1186Response(
            address=bytes(contract),
            account_proof=account_proof,
            storage_hash=storage_hash,
            storage_proof=[StorageProofEntry(
                key=bytes(loc), value=value,
                proof=storage.get_proof(loc),
            )],
        )
        transport.record(
            "eth_getProof",
            [_hex(contract), [_hex(loc)], _hex_int(number)],
            resp.to_json(),
        )
