"""Ethereum client layer: ProofQuery / BlockUtil-shaped API over a
pluggable transport (reference: mp2-common/src/eth.rs:153-370).

The zero-egress build environment cannot reach a live node, so the shipped
transports are `FixtureTransport` (recorded EIP-1186 / block JSON, the
production replay path) and `HttpTransport` (urllib JSON-RPC, the shape a
deployment points at a node; untestable here by construction).
"""

from mp2_tpu.eth.client import (
    EIP1186Response,
    EthBlock,
    EthClient,
    FixtureTransport,
    HttpTransport,
    ProofQuery,
    StorageSlot,
    record_fixtures,
)

__all__ = [
    "EIP1186Response",
    "EthBlock",
    "EthClient",
    "FixtureTransport",
    "HttpTransport",
    "ProofQuery",
    "StorageSlot",
    "record_fixtures",
]
