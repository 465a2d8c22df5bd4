"""Top-level api umbrella (mp2-v1/src/api.rs role): PublicParameters +
serialized CircuitInput -> serialized proof envelope."""

import os

import pytest

from mp2_tpu.models.pipeline import MappingTableConfig, make_chain

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)

ADDR = bytes(range(60, 80))


def test_unknown_kind_rejected():
    from mp2_tpu.api import generate_proof

    with pytest.raises(ValueError):
        generate_proof(None, {"kind": "nope"})


@slow
def test_api_extraction_flow_over_serialized_envelopes():
    """block + contract + values_trie + final_simple through
    generate_proof with every boundary a serialized dict (the worker
    protocol); verify_envelope routes to the right family."""
    from mp2_tpu import api
    from mp2_tpu.extraction import storage_key as SK

    cfg = MappingTableConfig(contract_address=ADDR, chain_id=1, slot=4)
    [blk] = make_chain(cfg, [{b"\x11": 100, b"\x22": 200}])
    params = api.build_circuits_params(cfg, blk.header_rlp)

    block_d = api.generate_proof(
        params, {"kind": "block", "header": blk.header_rlp.hex()}
    )
    assert api.verify_envelope(params, block_d)

    contract_d = api.generate_proof(
        params,
        {
            "kind": "contract",
            "proof_nodes": [
                n.hex() for n in blk.state.get_proof(cfg.contract_address)
            ],
        },
    )
    assert api.verify_envelope(params, contract_d)

    keys = sorted(blk.entries)
    values_d = api.generate_proof(
        params,
        {
            "kind": "values_trie",
            "paths": [
                [n.hex() for n in
                 blk.storage.get_proof(SK.mapping_location(cfg.slot, k))]
                for k in keys
            ],
            "leaf_args": [k.hex() for k in keys],
        },
    )
    assert api.verify_envelope(params, values_d)

    final_d = api.generate_proof(
        params,
        {
            "kind": "final_simple",
            "block": block_d,
            "contract": contract_d,
            "values": values_d,
        },
    )
    assert api.verify_envelope(params, final_d)

    # a tampered envelope must not verify
    bad = dict(final_d)
    bad_proof = dict(bad["proof"])
    pis = list(bad_proof["public_inputs"])
    pis[0] = (pis[0] + 1) % ((1 << 64) - (1 << 32) + 1)
    bad_proof["public_inputs"] = pis
    bad["proof"] = bad_proof
    assert not api.verify_envelope(params, bad)
