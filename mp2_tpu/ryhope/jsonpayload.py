"""JSON serialization for ryhope keys/payloads stored in pgsql.

Role of the reference's JSONB payload column (ryhope/src/storage/pgsql/
storages.rs:67): payloads are stored as JSON so the parsil executor's
companion SQL can evaluate `payload -> 'cells' -> '<id>' ->> 'value'`
accessors (parsil/src/executor.rs:411-430) DIRECTLY against the storage
layer — the proving pipeline and the SQL cross-check read the same rows.

Encoding is a tagged, self-describing JSON dialect:
  * tuples            -> {"__t": [..]}
  * dicts w/ non-str keys -> {"__d": [[k, v], ..]}
  * registered classes -> {"__c": "Name", "f": {field: value, ..}}
  * RowPayload additionally carries a DERIVED "cells" view
    {str(identifier): {"value": str(value)}} covering the secondary cell
    and every cells-tree cell — the accessor target of the executor SQL.
    The view is ignored on decode (recomputed from the real fields).

Big ints are emitted as JSON numbers (Postgres JSONB numerics are
arbitrary-precision); the "cells" view stores values as STRINGS and the
SQL casts them back (the reference's `->> 'value')::UINT256` shape).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

from mp2_tpu.field.ecgfp5 import Point
from mp2_tpu.ryhope.sbbst import Sbbst
from mp2_tpu.vdb.trees import (
    BlockPayload,
    Cell,
    CellsNode,
    CellsTreeResult,
    RowPayload,
    SplitDigest,
)

_CLASSES = {
    c.__name__: c
    for c in (
        Cell, CellsNode, CellsTreeResult, RowPayload, BlockPayload,
        SplitDigest,
    )
}


def _enc(obj: Any) -> Any:
    if obj is None or isinstance(obj, (bool, int, str, float)):
        return obj
    if isinstance(obj, tuple):
        return {"__t": [_enc(v) for v in obj]}
    if isinstance(obj, list):
        return [_enc(v) for v in obj]
    if isinstance(obj, dict):
        if all(isinstance(k, str) for k in obj):
            return {k: _enc(v) for k, v in obj.items()}
        return {"__d": [[_enc(k), _enc(v)] for k, v in obj.items()]}
    if isinstance(obj, Point):
        return {
            "__c": "Point",
            "f": {
                "x": _enc(tuple(obj.x)),
                "y": _enc(tuple(obj.y)),
                "is_neutral": obj.is_neutral,
            },
        }
    if isinstance(obj, Sbbst):
        return {"__c": "Sbbst", "f": {"shift": obj.shift, "n": obj.n}}
    if dataclasses.is_dataclass(obj) and type(obj).__name__ in _CLASSES:
        out: Dict[str, Any] = {
            "__c": type(obj).__name__,
            "f": {
                fl.name: _enc(getattr(obj, fl.name))
                for fl in dataclasses.fields(obj)
            },
        }
        if isinstance(obj, RowPayload):
            cells = {
                str(obj.secondary.identifier): {
                    "value": str(obj.secondary.value)
                }
            }
            for node in obj.cells.nodes.values():
                cells[str(node.cell.identifier)] = {
                    "value": str(node.cell.value)
                }
            out["cells"] = cells
        return out
    raise TypeError(f"cannot JSON-encode {type(obj).__name__}")


def _dec(obj: Any) -> Any:
    if isinstance(obj, list):
        return [_dec(v) for v in obj]
    if isinstance(obj, dict):
        if "__t" in obj and len(obj) == 1:
            return tuple(_dec(v) for v in obj["__t"])
        if "__d" in obj and len(obj) == 1:
            return {_dec(k): _dec(v) for k, v in obj["__d"]}
        if "__c" in obj:
            name = obj["__c"]
            fields = {k: _dec(v) for k, v in obj["f"].items()}
            if name == "Point":
                return Point(
                    fields["x"], fields["y"], fields["is_neutral"]
                )
            if name == "Sbbst":
                return Sbbst(shift=fields["shift"], n=fields["n"])
            return _CLASSES[name](**fields)
        return {k: _dec(v) for k, v in obj.items()}
    return obj


def to_json(obj: Any) -> str:
    return json.dumps(_enc(obj), separators=(",", ":"))


def from_json(text: str) -> Any:
    return _dec(json.loads(text))
