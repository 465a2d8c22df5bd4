"""Table schemas for the SQL front-end (role of parsil/src/symbols.rs:
ZkTable/ZkColumn + ContextProvider)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass(frozen=True)
class ZkColumn:
    name: str
    identifier: int  # the digest column identifier
    kind: str = "standard"  # "primary_index" | "secondary_index" | "standard"


@dataclass
class ZkTable:
    name: str
    columns: List[ZkColumn]

    def column_index(self, name: str) -> int:
        for i, c in enumerate(self.columns):
            if c.name == name:
                return i
        raise KeyError(f"unknown column {name!r} in table {self.name!r}")

    def column(self, name: str) -> ZkColumn:
        return self.columns[self.column_index(name)]

    @property
    def primary_index(self) -> ZkColumn:
        return next(c for c in self.columns if c.kind == "primary_index")

    @property
    def secondary_index(self) -> Optional[ZkColumn]:
        return next((c for c in self.columns if c.kind == "secondary_index"), None)

    def column_ids(self) -> List[int]:
        return [c.identifier for c in self.columns]


class ContextProvider:
    """Schema lookup (FileContextProvider equivalent for tests)."""

    def __init__(self, tables: Dict[str, ZkTable]):
        self.tables = tables

    def table(self, name: str) -> ZkTable:
        if name not in self.tables:
            raise KeyError(f"unknown table {name!r}")
        return self.tables[name]
