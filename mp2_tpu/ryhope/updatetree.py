"""UpdateTree: the proving workplan — the reference's entire distributed-
scheduling abstraction (ryhope/src/storage/updatetree.rs:19-162; SURVEY.md
§2.9).

An UpdateTree is the union of the ascendance paths of all dirtied keys after
a transaction.  `into_workplan()` yields keys only when all their (in-plan)
children are done — siblings run in parallel, parents are blocked on
children.  The TPU map-reduce scheduler (mp2_tpu.parallel) consumes ready
batches level by level and dispatches them to device proof kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Generic, Hashable, List, Optional, Sequence, Set, TypeVar

K = TypeVar("K", bound=Hashable)


@dataclass
class UpdateTree(Generic[K]):
    """Arena tree over the dirtied keys."""

    root: Optional[K]
    children_map: Dict[K, List[K]]  # key -> dirtied children (possibly empty)
    parent_map: Dict[K, Optional[K]]

    @staticmethod
    def from_paths(paths: Sequence[Sequence[K]]) -> "UpdateTree[K]":
        """Build from ascendance paths (each leaf-to-root, root last)."""
        parent_map: Dict[K, Optional[K]] = {}
        root: Optional[K] = None
        for path in paths:
            if not path:
                continue
            if root is None:
                root = path[-1]
            else:
                assert path[-1] == root, "paths must share the root"
            for i, k in enumerate(path):
                parent_map[k] = path[i + 1] if i + 1 < len(path) else None
        children_map: Dict[K, List[K]] = {k: [] for k in parent_map}
        for k, p in parent_map.items():
            if p is not None:
                children_map[p].append(k)
        for v in children_map.values():
            v.sort(key=repr)
        return UpdateTree(root=root, children_map=children_map, parent_map=parent_map)

    def keys(self) -> Set[K]:
        return set(self.parent_map.keys())

    def __len__(self):
        return len(self.parent_map)

    def into_workplan(self) -> "UpdatePlan[K]":
        return UpdatePlan(self)


class UpdatePlan(Generic[K]):
    """Dependency-ordered iterator: `next_ready()` returns a batch of keys
    whose children are all done; `done(key)` releases parents.

    Equivalent to the reference's UpdatePlan with Next::{Ready, NotYet}
    (updatetree.rs:154-162), exposed batch-style for device dispatch.
    """

    def __init__(self, tree: UpdateTree[K]):
        self.tree = tree
        self._pending: Dict[K, int] = {
            k: len(cs) for k, cs in tree.children_map.items()
        }
        self._done: Set[K] = set()
        self._issued: Set[K] = set()

    def next_ready(self) -> List[K]:
        out = [
            k
            for k, cnt in self._pending.items()
            if cnt == 0 and k not in self._issued and k not in self._done
        ]
        out.sort(key=repr)
        self._issued.update(out)
        return out

    def done(self, key: K):
        assert key in self._issued and key not in self._done
        self._done.add(key)
        p = self.tree.parent_map.get(key)
        if p is not None:
            self._pending[p] -= 1

    def completed(self) -> bool:
        return len(self._done) == len(self.tree.parent_map)

    def __iter__(self):
        """Sequential iteration in a valid order (children before parents)."""
        while not self.completed():
            batch = self.next_ready()
            assert batch, "workplan deadlock"
            for k in batch:
                yield k
                self.done(k)
