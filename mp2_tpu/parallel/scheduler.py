"""Map-reduce proof scheduler: UpdateTree workplans -> batched device dispatch.

The distributed-backend equivalent of the reference (SURVEY.md §2.9): the
UpdateTree is the dependency DAG; this scheduler drains it level-by-level,
groups ready items by circuit shape, and hands each group to a batch prover
in ONE device call (the map phase batches leaf witnesses; the reduce phase
batches same-arity aggregations).  Across hosts, each batch is sharded over
the dp mesh axis (mp2_tpu.parallel.mesh); across chips within a batch, the
prover's own kernels shard over mp.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Hashable, List, Sequence, Tuple

from mp2_tpu.ryhope.updatetree import UpdatePlan, UpdateTree

# items: list of (key, circuit_name, inputs); returns proofs aligned to items
BatchProveFn = Callable[[str, List[Tuple[Hashable, object]]], List[object]]


@dataclass
class ScheduleStats:
    levels: int = 0
    batches: int = 0
    items: int = 0
    max_batch: int = 0
    per_level_sizes: List[int] = field(default_factory=list)


class MapReduceScheduler:
    """Drains a workplan: at each step, all ready items are grouped by
    circuit shape and proved in one batched call per group."""

    def __init__(self, prove_batch: BatchProveFn):
        self.prove_batch = prove_batch

    def run(
        self,
        plan: UpdatePlan,
        classify: Callable[[Hashable], Tuple[str, object]],
    ) -> Tuple[Dict[Hashable, object], ScheduleStats]:
        """classify(key) -> (circuit_name, inputs)."""
        proofs: Dict[Hashable, object] = {}
        stats = ScheduleStats()
        while not plan.completed():
            batch = plan.next_ready()
            assert batch, "workplan deadlock"
            stats.levels += 1
            stats.per_level_sizes.append(len(batch))
            groups: Dict[str, List[Tuple[Hashable, object]]] = {}
            for key in batch:
                name, inputs = classify(key)
                groups.setdefault(name, []).append((key, inputs))
            for name, items in sorted(groups.items()):
                outs = self.prove_batch(name, items)
                assert len(outs) == len(items)
                stats.batches += 1
                stats.items += len(items)
                stats.max_batch = max(stats.max_batch, len(items))
                for (key, _), proof in zip(items, outs):
                    proofs[key] = proof
            for key in batch:
                plan.done(key)
        return proofs, stats


class BatchedPoseidonProver:
    """Device-batched attestation prover: hashes a whole batch of equal-width
    PI vectors in one JAX dispatch.  The template for batched real proving:
    the TP2 prover's device stages are batch-polymorphic (leading axis), so
    same-circuit witnesses batch the same way (vmapped prove is the planned
    next step once the transcript is traced end-to-end)."""

    def __init__(self):
        import jax

        from mp2_tpu.field import goldilocks as gl
        from mp2_tpu.hash import poseidon2 as p2

        self._gl = gl
        self._p2 = p2
        self.dispatches = 0

    def __call__(self, name: str, items: List[Tuple[Hashable, Sequence[int]]]):
        import numpy as np

        gl, p2 = self._gl, self._p2
        width = len(items[0][1])
        assert all(len(i[1]) == width for i in items), "PI widths must match"
        tag = [ord(c) for c in name]
        mat = np.array(
            [tag + [int(x) for x in pis] for _, pis in items], dtype=object
        )
        hashes = gl.to_u64(p2.hash_no_pad(gl.from_u64(mat)))
        self.dispatches += 1
        return [tuple(int(x) for x in row) for row in hashes]
