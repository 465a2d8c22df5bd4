"""Per-stage proof timing CSV (reference: mp2-v1/tests/common/benchmarker.rs
writes `name,time` rows around every proof call)."""

from __future__ import annotations

import csv
import time
from contextlib import contextmanager
from typing import Dict, List, Optional, Tuple


class Benchmarker:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.rows: List[Tuple[str, float]] = []

    @contextmanager
    def bench(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            self.rows.append((name, dt))
            if self.path:
                self.flush()

    def flush(self):
        with open(self.path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "time_ms"])
            w.writerows((n, f"{t:.3f}") for n, t in self.rows)

    def summary(self) -> Dict[str, Tuple[int, float, float]]:
        """name -> (count, total_ms, mean_ms)"""
        out: Dict[str, List[float]] = {}
        for n, t in self.rows:
            out.setdefault(n, []).append(t)
        return {
            n: (len(ts), sum(ts), sum(ts) / len(ts)) for n, ts in out.items()
        }
