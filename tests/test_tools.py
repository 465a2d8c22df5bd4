"""Benchmarker CSV + inspect tree rendering."""

import os
import tempfile

from mp2_tpu.models.pipeline import MappingTableConfig, TableIndexer, make_chain
from mp2_tpu.tools.inspect import describe_epochs, render_tree
from mp2_tpu.utils.benchmarker import Benchmarker


def test_benchmarker_csv():
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.csv")
        b = Benchmarker(path)
        with b.bench("leaf_proof"):
            sum(range(1000))
        with b.bench("leaf_proof"):
            sum(range(1000))
        with b.bench("aggregation"):
            pass
        s = b.summary()
        assert s["leaf_proof"][0] == 2
        rows = open(path).read().strip().splitlines()
        assert rows[0] == "name,time_ms"
        assert len(rows) == 4


def test_inspect_render():
    cfg = MappingTableConfig(bytes(range(20)), 1, slot=3)
    chain = make_chain(cfg, [{b"\x01": 10, b"\x02": 20}, {b"\x01": 30, b"\x02": 20}])
    idx = TableIndexer(cfg)
    for blk in chain:
        idx.apply_block(blk)
    out = render_tree(idx.block_db)
    assert "* 100" in out or "* 101" in out
    assert "epoch=1" in out
    out0 = render_tree(idx.block_db, epoch=0)
    assert "size=1" in out0
    eps = describe_epochs(idx.rows_db)
    assert "epoch 0" in eps and "epoch 1" in eps


def test_parsil_cli(capsys):
    """The parsil debug CLI (parsil/src/main.rs role): plan + hash + SQL."""
    from mp2_tpu.parsil.__main__ import main

    rc = main([
        "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK "
        "AND block <= $MAX_BLOCK AND value >= 10"
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "aggregation" in out
    assert "computational hash" in out
    assert "SELECT SUM(" in out

    rc = main(["SELECT value FROM t WHERE block = 5 LIMIT 3"])
    out = capsys.readouterr().out
    assert rc == 0 and "tabular" in out and "LIMIT 3" in out

    assert main(["SELECT nosuch FROM t"]) == 1


def test_trace_spans(monkeypatch, tmp_path, capsys):
    """Span tracer: nested timing to stderr + JSON, aggregated report."""
    from mp2_tpu.utils import trace

    # disabled: pure no-op
    monkeypatch.delenv("MP2_TRACE", raising=False)
    monkeypatch.delenv("MP2_TRACE_JSON", raising=False)
    trace.reset()
    with trace.span("off"):
        pass
    assert trace.report() == {}

    out = tmp_path / "spans.jsonl"
    monkeypatch.setenv("MP2_TRACE", "1")
    monkeypatch.setenv("MP2_TRACE_JSON", str(out))
    with trace.span("outer", circuit="rows_leaf"):
        with trace.span("inner"):
            pass
    rep = trace.report()
    assert rep["outer"][0] == 1 and rep["inner"][0] == 1
    import json as j

    recs = [j.loads(l) for l in out.read_text().splitlines()]
    assert {r["name"] for r in recs} == {"outer", "inner"}
    assert next(r for r in recs if r["name"] == "inner")["depth"] == 1
    err = capsys.readouterr().err
    assert "[trace] outer circuit=rows_leaf" in err
    trace.reset()
