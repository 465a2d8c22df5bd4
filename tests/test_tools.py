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


def test_inspect_repl_over_pgsql_store():
    """REPL parity (inspect/src/repl.rs): navigate nodes + travel epochs
    with views reconstructed purely from the SQL store."""
    import io

    from mp2_tpu.ryhope.pgsql import MockPg, attach_pgsql
    from mp2_tpu.tools.inspect import Repl
    from mp2_tpu.vdb.trees import Cell, RowPayload, build_cells_tree, new_row_tree

    db = new_row_tree()
    store = attach_pgsql(db, MockPg(), "rows_tree")

    def payload(i):
        return RowPayload(
            secondary=Cell(5, 10 * i, False),
            row_unique_data=(i, i, i, i),
            cells=build_cells_tree([Cell(7, 100 + i, False)]),
        )

    db.in_transaction(lambda t: [t.store((10, 0), payload(1)),
                                 t.store((20, 0), payload(2))])
    db.in_transaction(lambda t: t.store((30, 0), payload(3)))

    r = Repl(store)  # pgsql-store backend, purely SQL-reconstructed views
    assert r.epoch == db.epoch == 1
    eps = r.execute("epochs")
    assert "epoch 0" in eps and "epoch 1" in eps
    # navigate
    assert "->" in r.execute("root")
    tree = r.execute("tree")
    assert "(20, 0)" in tree and "epoch=1" in tree
    out = r.execute("goto (30, 0)")
    assert "(30, 0)" in out
    node = r.execute("node")
    assert "payload:" in node and "parent:" in node
    lin = r.execute("lineage")
    assert lin.endswith(str(r.view.root()))
    # travel to epoch 0: (30, 0) does not exist there
    assert "at epoch 0" in r.execute("at 0")
    assert "no node" in r.execute("goto (30, 0)")
    assert "2 rows" in r.execute("table")
    # parent/left/right navigation from root
    r.execute("root")
    l = r.execute("left")
    if "no left" not in l:
        assert "->" in r.execute("parent")
    # unknown command is reported, quit raises EOFError via run loop
    assert "unknown command" in r.execute("bogus")
    inp = io.StringIO("node\nquit\n")
    outp = io.StringIO()
    r.run(stdin=inp, stdout=outp)
    assert "payload:" in outp.getvalue()


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
