"""Golden accepted/rejected query corpus for the SQL front-end, mirroring
/root/reference/parsil/src/tests.rs (must_accept, must_reject,
prim_index_bounds) and the typed-error surface of validate.rs + errors.rs.
"""

import json

import pytest

from mp2_tpu.parsil import errors as E
from mp2_tpu.parsil.symbols import (
    ContextProvider,
    FileContextProvider,
    ParsilSettings,
    PlaceholderSettings,
    ZkColumn,
    ZkTable,
)
from mp2_tpu.parsil.validate import parse_and_validate

TABLE2 = ZkTable(
    "table2",
    [
        ZkColumn("block", 100, "primary_index"),
        ZkColumn("foo", 101, "secondary_index"),
        ZkColumn("bar", 102),
    ],
)
T = ZkTable(
    "t",
    [
        ZkColumn("block", 1, "primary_index"),
        ZkColumn("x", 2, "secondary_index"),
        ZkColumn("a", 3),
        ZkColumn("b", 4),
        ZkColumn("c", 5),
    ],
)


def settings(**kw):
    bounds = dict(
        max_num_columns=10, max_num_predicate_ops=20, max_num_result_ops=20,
        max_num_items_per_output=10, max_num_outputs=5,
    )
    bounds.update(kw.pop("bounds", {}))
    return ParsilSettings(
        context=ContextProvider(
            {"table2": TABLE2, "t": T}, **bounds
        ),
        placeholders=PlaceholderSettings(num_freestanding=3),
        **kw,
    )


def check(sql, **kw):
    return parse_and_validate(sql, settings(**kw))


BOUNDED = "block >= $MIN_BLOCK AND block <= $MAX_BLOCK"


# ---------------------------------------------------------------- accepted


MUST_ACCEPT = [
    # tests.rs must_accept (adapted to the repo's schema names)
    "SELECT foo FROM table2 WHERE block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT foo FROM table2 WHERE bar < 3 AND block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT foo, * FROM table2 WHERE block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT AVG(foo) FROM table2 WHERE block BETWEEN $MIN_BLOCK and $MAX_BLOCK",
    "SELECT AVG(foo), MIN(bar) FROM table2 WHERE block = 3 AND block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT foo, bar FROM table2 WHERE block = 3 AND block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT foo FROM table2 WHERE block IN (1, 2, 4) AND block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT bar FROM table2 WHERE NOT block BETWEEN 12 AND 15 AND block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT a, c FROM t AS tt (d, e, a, b, c) WHERE d BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    # additional subset surface
    f"SELECT SUM(foo + bar) FROM table2 WHERE {BOUNDED}",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND bar IS TRUE",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND NOT bar IS FALSE",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND bar = '0x1122'",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND bar = '0b01001'",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND bar = '0o1234567'",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND bar = '1234567'",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND bar = $1",
    f"SELECT DISTINCT foo FROM table2 WHERE {BOUNDED}",
    f"SELECT foo FROM table2 WHERE {BOUNDED} ORDER BY foo DESC",
    f"SELECT table2.foo FROM table2 WHERE {BOUNDED}",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND foo NOT IN (7, 9)",
    f"SELECT COUNT(*) FROM table2 WHERE {BOUNDED}",
    f"SELECT foo FROM table2 WHERE {BOUNDED} AND (bar <> 4 XOR foo = 2)",
]


@pytest.mark.parametrize("sql", MUST_ACCEPT)
def test_must_accept(sql):
    pis = check(sql)
    assert pis is not None


# ---------------------------------------------------------------- rejected


MUST_REJECT = [
    # (sql, expected error type) — tests.rs must_reject + validate.rs cases
    # ORDER BY must match a SELECT item
    (f"SELECT foo, bar FROM table2 WHERE {BOUNDED} ORDER BY foo + 1",
     E.SpecialOrderBy),
    # Mixing aggregates and scalars
    (f"SELECT bar, MIN(foo) FROM table2 WHERE {BOUNDED}", E.MixedQuery),
    # Bitwise operators unsupported
    (f"SELECT a & b FROM t WHERE {BOUNDED}", E.UnsupportedBinaryOperator),
    (f"SELECT a | b FROM t WHERE {BOUNDED}", E.UnsupportedBinaryOperator),
    (f"SELECT a ^ b FROM t WHERE {BOUNDED}", E.UnsupportedBinaryOperator),
    # *LIKE unsupported
    (f"SELECT a FROM t WHERE {BOUNDED} AND a LIKE 'adsf'",
     E.UnsupportedFeature),
    (f"SELECT a FROM t WHERE {BOUNDED} AND a ILIKE 'adsf'",
     E.UnsupportedFeature),
    # JSON accessors unsupported
    (f"SELECT a -> b FROM t WHERE {BOUNDED}", E.UnsupportedBinaryOperator),
    (f"SELECT a ->> b FROM t WHERE {BOUNDED}", E.UnsupportedBinaryOperator),
    # No nested SELECTs
    ("SELECT alpha FROM (SELECT a AS alpha FROM t)", E.NestedSelect),
    (f"SELECT a FROM t WHERE {BOUNDED} AND b IN (SELECT c FROM t)",
     E.NestedSelect),
    # No mutating queries
    ("INSERT INTO t VALUES (35)", E.MutableQueries),
    ("CREATE TABLE t (x)", E.MutableQueries),
    ("UPDATE t SET a = 1", E.MutableQueries),
    ("DELETE FROM t", E.MutableQueries),
    # No ALL/ANY
    (f"SELECT a FROM t WHERE {BOUNDED} AND a = ALL (SELECT b FROM t)",
     E.UnsupportedFeature),
    (f"SELECT a FROM t WHERE {BOUNDED} AND a < ANY (SELECT b FROM t)",
     E.UnsupportedFeature),
    # Too many ORDER BY criterions
    (f"SELECT a, b, c FROM t WHERE {BOUNDED} ORDER BY a, b, c",
     E.OrderByArity),
    # NULLS FIRST/LAST
    (f"SELECT a FROM t WHERE {BOUNDED} ORDER BY a NULLS FIRST",
     E.NullRelatedOrdering),
    # String literal too long / bad prefix / bad digit
    (f"SELECT a FROM t WHERE {BOUNDED} AND a = "
     "'0x11223344556677889900112233445566778899001122334455667788990011223'",
     E.InvalidInteger),
    (f"SELECT a FROM t WHERE {BOUNDED} AND a = '0t1122'", E.InvalidInteger),
    (f"SELECT a FROM t WHERE {BOUNDED} AND a = '0o12345678'",
     E.InvalidInteger),
    # Too many items in SELECT (MAX_NUM_ITEMS_PER_OUTPUT=10)
    ("SELECT a+b, a-b, a, b, c*a, c+b, c<b, c-a, a+b+c, a*b+c, c, c*a-b "
     f"FROM t WHERE {BOUNDED}", E.TooManyOutputs),
    # Too many operations in WHERE (MAX_NUM_PREDICATE_OPS=20)
    (f"SELECT a FROM t WHERE {BOUNDED} AND "
     "(c+b-c*(a+c)-75 < 42*(a-b*c+a*(b-c)) "
     "AND a*56 >= b+63 OR a < b AND (a-b)*(a+b) >= a*c+b-4)",
     E.TooManyPredicateOps),
    # Too many operations in SELECT (MAX_NUM_RESULT_OPS=20)
    ("SELECT c+b-c*(a+c)-75 + 42*(a-b*c+a*(b-c)), a*56 >= b+63, a < b, "
     f"(a-b)*(a+b) >= a*c+b-4 FROM t WHERE {BOUNDED}", E.TooManyResultOps),
    # LIMIT/OFFSET are invocation parameters, not SQL text
    (f"SELECT a+b FROM t WHERE {BOUNDED} LIMIT 10", E.UseInvocationParameter),
    (f"SELECT a+b FROM t WHERE {BOUNDED} OFFSET 10",
     E.UseInvocationParameter),
    (f"SELECT b*c FROM t WHERE {BOUNDED} LIMIT a", E.NonStandardSql),
    # Set operations / CTEs / GROUP BY / HAVING / joins / compound tables
    ("SELECT a FROM t UNION SELECT b FROM t", E.SetOperation),
    ("WITH x AS (SELECT a FROM t) SELECT a FROM x", E.UnsupportedFeature),
    (f"SELECT a FROM t WHERE {BOUNDED} GROUP BY a", E.UnsupportedFeature),
    ("SELECT a FROM t JOIN table2 ON 1 = 1", E.UnsupportedJointure),
    ("SELECT a FROM db.t", E.CompoundTableName),
    # Reserved identifiers
    (f"SELECT __valid_from FROM t WHERE {BOUNDED}", E.ReservedIdentifier),
    # Unknown placeholder ($4 when 3 freestanding are declared)
    (f"SELECT a FROM t WHERE {BOUNDED} AND a = $4", E.UnknownPlaceholder),
    # Unknown function
    (f"SELECT MEDIAN(a) FROM t WHERE {BOUNDED}", E.UnknownFunction),
    # Aggregation arity
    (f"SELECT SUM(a, b) FROM t WHERE {BOUNDED}", E.InvalidArity),
    # IS NULL forms
    (f"SELECT a FROM t WHERE {BOUNDED} AND a IS NULL", E.UnsupportedFeature),
    # NULL immediate
    (f"SELECT a FROM t WHERE {BOUNDED} AND a = NULL",
     E.UnsupportedImmediateValue),
    # Unary minus
    (f"SELECT -a FROM t WHERE {BOUNDED}", E.UnsupportedUnaryOperator),
    # unknown table / column
    (f"SELECT a FROM nope WHERE {BOUNDED}", E.UnknownTable),
    (f"SELECT nope FROM t WHERE {BOUNDED}", E.UnknownColumn),
    # DISTINCT ON
    (f"SELECT DISTINCT ON (a) a FROM t WHERE {BOUNDED}",
     E.UnsupportedFeature),
    # TOP / FETCH
    ("SELECT TOP 3 a FROM t", E.NonStandardSql),
    (f"SELECT a FROM t WHERE {BOUNDED} FETCH FIRST 3 ROWS ONLY",
     E.NonStandardSql),
]


@pytest.mark.parametrize("sql,err", MUST_REJECT)
def test_must_reject(sql, err):
    with pytest.raises(err):
        check(sql)
    # every rejection is a typed ValidationError
    with pytest.raises(E.ValidationError):
        check(sql)


# ------------------------------------------------------- prim_index_bounds


ACCEPT_BOUNDS = [
    "SELECT foo FROM table2 WHERE block = foo + 5 AND block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT foo FROM table2 WHERE block <= $MAX_BLOCK AND block >= $MIN_BLOCK",
    "SELECT foo FROM table2 WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
]

REJECT_BOUNDS = [
    # bounds hidden under OR
    "SELECT foo FROM table2 WHERE block = $1 OR block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    "SELECT foo FROM table2 WHERE block = foo + 5 OR block BETWEEN $MIN_BLOCK AND $MAX_BLOCK",
    # constant bounds don't count
    "SELECT foo FROM table2 WHERE block = foo + 5 AND block BETWEEN 10 AND 15",
    # free placeholder is not a secure bound
    "SELECT foo FROM table2 WHERE block = foo + 5 AND block BETWEEN $MIN_BLOCK AND $1",
    # one-sided
    "SELECT foo FROM table2 WHERE block <= $MAX_BLOCK",
    "SELECT foo FROM table2 WHERE block >= $MIN_BLOCK",
    # strict inequalities
    "SELECT foo FROM table2 WHERE block < $MAX_BLOCK AND block > $MIN_BLOCK",
    # swapped placeholders
    "SELECT foo FROM table2 WHERE block >= $MAX_BLOCK AND block <= $MIN_BLOCK",
    # no WHERE at all
    "SELECT foo FROM table2",
]


@pytest.mark.parametrize("sql", ACCEPT_BOUNDS)
def test_prim_index_bounds_accept(sql):
    assert check(sql) is not None


@pytest.mark.parametrize("sql", REJECT_BOUNDS)
def test_prim_index_bounds_reject(sql):
    with pytest.raises(E.MissingSecureBounds):
        check(sql)


# ------------------------------------------------------------ provider API


def test_file_context_provider(tmp_path):
    p = tmp_path / "context.json"
    p.write_text(json.dumps([
        {"name": "table2", "columns": [
            {"name": "block", "id": 100, "kind": "primary_index"},
            {"name": "foo", "id": 101, "kind": "secondary_index"},
            {"name": "bar", "id": 102},
        ]},
    ]))
    ctx = FileContextProvider(str(p), max_num_predicate_ops=15)
    t = ctx.table("table2")
    assert t.primary_index.name == "block"
    assert t.secondary_index.identifier == 101
    assert ctx.max_num_predicate_ops == 15
    with pytest.raises(E.UnknownTable):
        ctx.table("zzz")


def test_provider_bounds_flow_into_universal_params():
    ctx = ContextProvider(
        {"t": T}, max_num_columns=7, max_num_predicate_ops=9,
        max_num_result_ops=11, max_num_items_per_output=4,
        max_num_placeholders=6,
    )
    params = ctx.universal_query_params()
    assert params.num_columns == 7
    assert params.num_predicate_ops == 9
    assert params.num_result_ops == 11
    assert params.num_outputs == 4
    assert params.num_placeholders == 6


def test_settings_limit_flows_into_pis():
    pis = parse_and_validate(
        f"SELECT foo FROM table2 WHERE {BOUNDED}",
        settings(limit=3, offset=1),
    )
    assert pis.limit == 3 and pis.offset == 1


def test_desugared_between_matches_explicit_bounds():
    a = check("SELECT foo FROM table2 WHERE block BETWEEN $MIN_BLOCK AND $MAX_BLOCK")
    b = check(f"SELECT foo FROM table2 WHERE {BOUNDED}")
    assert a.bounds == b.bounds
    assert a.predicate_ops == b.predicate_ops


def test_wildcard_expands_to_schema_columns():
    pis = check(f"SELECT * FROM table2 WHERE {BOUNDED}")
    assert [i.kind for i in pis.result.output_items] == ["column"] * 3
    assert pis.result.output_ids == [100, 101, 102]


def test_isolation_corpus():
    """Golden isolation cases mirroring parsil/src/tests.rs:212-303: the
    WHERE clause collapses to index-bound predicates only."""
    from mp2_tpu.parsil.isolator import isolate

    s = settings(bounds={"max_num_outputs": 5})

    def iso(sql, lo=None, hi=None):
        return isolate(sql, s, lo, hi)

    base = "SELECT * FROM table2 WHERE block BETWEEN $MIN_BLOCK AND $MAX_BLOCK"
    want_bounds = ("SELECT * FROM table2 WHERE table2.block >= $MIN_BLOCK "
                   "AND table2.block <= $MAX_BLOCK")
    assert iso(base) == f"{want_bounds} LIMIT 5"
    # other-column predicates are dropped
    assert iso(base + " AND (3 = 4 OR bar = 5)") == f"{want_bounds} LIMIT 5"
    # sec. index refs dropped when it has no known bounds
    assert iso(base + " AND foo < 5") == f"{want_bounds} LIMIT 5"
    # provided lower bound appears
    assert iso(base + " AND foo < 5", lo=45) == (
        f"{want_bounds} AND table2.foo >= 45 LIMIT 5"
    )
    # provided upper bound appears
    assert iso(base + " AND foo < 5", hi=4) == (
        f"{want_bounds} AND table2.foo <= 4 LIMIT 5"
    )
    # both bounds
    assert iso(base + " AND foo = 50", lo=45, hi=56) == (
        f"{want_bounds} AND table2.foo >= 45 AND table2.foo <= 56 LIMIT 5"
    )
    # any other primary-index predicate is ignored
    assert iso(base + " AND block = 50") == f"{want_bounds} LIMIT 5"
    # compound example: ORs and other columns all pruned
    assert iso(base + " AND (foo = 4 OR foo = 15) AND bar = 12") == (
        f"{want_bounds} LIMIT 5"
    )


def test_in_list_desugars_to_or_chain():
    pis = check(
        f"SELECT foo FROM table2 WHERE {BOUNDED} AND bar IN (1, 2, 4)"
    )
    # 3 equality ops + 2 OR merges (+ the bound conjuncts folded away)
    from mp2_tpu.vdb.query.ops import Operation

    kinds = [op.op for op in pis.predicate_ops]
    assert kinds.count(Operation.EQ) == 3
    assert kinds.count(Operation.OR) == 2
