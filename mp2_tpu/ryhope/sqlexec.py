"""A tiny Postgres-dialect SELECT evaluator for the companion SQL.

`MockPg` delegates to this module for SELECT statements that are not one
of the storage layer's own statement shapes — i.e. the queries produced
by `mp2_tpu.parsil.executor` (the reference executes those against a
real Postgres with JSONB payloads, parsil/src/executor.rs:1058-1092;
this is the in-repo equivalent so the emitted SQL actually RUNS against
the same MockPg-backed store the proving pipeline reads).

Supported dialect (exactly what the executor emits):
  SELECT [DISTINCT] item (, item)* FROM tbl WHERE expr
  item := COUNT(*) | SUM|MIN|MAX|AVG|COUNT ( expr ) | expr
  expr := literals, %s params, key / __valid_from / __valid_until /
          payload columns, JSON accessors  payload -> 'cells' -> '<id>'
          ->> 'value',  ::numeric / ::bool casts, NOT / AND / OR,
          comparisons (= <> < > <= >=), + - * / %, parentheses.

Semantics notes: `/` is INTEGER division and AVG is sum // count — the
u256 circuit semantics the companion SQL cross-checks (query/
universal_query_gadget.rs uses truncating division).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+)"
    r"|(?P<str>'[^']*')"
    r"|(?P<param>%s)"
    r"|(?P<op>->>|->|<>|<=|>=|::|[(),*+\-/%=<>])"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r")"
)


def _tokenize(sql: str) -> List[str]:
    out, i = [], 0
    while i < len(sql):
        m = _TOKEN_RE.match(sql, i)
        if not m:
            if sql[i:].strip() == "":
                break
            raise ValueError(f"cannot tokenize SQL at: {sql[i:i+30]!r}")
        out.append(m.group(m.lastgroup))
        i = m.end()
    return out


class _Parser:
    """Recursive-descent parser producing evaluator closures
    row -> value.  `row` is the storage dict {key, payload,
    __valid_from, __valid_until} with payload pre-parsed JSON."""

    def __init__(self, tokens: List[str], params: Sequence):
        self.t = tokens
        self.i = 0
        self.params = list(params)
        self.pi = 0

    def peek(self, k: int = 0) -> Optional[str]:
        return self.t[self.i + k] if self.i + k < len(self.t) else None

    def next(self) -> str:
        tok = self.t[self.i]
        self.i += 1
        return tok

    def expect(self, tok: str):
        got = self.next()
        assert got.upper() == tok.upper(), f"expected {tok}, got {got}"

    # -- expression grammar (lowest to highest precedence) ------------------
    def expr(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.peek() and self.peek().upper() == "OR":
            self.next()
            right = self._and()
            left = (lambda l, r: lambda row: _bool(l(row)) or _bool(r(row)))(
                left, right
            )
        return left

    def _and(self):
        left = self._not()
        while self.peek() and self.peek().upper() == "AND":
            self.next()
            right = self._not()
            left = (lambda l, r: lambda row: _bool(l(row)) and _bool(r(row)))(
                left, right
            )
        return left

    def _not(self):
        if self.peek() and self.peek().upper() == "NOT":
            self.next()
            inner = self._not()
            return lambda row: not _bool(inner(row))
        return self._cmp()

    def _cmp(self):
        left = self._add()
        op = self.peek()
        if op in ("=", "<>", "<", ">", "<=", ">="):
            self.next()
            right = self._add()
            fns = {
                "=": lambda a, b: a == b, "<>": lambda a, b: a != b,
                "<": lambda a, b: a < b, ">": lambda a, b: a > b,
                "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b,
            }
            f = fns[op]
            return (
                lambda l, r, f=f: lambda row: f(_num(l(row)), _num(r(row)))
            )(left, right)
        return left

    def _add(self):
        left = self._mul()
        while self.peek() in ("+", "-"):
            op = self.next()
            right = self._mul()
            if op == "+":
                left = (lambda l, r: lambda row: _num(l(row)) + _num(r(row)))(
                    left, right
                )
            else:
                left = (lambda l, r: lambda row: _num(l(row)) - _num(r(row)))(
                    left, right
                )
        return left

    def _mul(self):
        left = self._unary()
        while self.peek() in ("*", "/", "%"):
            op = self.next()
            right = self._unary()
            if op == "*":
                left = (lambda l, r: lambda row: _num(l(row)) * _num(r(row)))(
                    left, right
                )
            elif op == "/":
                # integer division: the u256 circuit semantics
                left = (
                    lambda l, r: lambda row: _num(l(row)) // _num(r(row))
                )(left, right)
            else:
                left = (lambda l, r: lambda row: _num(l(row)) % _num(r(row)))(
                    left, right
                )
        return left

    def _unary(self):
        if self.peek() == "-":
            self.next()
            inner = self._unary()
            return lambda row: -_num(inner(row))
        return self._json(self._postfix_cast(self._primary()))

    def _json(self, left):
        while self.peek() in ("->", "->>"):
            op = self.next()
            key_tok = self.next()
            assert key_tok.startswith("'"), "JSON path key must be a string"
            key = key_tok[1:-1]
            if op == "->":
                left = (lambda l, k: lambda row: (l(row) or {}).get(k))(
                    left, key
                )
            else:
                left = (
                    lambda l, k: lambda row: _as_text((l(row) or {}).get(k))
                )(left, key)
        return self._postfix_cast(left)

    def _postfix_cast(self, fn):
        while self.peek() == "::":
            self.next()
            ty = self.next().lower()
            if ty == "numeric":
                fn = (lambda f: lambda row: _num(f(row)))(fn)
            elif ty == "bool":
                fn = (lambda f: lambda row: _bool(f(row)))(fn)
            # other casts: identity
        return fn

    def _primary(self):
        tok = self.peek()
        if tok == "(":
            self.next()
            inner = self.expr()
            self.expect(")")
            return self._postfix_cast(inner)
        tok = self.next()
        if tok == "%s":
            val = self.params[self.pi]
            self.pi += 1
            return lambda row, v=val: v
        if tok.isdigit():
            v = int(tok)
            return lambda row, v=v: v
        if tok.startswith("'"):
            s = tok[1:-1]
            return lambda row, s=s: s
        up = tok.upper()
        if up == "NULL":
            return lambda row: None
        if up == "TRUE":
            return lambda row: True
        if up == "FALSE":
            return lambda row: False
        # column reference
        return lambda row, c=tok: row[c]


def _bool(v) -> bool:
    if v is None:
        return False
    if isinstance(v, bool):
        return v
    return int(v) != 0


def _num(v) -> int:
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, str):
        return int(v)
    assert v is not None, "NULL in numeric context"
    return v


def _as_text(v) -> Optional[str]:
    if v is None or isinstance(v, str):
        return v
    return json.dumps(v)


_AGGS = ("SUM", "MIN", "MAX", "AVG", "COUNT")


def run_select(
    sql: str, params: Sequence, tables: Dict[str, List[dict]]
) -> List[Tuple]:
    """Execute one SELECT of the companion-SQL dialect against MockPg's
    in-memory tables; returns fetchall()-style tuples."""
    p = _Parser(_tokenize(sql), params)
    p.expect("SELECT")
    distinct = False
    if p.peek() and p.peek().upper() == "DISTINCT":
        p.next()
        distinct = True

    # select items: (kind, agg_name_or_None, eval_fn_or_None)
    items: List[Tuple[Optional[str], Any]] = []
    while True:
        tok = p.peek()
        if tok and tok.upper() in _AGGS and p.peek(1) == "(":
            agg = p.next().upper()
            p.expect("(")
            if p.peek() == "*":
                assert agg == "COUNT", "only COUNT(*) is supported"
                p.next()
                items.append((agg, None))
            else:
                items.append((agg, p.expr()))
            p.expect(")")
        else:
            items.append((None, p.expr()))
        if p.peek() == ",":
            p.next()
            continue
        break
    p.expect("FROM")
    table = p.next()
    p.expect("WHERE")
    where = p.expr()
    # ORDER BY <expr> [ASC|DESC] [, ...] / LIMIT n / OFFSET n — the
    # bracketer's push-down shapes (parsil/src/bracketer.rs:48-140)
    order: List[Tuple[Any, bool]] = []
    if p.peek() and p.peek().upper() == "ORDER":
        p.next()
        assert p.next().upper() == "BY"
        while True:
            fn = p.expr()
            desc = False
            if p.peek() and p.peek().upper() in ("ASC", "DESC"):
                desc = p.next().upper() == "DESC"
            order.append((fn, desc))
            if p.peek() == ",":
                p.next()
                continue
            break
    def _count(parser):
        tok = parser.next()
        if tok == "%s":
            v = int(parser.params[parser.pi])
            parser.pi += 1
            return v
        return int(tok)

    limit = offset = None
    if p.peek() and p.peek().upper() == "LIMIT":
        p.next()
        limit = _count(p)
    if p.peek() and p.peek().upper() == "OFFSET":
        p.next()
        offset = _count(p)
    assert p.peek() is None, f"trailing SQL tokens: {p.t[p.i:]}"

    rows = []
    for stored in tables.get(table, []):
        row = dict(stored)
        if isinstance(row.get("payload"), str):
            row["payload"] = json.loads(row["payload"])
        if _bool(where(row)):
            rows.append(row)

    for fn, desc in reversed(order):  # stable multi-criteria sort
        rows.sort(key=lambda r: _num(fn(r)), reverse=desc)

    has_agg = any(a for a, _ in items)
    if has_agg:
        out = []
        for agg, fn in items:
            if agg == "COUNT":
                out.append(
                    len(rows) if fn is None
                    else sum(1 for r in rows if fn(r) is not None)
                )
                continue
            vals = [_num(fn(r)) for r in rows]
            if not vals:
                out.append(None)
            elif agg == "SUM":
                out.append(sum(vals))
            elif agg == "MIN":
                out.append(min(vals))
            elif agg == "MAX":
                out.append(max(vals))
            elif agg == "AVG":
                out.append(sum(vals) // len(vals))
            else:
                out.append(vals[-1] if vals else None)
        return [tuple(out)]

    result = [tuple(fn(r) for _, fn in items) for r in rows]
    if distinct:
        seen, dedup = set(), []
        for t in result:
            if t not in seen:
                seen.add(t)
                dedup.append(t)
        result = dedup
    if offset:
        result = result[offset:]
    if limit is not None:
        result = result[:limit]
    return result
