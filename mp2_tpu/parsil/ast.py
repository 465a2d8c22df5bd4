"""SQL tokenizer + parser for the supported ZK-SQL subset.

Hand-rolled (no sqlparser/sqlglot in this environment); grammar follows the
reference's supported subset (/root/reference/README.md:53-61 and
parsil/src/validate.rs): a single SELECT over one table, either all
aggregations or all scalar expressions (no mixing), U256 arithmetic and
comparison/boolean operators, numbered placeholders plus $MIN_BLOCK /
$MAX_BLOCK, optional LIMIT/OFFSET, optional DISTINCT.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

KEYWORDS = {
    "SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "XOR", "LIMIT", "OFFSET",
    "SUM", "AVG", "MIN", "MAX", "COUNT", "DISTINCT", "AS", "ORDER", "BY",
    "ASC", "DESC",
}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+|0x[0-9a-fA-F]+)"
    r"|(?P<ph>\$[A-Za-z_0-9]+)"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op><=|>=|!=|<>|=|<|>|\+|-|\*|/|%|\(|\)|,|;))"
)


@dataclass(frozen=True)
class Token:
    kind: str  # num | ph | id | kw | op
    text: str


def tokenize(sql: str) -> List[Token]:
    out = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            rest = sql[pos:].strip()
            if not rest:
                break
            raise SyntaxError(f"cannot tokenize near: {rest[:30]!r}")
        pos = m.end()
        if m.group("num"):
            out.append(Token("num", m.group("num")))
        elif m.group("ph"):
            out.append(Token("ph", m.group("ph")))
        elif m.group("id"):
            t = m.group("id")
            if t.upper() in KEYWORDS:
                out.append(Token("kw", t.upper()))
            else:
                out.append(Token("id", t))
        else:
            out.append(Token("op", m.group("op")))
    return out


# --- AST --------------------------------------------------------------------


@dataclass(frozen=True)
class Column:
    name: str


@dataclass(frozen=True)
class Const:
    value: int


@dataclass(frozen=True)
class Placeholder:
    name: str  # "$1", "$MIN_BLOCK", ...


@dataclass(frozen=True)
class BinOp:
    op: str  # + - * / % = != < <= > >= AND OR XOR
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class UnOp:
    op: str  # NOT
    operand: "Expr"


Expr = Union[Column, Const, Placeholder, BinOp, UnOp]


@dataclass(frozen=True)
class Aggregation:
    func: str  # SUM AVG MIN MAX COUNT
    expr: Optional[Expr]  # None for COUNT(*)


@dataclass
class Select:
    items: List[Union[Aggregation, Expr]]
    table: str
    where: Optional[Expr]
    distinct: bool = False
    limit: Optional[int] = None
    offset: Optional[int] = None
    order_by: Optional[Tuple[Expr, str]] = None  # (expr, ASC|DESC)


class Parser:
    def __init__(self, tokens: List[Token]):
        self.toks = tokens
        self.pos = 0

    def peek(self) -> Optional[Token]:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise SyntaxError("unexpected end of query")
        self.pos += 1
        return t

    def expect(self, kind: str, text: Optional[str] = None) -> Token:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise SyntaxError(f"expected {text or kind}, got {t.text!r}")
        return t

    def accept(self, kind: str, text: Optional[str] = None) -> Optional[Token]:
        t = self.peek()
        if t and t.kind == kind and (text is None or t.text == text):
            self.pos += 1
            return t
        return None

    # -- grammar -------------------------------------------------------------
    def parse(self) -> Select:
        self.expect("kw", "SELECT")
        distinct = bool(self.accept("kw", "DISTINCT"))
        items = [self.select_item()]
        while self.accept("op", ","):
            items.append(self.select_item())
        self.expect("kw", "FROM")
        table = self.expect("id").text
        where = None
        if self.accept("kw", "WHERE"):
            where = self.expr()
        order_by = None
        if self.accept("kw", "ORDER"):
            self.expect("kw", "BY")
            e = self.expr()
            direction = "ASC"
            if self.accept("kw", "ASC"):
                pass
            elif self.accept("kw", "DESC"):
                direction = "DESC"
            order_by = (e, direction)
        limit = offset = None
        if self.accept("kw", "LIMIT"):
            limit = int(self.expect("num").text, 0)
        if self.accept("kw", "OFFSET"):
            offset = int(self.expect("num").text, 0)
        self.accept("op", ";")
        if self.peek() is not None:
            raise SyntaxError(f"trailing tokens at {self.peek().text!r}")
        return Select(
            items=items, table=table, where=where, distinct=distinct,
            limit=limit, offset=offset, order_by=order_by,
        )

    def select_item(self):
        t = self.peek()
        if t and t.kind == "kw" and t.text in ("SUM", "AVG", "MIN", "MAX", "COUNT"):
            func = self.next().text
            self.expect("op", "(")
            if func == "COUNT" and self.accept("op", "*"):
                self.expect("op", ")")
                item = Aggregation(func, None)
            else:
                item = Aggregation(func, self.expr())
                self.expect("op", ")")
            if self.accept("kw", "AS"):
                self.expect("id")
            return item
        e = self.expr()
        if self.accept("kw", "AS"):
            self.expect("id")
        return e

    def expr(self) -> Expr:
        return self.or_expr()

    def or_expr(self) -> Expr:
        left = self.xor_expr()
        while self.accept("kw", "OR"):
            left = BinOp("OR", left, self.xor_expr())
        return left

    def xor_expr(self) -> Expr:
        left = self.and_expr()
        while self.accept("kw", "XOR"):
            left = BinOp("XOR", left, self.and_expr())
        return left

    def and_expr(self) -> Expr:
        left = self.not_expr()
        while self.accept("kw", "AND"):
            left = BinOp("AND", left, self.not_expr())
        return left

    def not_expr(self) -> Expr:
        if self.accept("kw", "NOT"):
            return UnOp("NOT", self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self) -> Expr:
        left = self.add_expr()
        t = self.peek()
        if t and t.kind == "op" and t.text in ("=", "!=", "<>", "<", "<=", ">", ">="):
            op = self.next().text
            if op == "<>":
                op = "!="
            return BinOp(op, left, self.add_expr())
        return left

    def add_expr(self) -> Expr:
        left = self.mul_expr()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.text in ("+", "-"):
                left = BinOp(self.next().text, left, self.mul_expr())
            else:
                return left

    def mul_expr(self) -> Expr:
        left = self.atom()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.text in ("*", "/", "%"):
                left = BinOp(self.next().text, left, self.atom())
            else:
                return left

    def atom(self) -> Expr:
        t = self.next()
        if t.kind == "num":
            return Const(int(t.text, 0))
        if t.kind == "ph":
            return Placeholder(t.text)
        if t.kind == "id":
            return Column(t.text)
        if t.kind == "op" and t.text == "(":
            e = self.expr()
            self.expect("op", ")")
            return e
        raise SyntaxError(f"unexpected token {t.text!r}")


def parse(sql: str) -> Select:
    return Parser(tokenize(sql)).parse()
