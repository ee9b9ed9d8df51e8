"""Lucene ``query_string`` grammar → bool-query dicts.

ES's ``query_string`` query exposes the full Lucene syntax users type
into Kibana's query bar and the reference's consumers run against
synced indexes: explicit fields (``lang:en``), boolean operators
(``AND``/``OR``/``NOT``, ``&&``/``||``/``!``), required/prohibited
prefixes (``+``/``-``), grouping (``(...)`` and ``field:(...)``),
quoted phrases with proximity (``"hash join"~2``), wildcards
(``te?t``, ``vec*``), fuzziness (``tabel~1``, bare ``~`` = 2), ranges
(``[a TO b]`` inclusive, ``{a TO b}`` exclusive, mixed, ``*`` open),
``_exists_:field``, and boosts (``^2`` — parsed and DISCARDED here:
this is the filter path, where membership is boost-independent, the
same stance the bool compiler takes for ``constant_score``).

The parser is a small recursive-descent over a regex token stream with
Lucene precedence (``NOT`` > ``AND`` > ``OR``; adjacent clauses join
under ``default_operator``) and PRODUCES ordinary bool-query dicts —
compilation, analyzers, per-field mappings routing (fuzzy terms reach
the vocabulary scale path), date math, and the oracle story are all
inherited from :func:`bool_query_filter` unchanged.  ``+``/``-``
prefixes inside an OR group lift the group to must/must_not/should
form, Lucene's documented coercion.

Driver-side string work, O(query length) — control-plane by
construction.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from monstache_spark.operators.search import bool_query_filter

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<range>[\[\{]\s*(?P<lo>[^\s\]\}]+)\s+TO\s+(?P<hi>[^\s\]\}]+)\s*[\]\}])
  | (?P<quoted>"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?)
  | (?P<field>[A-Za-z_][\w.]*):
  | (?P<term>[^\s():^]+)
  | (?P<boost>\^\d+(\.\d+)?)
    """,
    re.VERBOSE,
)


class _Tokens:
    def __init__(self, text: str):
        self.toks: list[tuple[str, re.Match]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if m is None:
                raise ValueError(f"query_string syntax error at: {text[pos:]!r}")
            pos = m.end()
            # resolve to the outermost matched alternative (lastgroup
            # may report an inner capture like `phrase` or `lo`)
            kind = "term"
            for outer in ("ws", "and", "or", "not", "plus", "minus",
                          "lparen", "rparen", "range", "quoted", "field",
                          "term", "boost"):
                if m.group(outer) is not None:
                    kind = outer
                    break
            if kind not in ("ws", "boost"):  # boosts parse and drop
                self.toks.append((kind, m))
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, re.Match]:
        t = self.toks[self.i]
        self.i += 1
        return t


def _coerce(v: str):
    if v == "*":
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def _range_leaf(field: str, m: re.Match) -> dict:
    raw = m.group("range")
    lo_inc, hi_inc = raw[0] == "[", raw[-1] == "]"
    lo, hi = _coerce(m.group("lo")), _coerce(m.group("hi"))
    spec: dict = {}
    if lo is not None:
        spec["gte" if lo_inc else "gt"] = lo
    if hi is not None:
        spec["lte" if hi_inc else "lt"] = hi
    return {"range": {field: spec}}


def _term_leaf(field: str, term: str) -> dict:
    if field == "_exists_":
        return {"exists": {"field": term}}
    fm = re.fullmatch(r"(.+?)~(\d+)?", term)
    if fm:
        fuzz = int(fm.group(2)) if fm.group(2) is not None else 2
        return {"fuzzy": {field: {"value": fm.group(1), "fuzziness": fuzz}}}
    if "*" in term or "?" in term:
        # token-level: a query_string wildcard expands against the
        # term dictionary (any analyzed token may match), not the
        # whole field value
        return {"__token_wildcard__": {field: term.lower()}}
    return {"match": {field: term}}


def _parse_expr(ts: _Tokens, field: str, default_op: str):
    clauses = [_parse_and(ts, field, default_op)]
    ops = []
    while True:
        k = ts.peek()
        if k == "or":
            ts.next()
            clauses.append(_parse_and(ts, field, default_op))
            ops.append("or")
        elif k is not None and k != "rparen" and default_op == "or":
            # adjacency joins under the default operator
            clauses.append(_parse_and(ts, field, default_op))
            ops.append("or")
        else:
            break
    return clauses[0] if len(clauses) == 1 else ("or", clauses)


def _parse_and(ts: _Tokens, field: str, default_op: str):
    clauses = [_parse_not(ts, field, default_op)]
    while True:
        k = ts.peek()
        if k == "and":
            ts.next()
            clauses.append(_parse_not(ts, field, default_op))
        elif k is not None and k not in ("or", "rparen") and default_op == "and":
            clauses.append(_parse_not(ts, field, default_op))
        else:
            break
    return clauses[0] if len(clauses) == 1 else ("and", clauses)


def _parse_not(ts: _Tokens, field: str, default_op: str):
    if ts.peek() == "not":
        ts.next()
        return ("not", _parse_not(ts, field, default_op))
    return _parse_modified(ts, field, default_op)


def _parse_modified(ts: _Tokens, field: str, default_op: str):
    k = ts.peek()
    if k == "plus":
        ts.next()
        return ("plus", _parse_primary(ts, field, default_op))
    if k == "minus":
        ts.next()
        return ("minus", _parse_primary(ts, field, default_op))
    return _parse_primary(ts, field, default_op)


def _parse_primary(ts: _Tokens, field: str, default_op: str):
    k = ts.peek()
    if k is None:
        raise ValueError("query_string: unexpected end of input")
    if k == "lparen":
        ts.next()
        inner = _parse_expr(ts, field, default_op)
        if ts.peek() != "rparen":
            raise ValueError("query_string: unbalanced parentheses")
        ts.next()
        return inner
    if k == "field":
        _, m = ts.next()
        f = m.group("field")  # the colon sits outside the capture
        nk = ts.peek()
        if nk == "lparen":
            ts.next()
            inner = _parse_expr(ts, f, default_op)
            if ts.peek() != "rparen":
                raise ValueError("query_string: unbalanced parentheses")
            ts.next()
            return inner
        if nk == "range":
            _, rm = ts.next()
            return ("leaf", _range_leaf(f, rm))
        if nk == "quoted":
            _, qm = ts.next()
            return ("leaf", _phrase_leaf(f, qm))
        if nk == "term":
            _, tm = ts.next()
            return ("leaf", _term_leaf(f, tm.group("term")))
        raise ValueError(f"query_string: expected value after {f}:")
    if k == "quoted":
        _, qm = ts.next()
        return ("leaf", _phrase_leaf(field, qm))
    if k == "range":
        _, rm = ts.next()
        return ("leaf", _range_leaf(field, rm))
    if k == "term":
        _, tm = ts.next()
        return ("leaf", _term_leaf(field, tm.group("term")))
    raise ValueError(f"query_string: unexpected token kind {k}")


def _phrase_leaf(field: str, m: re.Match) -> dict:
    phrase = m.group("phrase")
    slop = m.group("slop")
    if slop is not None:
        return {"match_phrase": {field: {"query": phrase, "slop": int(slop)}}}
    return {"match_phrase": {field: phrase}}


def _to_bool(node) -> dict:
    """AST → bool-query dict.  ``+``/``-`` members of an OR group lift
    it to must/must_not/should (Lucene's coercion); a bare NOT becomes
    ``must_not`` with an unconstrained context."""
    if isinstance(node, tuple) and node[0] == "leaf":
        return node[1]
    if isinstance(node, tuple) and node[0] == "not":
        return {"bool": {"must_not": [_to_bool(node[1])]}}
    if isinstance(node, tuple) and node[0] in ("plus", "minus"):
        # a modifier surviving to this level (not inside an or-group)
        inner = _to_bool(node[1])
        if node[0] == "plus":
            return inner
        return {"bool": {"must_not": [inner]}}
    if isinstance(node, tuple) and node[0] == "and":
        must, must_not = [], []
        for c in node[1]:
            if isinstance(c, tuple) and c[0] == "minus":
                must_not.append(_to_bool(c[1]))
            elif isinstance(c, tuple) and c[0] == "not":
                must_not.append(_to_bool(c[1]))
            else:
                must.append(_to_bool(c))
        body: dict = {}
        if must:
            body["must"] = must
        if must_not:
            body["must_not"] = must_not
        return {"bool": body}
    if isinstance(node, tuple) and node[0] == "or":
        must, must_not, should = [], [], []
        for c in node[1]:
            if isinstance(c, tuple) and c[0] == "plus":
                must.append(_to_bool(c[1]))
            elif isinstance(c, tuple) and c[0] == "minus":
                must_not.append(_to_bool(c[1]))
            else:
                should.append(_to_bool(c))
        body = {}
        if must:
            body["must"] = must
        if must_not:
            body["must_not"] = must_not
        if should:
            body["should"] = should
            if not must:
                body["minimum_should_match"] = 1
        return {"bool": body}
    raise ValueError(f"query_string: bad AST node {node!r}")


def parse_query_string(
    query: str,
    default_field: str = "text",
    default_operator: str = "or",
) -> dict:
    """Parse a Lucene query string into a bool-query dict (see module
    docstring for the supported grammar)."""
    ts = _Tokens(query)
    ast = _parse_expr(ts, default_field, default_operator.lower())
    if ts.peek() is not None:
        raise ValueError("query_string: trailing tokens (unbalanced ')'?)")
    return _to_bool(ast)


def query_string_filter(
    df: DataFrame,
    query: str,
    default_field: str = "text",
    default_operator: str = "or",
    analyzer=None,
    mappings=None,
    lookups=None,
    now=None,
) -> DataFrame:
    """ES ``query_string`` query: parse and run through
    :func:`bool_query_filter` — analyzers, mappings routing (fuzzy
    terms take the vocabulary scale path), terms lookups, and date
    math all apply to the parsed tree."""
    return bool_query_filter(
        df,
        parse_query_string(query, default_field, default_operator),
        analyzer=analyzer,
        mappings=mappings,
        lookups=lookups,
        now=now,
    )
