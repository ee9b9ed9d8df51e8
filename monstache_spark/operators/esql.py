"""ES|QL — Elasticsearch's piped query language — compiled to DataFrame plans.

ES|QL (GA in ES 8.14: ``FROM idx | WHERE ... | STATS ... BY ... |
SORT ... | LIMIT n``) is the query surface ES now pushes consumers
toward; a monstache user moving to this engine brings those queries
along.  This module compiles the documented core command set onto the
DataFrame API — each pipe stage maps 1:1 onto a declarative operator,
so Catalyst still sees ONE plan (predicate pushdown through the
pipes, column pruning from KEEP/STATS, partial aggregation under
STATS — the pipes are syntax, not materialization barriers).

Supported commands (the ES|QL processing core):

* ``FROM table``            — source (resolved from the passed table map)
* ``ROW a = 1, b = "x"``    — literal one-row source
* ``WHERE <expr>``          — filter
* ``EVAL name = <expr>, …`` — computed columns
* ``KEEP col, pat*`` / ``DROP col, pat*`` — projection (``*`` wildcards)
* ``RENAME old AS new, …``  — renames
* ``STATS a = AGG(x), … [BY k1, k2]`` — grouped aggregation
* ``SORT f [ASC|DESC] [NULLS FIRST|LAST], …``
* ``LIMIT n``
* ``MV_EXPAND col``         — explode a multi-value column
* ``ENRICH policy ON field [WITH f1, f2]`` — the enrich-policy lookup:
  the policy's frame (passed in ``enrich_policies`` as
  ``name -> (frame, match_field)``) BROADCAST left-joins on the match
  field, appending the requested (or all non-key) policy columns —
  exactly what ES's enrich processor materializes
* ``LOOKUP JOIN table ON field`` — the ES 8.18 lookup-index join: a
  broadcast left join against a table from the table map, joining on
  the shared field name
* ``DISSECT col "%{a} %{b}"`` — the dissect processor: the pattern's
  literal separators compile to ONE anchored regex with a capture
  group per ``%{key}`` (appended as string columns, null on
  non-match); ``%{}`` skips a segment
* ``GROK col "%{PAT:field[:type]} …"`` — the grok processor over the
  BUILT-IN pattern library (``_GROK_PATTERNS``), re-rendered in the
  Java-regex ∩ RE2 portable core so one regex evaluates identically
  on Spark and any independent oracle; ``:int``/``:long``/``:float``
  convert; literal text between tokens is raw regex (capturing
  groups in it are refused — they would shift extraction indices)

Round-10 8.18 surface: full-text ``MATCH(field, "q" [, options])``
(``_rewrite_match`` — OR over simple-analyzed query tokens, operator
AND supported) and ``QSTR("lucene query")`` (``_apply_where`` — the
whole query_string grammar through the engine's parser, AND-composable
with SQL conjuncts) in WHERE; ``CATEGORIZE(col)`` in STATS BY (the
S17 deterministic log categorizer as a function template).

Round-13 additions: ``MATCH_PHRASE(field, "phrase")``
(``_rewrite_match_phrase`` — exact consecutive-token predicate over
the simple analyzer, one codegen ``exists`` scan; slop/analyzer
options refuse toward search.match_phrase) and the 9.1 ``FORK``
command — each parenthesized branch is a full sub-pipe applied to the
incoming frame (compiled through a recursive ``esql()`` call), results
``unionByName`` with the ``_fork`` discriminator ES emits; branch
count 2-8, nesting refused (as in ES).  ``COMPLETION``/``RERANK``
remain REFUSED as model-dependent (DIVERGENCES S31), and ``RRF``
stays refused because it fuses the ``_score`` relevance column this
engine's frames don't carry (use the retriever tree's rrf node).

Expressions ride the shared painless→SQL binding contract (the same
surface ``script``/``script_score``/``bucket_script`` use): ES|QL's
``==`` / ``!=`` translate to SQL equality, string literals keep double
quotes (rewritten to SQL singles), and function calls pass through to
Spark SQL — the documented subset is the set both engines evaluate
identically (arithmetic, comparisons, CASE, CAST, string functions,
date_trunc).  ES|QL spellings that collide with a Spark builtin of
different semantics or argument order (SPLIT, REPLACE, LOCATE,
DATE_FORMAT, DATE_TRUNC, PERCENTILE, …) rewrite CASE-SENSITIVELY —
only the uppercase ES|QL form; the lowercase Spark form passes
through untouched.  Unknown commands RAISE rather than silently
skip.

Scale note: because compilation is purely structural, every plan
property the engine guarantees elsewhere holds here automatically —
a ``WHERE`` ahead of ``STATS`` reaches the parquet scan, ``KEEP``
prunes the read schema, ``SORT | LIMIT`` becomes
TakeOrderedAndProject.
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# double-quoted ES|QL literal OR single-quoted SQL literal (emitted
# by earlier rewrite passes; '' is the embedded-quote escape)
_LIT_RE = re.compile(r'"(?:[^"\\]|\\.)*"|\'(?:[^\']|\'\')*\'')

# ES|QL temporal literals in date ARITHMETIC (`ts - 1 day`,
# `NOW() + 2 hours`): without a rewrite Spark parses `- 1 day` as
# `- 1` with `day` dangling — an opaque mismatch, or worse a silent
# alias.  Rewritten to ANSI `INTERVAL N UNIT` (quarter → 3N months:
# Spark's INTERVAL grammar has no QUARTER unit).  The +/- anchor
# keeps BUCKET/DATE_TRUNC span arguments (consumed by their own
# rewriters earlier) and bare column names out of scope.
_DURATION_RE = re.compile(
    r"([+\-]\s*)(\d+)\s+"
    r"(millisecond|second|minute|hour|day|week|month|quarter|year)s?\b",
    re.I,
)


def _duration_sub(m: "re.Match") -> str:
    sign, n, unit = m.group(1), int(m.group(2)), m.group(3).lower()
    if unit == "quarter":
        return f"{sign}INTERVAL {3 * n} MONTH"
    return f"{sign}INTERVAL {n} {unit.upper()}"


def _rewrite_durations(expr: str) -> str:
    out, pos = [], 0
    for m in _LIT_RE.finditer(expr):
        out.append(_DURATION_RE.sub(_duration_sub, expr[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(_DURATION_RE.sub(_duration_sub, expr[pos:]))
    return "".join(out)


# ES|QL functions REFUSED by contract (S36) — each would otherwise
# fall through to Spark SQL and die with an opaque "undefined
# function"; name the reason instead.  The ST_* spatial family is
# matched by prefix below.
_REFUSED_FNS = {
    "KQL": "a query-language-in-a-function; use MATCH()/QSTR() or "
    "the search operators",
    "TO_VERSION": "the ES version type's ordering is a Lucene "
    "comparator with no cross-engine arithmetic",
    "TO_UNSIGNED_LONG": "no unsigned 64-bit integer exists on the "
    "JVM/Arrow path; use TO_LONG",
    "TO_DATEPERIOD": "interval literals — express date math via "
    "DATE_DIFF / BUCKET spans",
    "TO_TIMEDURATION": "interval literals — express date math via "
    "DATE_DIFF / BUCKET spans",
    "TO_GEOPOINT": "geo values are (lat, lon) double columns here — "
    "use operators.geo",
    "TO_GEOSHAPE": "geo values are WKT-free (lat, lon) columns here — "
    "use operators.geo",
    "TO_CARTESIANPOINT": "no cartesian spatial type — use plain "
    "double columns",
    "TO_CARTESIANSHAPE": "no cartesian spatial type — use plain "
    "double columns",
}


def _check_refused_fns(expr: str) -> None:
    for fn, why in _REFUSED_FNS.items():
        if _find_calls(expr, fn):
            raise ValueError(
                f"unsupported ES|QL function: {fn} — {why} "
                "(DIVERGENCES S36)"
            )
    # the ST_* spatial family (ST_X/ST_Y/ST_DISTANCE/ST_CONTAINS/…
    # and the ST_CENTROID_AGG/ST_EXTENT_AGG aggregates): geo points
    # here are (lat, lon) double columns, not a geo_point type —
    # operators.geo implements the equivalent ops (geo_bounds,
    # geo_centroid_by_cell, geo_shape relations) over them
    for st in re.finditer(r"\b(ST_[A-Z_]+)\s*\(", expr):
        if _find_calls(expr, st.group(1), case_sensitive=True):
            raise ValueError(
                f"unsupported ES|QL function: {st.group(1)} — geo "
                "points are (lat, lon) double columns here; use "
                "operators.geo (geo_bounds / geo_centroid_by_cell / "
                "geo_shape) (DIVERGENCES S36)"
            )


def _tr_expr(expr: str) -> str:
    """ES|QL expression → Spark/ANSI SQL: `==` → `=`, double-quoted
    string literals → single-quoted (escaping embedded singles), and
    a string literal standing as the right operand of ES|QL ``LIKE``
    rewrites its wildcards to SQL's (`*` → `%`, `?` → `_`, literal
    `%`/`_` escaped under ``ESCAPE``).  ES|QL-only function names
    (MV_*/TO_*) rewrite first via ``_rewrite_fns``; the two-argument
    ``BUCKET(col, N unit)`` time-bucketing function rewrites via
    ``_rewrite_bucket``."""
    # pattern lists FIRST: at this point the only literals are the
    # user's double-quoted ES|QL strings — later rewriters emit
    # single-quoted SQL literals (possibly containing bare double
    # quotes) that would break the quote-parity check (self-review
    # r10 pass 3)
    _check_refused_fns(expr)
    expr = _rewrite_like_lists(expr)
    expr = _rewrite_bucket(expr)
    expr = _rewrite_match_phrase(expr)
    expr = _rewrite_match(expr)
    expr = _rewrite_cidr_match(expr)
    expr = _rewrite_date_diff(expr)
    expr = _rewrite_date_extract(expr)
    expr = _rewrite_percentile(expr)
    expr = _rewrite_agg_spellings(expr)
    expr = _rewrite_varfns(expr)
    expr = _rewrite_fns(expr)
    # AFTER varfns/fns: DATE_TRUNC(1 day, ts) / DATE_DIFF span args
    # must be consumed by their handlers before the arithmetic pass
    expr = _rewrite_durations(expr)

    out = []
    pos = 0
    # SINGLE-quoted spans are SQL literals emitted by the rewriters
    # above (TO_IP's regex, SPLIT's escaped delimiter, …) and must
    # pass through VERBATIM — the ==→= substitution used to reach
    # inside them (self-review r10: SPLIT(s, "==") silently became
    # split on '=')
    for m in _LIT_RE.finditer(expr):
        outside = expr[pos:m.start()]
        out.append(re.sub(r"(?<![=!<>])==", "=", outside))
        if m.group(0).startswith("'"):
            out.append(m.group(0))
            pos = m.end()
            continue
        body = m.group(0)[1:-1].replace("\\\"", '"').replace("'", "''")
        if re.search(r"\bLIKE\s*$", outside, re.I):
            body = (
                body.replace("\\", "\\\\")
                .replace("%", "\\%")
                .replace("_", "\\_")
                .replace("*", "%")
                .replace("?", "_")
            )
            out.append(f"'{body}' ESCAPE '\\\\'")
        else:
            out.append(f"'{body}'")
        pos = m.end()
    out.append(re.sub(r"(?<![=!<>])==", "=", expr[pos:]))
    return "".join(out)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside quotes and any bracket nesting —
    ``()``, ``{}``, AND ``[]`` all protect their commas (an ES|QL
    options map like ``{"operator": "and", "boost": 2.5}`` is one
    argument, not three)."""
    parts, depth, cur = [], 0, []
    in_str: str | None = None  # the active quote char (" or ')
    escaped = False  # toggling flag: "…\\\\" closes, "…\\"" doesn't
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str is not None:
            cur.append(ch)
            if escaped:
                escaped = False
            elif ch == "\\" and in_str == '"':
                escaped = True
            elif ch == in_str:
                in_str = None
        elif ch in ('"', "'"):
            in_str = ch
            cur.append(ch)
        elif ch in "({[":
            depth += 1
            cur.append(ch)
        elif ch in ")}]":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


# the dotted-quad validity gate TO_IP/IP_PREFIX share, as a reusable
# SQL-literal fragment (4 backslashes here = `\\.` in the SQL string
# = a literal dot in the regex)
_IPV4_RE_SQL = (
    "'^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\\\.){3}"
    "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$'"
)

# ES|QL-only function names → Spark/ANSI SQL templates ({0} = the sole
# argument).  Null semantics follow ES|QL: every template yields NULL
# on a NULL input (size() alone would return -1 under Spark's legacy
# sizeOfNull, hence the CASE guard).
_FN_TEMPLATES = {
    "MV_COUNT": "(CASE WHEN {0} IS NULL THEN NULL ELSE size({0}) END)",
    "MV_MIN": "array_min({0})",
    "MV_MAX": "array_max({0})",
    "MV_SUM": "aggregate({0}, CAST(0.0 AS DOUBLE), (s, x) -> s + x)",
    "MV_AVG": (
        "(aggregate({0}, CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
        " / size({0}))"
    ),
    # multivalue helpers (ES|QL mv functions over array columns):
    # MV_SORT here is the 1-arg ascending form; MV_DEDUPE documents
    # no output order in ES — Spark's array_distinct keeps first
    # occurrence, so canonicalize with MV_SORT before comparing
    # cross-engine (the gate query does)
    "MV_SORT": "array_sort({0})",
    "MV_DEDUPE": "array_distinct({0})",
    "MV_FIRST": "try_element_at({0}, 1)",
    "MV_LAST": "try_element_at({0}, -1)",
    # MV_MEDIAN: exact interpolated median of the array's values as
    # DOUBLE (ES rounds toward zero for integer inputs — the S4
    # exactness stance applies: one numeric contract, documented);
    # empty/NULL arrays yield NULL
    "MV_MEDIAN": (
        "(CASE WHEN {0} IS NULL OR size({0}) = 0 THEN NULL ELSE"
        " (try_element_at(array_sort({0}), CAST((size({0}) + 1) div 2 AS INT))"
        " + try_element_at(array_sort({0}), CAST(size({0}) div 2 + 1 AS INT)))"
        # a bare `2.0` would be a DECIMAL literal in Spark SQL and
        # decimal-type the whole median — divide by a DOUBLE
        " / CAST(2.0 AS DOUBLE) END)"
    ),
    "TO_LONG": "CAST({0} AS BIGINT)",
    "TO_INTEGER": "CAST({0} AS INT)",
    "TO_DOUBLE": "CAST({0} AS DOUBLE)",
    "TO_STRING": "CAST({0} AS STRING)",
    "TO_DATETIME": "CAST({0} AS TIMESTAMP)",
    "TO_BOOLEAN": "CAST({0} AS BOOLEAN)",
    "TO_UPPER": "upper({0})",
    "TO_LOWER": "lower({0})",
    # zero-arg constant: the template never references {0}; E() and
    # PI() pass through to the Spark builtins of the same name
    "TAU": "(CAST(2.0 AS DOUBLE) * pi())",
    "TO_BASE64": "base64(CAST({0} AS BINARY))",
    "FROM_BASE64": "CAST(unbase64({0}) AS STRING)",
    # 8.17/8.18 string additions: BYTE_LENGTH is UTF-8 bytes (Spark's
    # octet_length); SHA256 spells Spark's two-arg sha2.  BIT_LENGTH /
    # MD5 / SHA1 / REPEAT / REVERSE / LEFT / RIGHT / LTRIM / RTRIM /
    # SPACE and the math family (ABS…TANH, CBRT, HYPOT, SIGNUM, LOG,
    # LOG10, EXP, POW, E, PI) pass through — Spark builtins of the
    # same name and semantics (S36 enumerates the full sweep)
    "BYTE_LENGTH": "octet_length({0})",
    "SHA256": "sha2({0}, 256)",
    "TO_RADIANS": "radians({0})",
    "TO_DEGREES": "degrees({0})",
    # MV_MEDIAN_ABSOLUTE_DEVIATION composes textually out of
    # MV_MEDIAN (the rewriter loop resolves the nested calls) —
    # median(|x − median(x)|), the robust dispersion ES's MAD agg
    # computes, exact here.  The inner median BINDS ONCE as a lambda
    # variable (transform over a 1-element array): HOF lambdas are
    # interpreted and excluded from subexpression elimination, so
    # inlining it into the per-element deviation would recompute a
    # sort PER ELEMENT — O(n² log n) per row, measured 25 s on the
    # sf0.1 gate before the binding (now 1 s)
    "MV_MEDIAN_ABSOLUTE_DEVIATION": (
        "try_element_at(transform(array(MV_MEDIAN({0})),"
        " _m -> MV_MEDIAN(transform({0},"
        " _v -> abs(CAST(_v AS DOUBLE) - _m)))), 1)"
    ),
    # ES|QL TO_DATE_NANOS — graduated from the S36 refusal list in
    # r14 under a DOCUMENTED TRUNCATION: ES's date_nanos is ns
    # precision, Spark/Arrow timestamps are µs, so every rendering
    # truncates sub-µs digits (toward zero; the gated corpus is
    # post-epoch where trunc == floor).  Type dispatch is a typeof()
    # CASE — constant-foldable per column, and the untaken branches
    # never evaluate, so the ANSI casts cannot throw cross-type:
    # a datetime passes through (ES parity), an integral is NANOS
    # since epoch div 1000, anything else parses as a date string
    # with the fraction regexp-trimmed to 6 digits first (Spark
    # rejects 7+ fractional digits where DuckDB would truncate —
    # the explicit trim makes both engines truncate identically).
    "TO_DATE_NANOS": (
        "(CASE WHEN typeof({0}) IN ('timestamp', 'timestamp_ntz')"
        " THEN CAST({0} AS TIMESTAMP)"
        " WHEN typeof({0}) IN ('bigint', 'int', 'smallint', 'tinyint')"
        " THEN timestamp_micros(CAST({0} AS BIGINT) div 1000)"
        " ELSE try_cast(regexp_replace(CAST({0} AS STRING),"
        " '(\\\\.[0-9]{6})[0-9]+', '$1') AS TIMESTAMP) END)"
    ),
    # ES|QL TO_IP: the engine stores ips as dotted-quad strings, so
    # the conversion is a validity gate — a malformed address yields
    # NULL (ES's on-error behavior), a valid one passes through
    "TO_IP": (
        "(CASE WHEN {0} RLIKE " + _IPV4_RE_SQL + " THEN {0} ELSE NULL END)"
    ),
    # ES|QL 8.18 CATEGORIZE(col) — the STATS BY log-categorization
    # key, same deterministic contract as aggs.categorize_text /
    # DIVERGENCES S17: the category is the message's sequence of
    # non-numeric tokens (digit-bearing tokens are variable
    # placeholders and drop); messages with no surviving tokens key
    # to NULL (ES's null bucket)
    "CATEGORIZE": (
        "nullif(array_join(filter(split(trim(lower({0})), '\\\\s+'), "
        "_t -> _t != '' AND NOT (_t rlike '[0-9]')), ' '), '')"
    ),
}


def _find_calls(
    expr: str, name: str, case_sensitive: bool = False
) -> list[tuple[int, int, int]]:
    """Every ``name(`` occurrence OUTSIDE string literals, as
    ``(match_start, open_paren, close_paren)`` with the close found by
    a quote-aware balanced scan — the one call-matching routine shared
    by the function rewriters, so a literal like ``"BUCKET(x)"``
    inside a WHERE string is never rewritten.  ``case_sensitive``
    restricts matching to the exact (uppercase ES|QL) spelling — used
    by rewriters whose name collides with a Spark builtin of
    DIFFERENT semantics (percentile's fraction arg, date_diff's 2-arg
    form, median's unrounded exactness), so the lowercase Spark
    spelling still passes through untouched.

    BOTH quote kinds are literal: user text carries double-quoted
    ES|QL strings, while earlier rewrite passes emit SINGLE-quoted
    SQL literals — a function name inside either must never match
    (self-review r10: MV_CONCAT(arr, "VALUES(x)") used to rewrite
    its own delimiter)."""
    out: list[tuple[int, int, int]] = []
    pat = re.compile(
        rf"\b{name}\s*\(", 0 if case_sensitive else re.I
    )
    in_str: str | None = None  # the active quote char, if any
    i = 0
    while i < len(expr):
        ch = expr[i]
        if in_str is not None:
            if ch == in_str and (in_str == "'" or expr[i - 1] != "\\"):
                in_str = None
            i += 1
            continue
        if ch in ('"', "'"):
            in_str = ch
            i += 1
            continue
        m = pat.match(expr, i)
        if not m:
            i += 1
            continue
        open_p = m.end() - 1
        depth, j = 0, open_p
        inner_str: str | None = None
        while j < len(expr):
            cj = expr[j]
            if inner_str is not None:
                if cj == inner_str and (
                    inner_str == "'" or expr[j - 1] != "\\"
                ):
                    inner_str = None
            elif cj in ('"', "'"):
                inner_str = cj
            elif cj == "(":
                depth += 1
            elif cj == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            # the balanced scan exhausted the string — malformed input
            # like "BUCKET(ts, 1 hour"; rewriting to end-of-string
            # would silently mangle the expression (ADVICE r9)
            raise ValueError(
                f"unbalanced parentheses in {name}() call: {expr!r}"
            )
        out.append((m.start(), open_p, j))
        i = m.end()
    return out


def _rewrite_fns(expr: str) -> str:
    """Rewrite known single-argument ES|QL function calls to their SQL
    templates, innermost-first, respecting quotes and nested parens."""
    changed = True
    while changed:
        changed = False
        for fn, tpl in _FN_TEMPLATES.items():
            for start, open_p, close_p in _find_calls(expr, fn):
                arg = expr[open_p + 1:close_p]
                # quote-aware inner-call detection (a template name
                # inside a string literal is NOT an inner call)
                if any(_find_calls(arg, f) for f in _FN_TEMPLATES):
                    continue  # rewrite the inner call first
                if "{0}" not in tpl and arg.strip():
                    # a zero-arg constant (TAU()) must not silently
                    # SWALLOW an argument — a typo'd TAU(price) would
                    # otherwise become a constant, not an error
                    raise ValueError(f"{fn} takes no arguments")
                # templates only ever reference {0}; str.format would
                # choke on brace characters inside the user expression
                # (e.g. a "{" string literal), so substitute literally
                expr = (
                    expr[:start] + tpl.replace("{0}", arg)
                    + expr[close_p + 1:]
                )
                changed = True
                break
            if changed:
                break
    return expr


# time spans BUCKET understands, in exact epoch microseconds
_BUCKET_SPAN_US = {
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def _rewrite_bucket(expr: str) -> str:
    """ES|QL ``BUCKET(col, N unit)`` (the canonical time-series
    grouping function) → exact epoch-microsecond FLOOR arithmetic:
    ``timestamp_micros(unix_micros(col) - pmod(unix_micros(col),
    span))`` — pmod, not ``div``, because div truncates toward zero
    and would place a pre-1970 timestamp in the bucket AFTER it; this
    is the same floor contract the TSDB downsample operator carries
    (aggs.py), so buckets are engine-exact.  Calls are located with
    the shared literal-aware scanner, so a ``"BUCKET(...)"`` inside a
    string literal is never rewritten.  The span is a time literal
    (``1 hour``, ``30 minutes``) or the same in quotes; the numeric
    auto-bucketing form (4 args) is not supported and raises."""
    while True:
        calls = _find_calls(expr, "BUCKET")
        if not calls:
            return expr
        start, open_p, close_p = calls[0]
        inner = expr[open_p + 1:close_p]
        parts = _split_top(inner, ",")
        if len(parts) != 2:
            raise ValueError(
                "BUCKET takes (column, time span) — the 4-argument "
                "numeric auto-bucketing form is not supported"
            )
        col = parts[0].strip()
        sm = re.match(
            r'^\s*"?\s*(\d+)\s+([A-Za-z]+?)s?\s*"?\s*$', parts[1].strip()
        )
        if not sm or sm.group(2).lower() not in _BUCKET_SPAN_US:
            raise ValueError(f"unsupported BUCKET span: {parts[1]!r}")
        span = int(sm.group(1)) * _BUCKET_SPAN_US[sm.group(2).lower()]
        repl = (
            f"timestamp_micros(unix_micros({col}) "
            f"- pmod(unix_micros({col}), {span}))"
        )
        expr = expr[:start] + repl + expr[close_p + 1:]


def _split_kw_all(s: str, word: str) -> list[str]:
    """Repeated :func:`_split_kw`: ALL top-level occurrences of the
    keyword (outside quotes/parens), left to right."""
    out: list[str] = []
    rest = s
    while True:
        parts = _split_kw(rest, word)
        if len(parts) == 1:
            out.append(rest)
            return out
        out.append(parts[0])
        rest = parts[1]


def _apply_where(df: DataFrame, body: str):
    """WHERE stage.  The one non-SQL clause form is ES|QL 8.18's
    ``QSTR("lucene query")`` — the full Lucene query-bar grammar —
    which compiles through the engine's query_string parser →
    bool-query machinery (analyzers, fuzzy vocabulary path, ranges,
    wildcards all inherited) against the ``text`` default field.
    QSTR composes with other predicates under top-level AND only
    (each conjunct applies as its own filter — same result, and the
    SQL conjuncts still push to the scan); OR/NOT around QSTR raises
    with guidance, since the bool compiler, not SQL text, owns that
    tree."""
    if not _find_calls(body, "QSTR"):
        return df.filter(F.expr(_tr_expr(body)))
    from monstache_spark.operators.querystring import query_string_filter

    # ANY top-level OR in a QSTR-bearing clause is refused — splitting
    # on AND alone would silently rebind precedence (QSTR(..) AND x OR
    # y would compute QSTR AND (x OR y) instead of (QSTR AND x) OR y)
    if len(_split_kw_all(body, "OR")) > 1:
        raise ValueError(
            "QSTR() composes only under top-level AND — wrap OR/"
            "NOT logic inside the Lucene query string itself"
        )
    for part in _split_kw_all(body, "AND"):
        part = part.strip()
        calls = _find_calls(part, "QSTR")
        if not calls:
            df = df.filter(F.expr(_tr_expr(part)))
            continue
        start, open_p, close_p = calls[0]
        if start != 0 or close_p != len(part) - 1:
            raise ValueError(
                "QSTR() composes only under top-level AND — wrap OR/"
                "NOT logic inside the Lucene query string itself"
            )
        qm = re.fullmatch(
            r'\s*"((?:[^"\\]|\\.)*)"\s*', part[open_p + 1:close_p]
        )
        if not qm:
            raise ValueError("QSTR takes one string literal")
        df = query_string_filter(df, qm.group(1).replace('\\"', '"'))
    return df


# ES|QL DATE_EXTRACT ChronoField names → Spark SQL functions returning
# the same integers (day_of_week is ISO: 1=Monday..7=Sunday — Spark's
# weekday() is 0=Monday, hence the +1)
_DATE_EXTRACT_SQL = {
    "year": "year({0})",
    "month_of_year": "month({0})",
    "day_of_month": "day({0})",
    "hour_of_day": "hour({0})",
    "minute_of_hour": "minute({0})",
    "second_of_minute": "second({0})",
    "day_of_week": "(weekday({0}) + 1)",
    "day_of_year": "dayofyear({0})",
}


def _rewrite_agg_spellings(expr: str) -> str:
    """ES|QL aggregate spellings, CASE-SENSITIVE (lowercase
    count/median stay Spark builtins):

    * ``COUNT_DISTINCT(col [, precision_threshold])`` → EXACT
      ``count(DISTINCT col)`` per the S3 contract (ES runs HLL); the
      documented 2-arg precision form is accepted and the threshold
      IGNORED — exactness supersedes it (the knn num_candidates
      stance);
    * ``MEDIAN(col)`` → the exact interpolated percentile rounded at
      6 dp per S4 (ES runs t-digest) — emitted lowercase, so the
      case-sensitive scan never re-enters its own output."""
    for name in ("COUNT_DISTINCT", "MEDIAN"):
        for start, open_p, close_p in reversed(
            _find_calls(expr, name, case_sensitive=True)
        ):
            parts = _split_top(expr[open_p + 1:close_p], ",")
            if name == "MEDIAN":
                if len(parts) != 1:
                    raise ValueError("MEDIAN takes one column")
                repl = f"round(percentile({parts[0].strip()}, 0.5), 6)"
            else:
                if len(parts) not in (1, 2):
                    raise ValueError(
                        "COUNT_DISTINCT takes (column"
                        " [, precision_threshold])"
                    )
                # 2-arg: the threshold is HLL tuning — ignored, the
                # exact count needs none
                repl = f"count(DISTINCT {parts[0].strip()})"
            expr = expr[:start] + repl + expr[close_p + 1:]
    return expr


def _h_case(args: list[str]) -> str:
    """ES|QL ``CASE(cond1, val1, [cond2, val2, …][, default])`` —
    the function-form conditional → SQL ``CASE WHEN`` (no default →
    NULL, as ES|QL documents)."""
    if len(args) < 2:
        raise ValueError("CASE takes (cond, value, ..., [default])")
    out = ["(CASE"]
    i = 0
    while i + 1 < len(args):
        out.append(f" WHEN {args[i]} THEN {args[i + 1]}")
        i += 2
    if i < len(args):
        out.append(f" ELSE {args[i]}")
    out.append(" END)")
    return "".join(out)


def _h_split(args: list[str]) -> str:
    """ES|QL ``SPLIT(string, delimiter)`` splits on a LITERAL
    delimiter; Spark's ``split`` takes a regex — the literal is
    regex-escaped at rewrite time, so it must be a string literal
    (a column-valued delimiter cannot be escaped structurally)."""
    if len(args) != 2:
        raise ValueError("SPLIT takes (string, delimiter)")
    m = re.fullmatch(r'\s*"((?:[^"\\]|\\.)*)"\s*', args[1])
    if not m:
        raise ValueError(
            "SPLIT delimiter must be a string literal (it is regex-"
            "escaped at rewrite time; use EVAL with split() for a "
            "regex delimiter)"
        )
    raw = m.group(1).replace('\\"', '"')
    # re.escape → regex metachars neutralized; the Spark SQL string
    # literal then needs its own backslash doubling + quote escaping
    lit = re.escape(raw).replace("\\", "\\\\").replace("'", "''")
    return f"split({args[0].strip()}, '{lit}')"


def _h_locate(args: list[str]) -> str:
    """ES|QL ``LOCATE(string, substring [, start])`` — Spark's
    ``locate`` takes (substring, string [, pos]): swap."""
    if len(args) == 2:
        return f"locate({args[1].strip()}, {args[0].strip()})"
    if len(args) == 3:
        return (
            f"locate({args[1].strip()}, {args[0].strip()},"
            f" {args[2].strip()})"
        )
    raise ValueError("LOCATE takes (string, substring [, start])")


def _h_date_format(args: list[str]) -> str:
    """ES|QL ``DATE_FORMAT(format, date)`` — format FIRST, the
    reverse of Spark's ``date_format(date, format)``.  The 1-arg
    default-format form raises: ES's default renders the index
    mapping's format, state this engine does not carry."""
    if len(args) != 2:
        raise ValueError(
            "DATE_FORMAT takes (format, date) — the 1-arg default-"
            "format form depends on the ES index mapping; pass the "
            "format explicitly"
        )
    return f"date_format({args[1].strip()}, {args[0].strip()})"


def _h_date_parse(args: list[str]) -> str:
    """ES|QL ``DATE_PARSE(format, string)`` → Spark
    ``to_timestamp(string, format)`` (both use java.time patterns)."""
    if len(args) != 2:
        raise ValueError("DATE_PARSE takes (format, string)")
    return f"to_timestamp({args[1].strip()}, {args[0].strip()})"


# calendar units DATE_TRUNC can only truncate at multiplier 1, via
# Spark/DuckDB date_trunc (UTC session timezone makes them exact)
_CAL_TRUNC_UNITS = {"week", "month", "quarter", "year"}


def _h_date_trunc(args: list[str]) -> str:
    """ES|QL ``DATE_TRUNC(interval, date)`` — interval is a time
    span literal (``1 day``, ``3 hours``, ``1 month``).  Fixed-width
    units floor by exact epoch-microsecond pmod (the BUCKET
    contract — UTC, pre-1970 correct, any multiplier); calendar
    units (week/month/quarter/year) truncate via ``date_trunc`` and
    admit only multiplier 1 (an "every 3 months" floor is BUCKET's
    4-arg territory, unsupported)."""
    if len(args) != 2:
        raise ValueError("DATE_TRUNC takes (interval, date)")
    sm = re.fullmatch(
        r'\s*"?\s*(\d+)\s+([A-Za-z]+?)s?\s*"?\s*', args[0]
    )
    if not sm:
        raise ValueError(f"unsupported DATE_TRUNC interval: {args[0]!r}")
    n, unit = int(sm.group(1)), sm.group(2).lower()
    col = args[1].strip()
    if unit in _BUCKET_SPAN_US and unit != "week":
        span = n * _BUCKET_SPAN_US[unit]
        return (
            f"timestamp_micros(unix_micros({col}) "
            f"- pmod(unix_micros({col}), {span}))"
        )
    if unit in _CAL_TRUNC_UNITS:
        if n != 1:
            raise ValueError(
                f"DATE_TRUNC calendar unit {unit!r} admits only "
                "multiplier 1 (epoch pmod would misplace calendar "
                "boundaries)"
            )
        return f"date_trunc('{unit}', {col})"
    raise ValueError(f"unsupported DATE_TRUNC unit: {unit!r}")


def _h_top(args: list[str]) -> str:
    """ES|QL ``TOP(col, limit, "asc"|"desc")`` aggregate — the top
    ``limit`` values as an array.  Nulls are ignored (collect_list
    skips them), ties keep every copy — exactly ES's contract."""
    if len(args) != 3:
        raise ValueError('TOP takes (column, limit, "asc"|"desc")')
    col = args[0].strip()
    lm = re.fullmatch(r"\s*(\d+)\s*", args[1])
    if not lm:
        raise ValueError(f"TOP limit must be an integer literal: {args[1]!r}")
    om = re.fullmatch(r'\s*"(asc|desc)"\s*', args[2], re.I)
    if not om:
        raise ValueError(f'TOP order must be "asc" or "desc": {args[2]!r}')
    body = f"array_sort(collect_list({col}))"
    if om.group(1).lower() == "desc":
        body = f"reverse({body})"
    return f"slice({body}, 1, {int(lm.group(1))})"


def _h_values(args: list[str]) -> str:
    """ES|QL ``VALUES(col)`` aggregate — the distinct values as an
    array.  ES documents NO output order; emitted SORTED so the
    result is deterministic on any engine and partitioning (the
    MV_DEDUPE canonicalization stance)."""
    if len(args) != 1:
        raise ValueError("VALUES takes one column")
    return f"array_sort(collect_set({args[0].strip()}))"


def _h_weighted_avg(args: list[str]) -> str:
    """ES|QL ``WEIGHTED_AVG(value, weight)`` → Σvw/Σw with BOTH sums
    accumulated in exact decimal (order-independent across any
    partitioning — a double sum is not), divided as doubles and
    rounded 6 dp (the S11 contract class).  The weight sum is gated
    on the VALUE being non-null — ES skips documents missing the
    value entirely (self-review r10: an ungated Σw silently diluted
    the average)."""
    if len(args) != 2:
        raise ValueError("WEIGHTED_AVG takes (value, weight)")
    v, w = args[0].strip(), args[1].strip()
    return (
        f"round(CAST(sum(CAST({v} AS DECIMAL(18,6))"
        f" * CAST({w} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / CAST(sum(CASE WHEN {v} IS NOT NULL"
        f" THEN CAST({w} AS DECIMAL(18,6)) END) AS DOUBLE), 6)"
    )


def _h_std_dev(args: list[str]) -> str:
    """ES|QL ``STD_DEV(col)`` → POPULATION standard deviation (ES's
    extended_stats convention) from exact-decimal moment sums:
    ``sqrt(Σx²/n − (Σx/n)²)`` — the decimal sums are partition-order
    independent, the double arithmetic after them is one fixed IEEE
    expression tree on both engines; ``greatest(0)`` guards the
    rounding-epsilon-negative variance; rounded 6 dp (S11 class)."""
    if len(args) != 1:
        raise ValueError("STD_DEV takes one column")
    c = args[0].strip()
    return (
        f"round(sqrt(greatest(CAST(0.0 AS DOUBLE),"
        f" CAST(sum(CAST({c} AS DECIMAL(18,6))"
        f" * CAST({c} AS DECIMAL(18,6))) AS DOUBLE) / count({c})"
        f" - power(CAST(sum(CAST({c} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count({c}), 2))), 6)"
    )


def _str_lit_arg(arg: str, what: str) -> str:
    """A double-quoted ES|QL string literal argument → a single-quoted
    SQL literal (raises if not a literal — handlers that must escape
    or embed the value structurally cannot take a column)."""
    m = re.fullmatch(r'\s*"((?:[^"\\]|\\.)*)"\s*', arg)
    if not m:
        raise ValueError(f"{what} must be a string literal: {arg!r}")
    raw = m.group(1).replace('\\"', '"')
    return "'" + raw.replace("\\", "\\\\").replace("'", "''") + "'"


def _h_mv_zip(args: list[str]) -> str:
    """ES|QL ``MV_ZIP(a, b [, delim=","])`` — pairwise join of two
    multivalues; where one side is longer, the leftover values pass
    through alone (concat_ws skips the NULL the shorter side pads
    with — exactly ES's documented behavior)."""
    if len(args) not in (2, 3):
        raise ValueError('MV_ZIP takes (mv1, mv2 [, delimiter])')
    delim = _str_lit_arg(args[2], "MV_ZIP delimiter") if len(args) == 3 \
        else "','"
    return (
        f"zip_with({args[0].strip()}, {args[1].strip()},"
        f" (_x, _y) -> concat_ws({delim}, _x, _y))"
    )


def _h_mv_slice(args: list[str]) -> str:
    """ES|QL ``MV_SLICE(col, start [, end])`` — 0-based INCLUSIVE
    bounds, negatives count from the end.  Bounds must be integer
    literals of the SAME sign (a mixed-sign slice needs the runtime
    length; pass size() arithmetic through EVAL instead)."""
    if len(args) not in (2, 3):
        raise ValueError("MV_SLICE takes (col, start [, end])")
    col = args[0].strip()
    try:
        s = int(args[1])
        e = int(args[2]) if len(args) == 3 else s
    except ValueError:
        raise ValueError("MV_SLICE bounds must be integer literals")
    if e < s:
        raise ValueError(f"MV_SLICE end {e} < start {s}")
    if (s < 0) != (e < 0):
        raise ValueError(
            "MV_SLICE bounds must share a sign (mixed-sign slices "
            "need the runtime length — use EVAL with slice()/size())"
        )
    start = s + 1 if s >= 0 else s  # Spark slice: 1-based, or from end
    return f"slice({col}, {start}, {e - s + 1})"


def _h_mv_percentile(args: list[str]) -> str:
    """ES|QL ``MV_PERCENTILE(col, p)`` — the exact interpolated
    percentile of the array's values (p a literal in 0..100), the S4
    contract applied to multivalues (ES runs t-digest); rounded 6 dp.
    The linear-interpolation rank is (n−1)·p/100; the upper index
    clamps to n so an integral rank's zero-weight term never reads
    out of bounds."""
    if len(args) != 2:
        raise ValueError("MV_PERCENTILE takes (col, p)")
    pm = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*", args[1])
    if not pm or not 0 <= float(pm.group(1)) <= 100:
        raise ValueError(
            f"MV_PERCENTILE p must be a literal in 0..100: {args[1]!r}"
        )
    p = repr(float(pm.group(1)) / 100.0)
    col = args[0].strip()
    s = f"array_sort({col})"
    pos = f"(CAST(size({col}) - 1 AS DOUBLE) * {p})"
    lo = f"CAST(floor({pos}) AS INT)"
    return (
        f"(CASE WHEN {col} IS NULL OR size({col}) = 0 THEN NULL ELSE"
        f" round(CAST(element_at({s}, {lo} + 1) AS DOUBLE)"
        f" + (CAST(element_at({s}, least({lo} + 2, size({col}))) AS DOUBLE)"
        f" - CAST(element_at({s}, {lo} + 1) AS DOUBLE))"
        f" * ({pos} - floor({pos})), 6) END)"
    )


def _h_mv_pseries(args: list[str]) -> str:
    """ES|QL ``MV_PSERIES_WEIGHTED_SUM(col, p)`` — Σ vᵢ/(i+1)ᵖ over
    the multivalue sorted DESCENDING (the rank-weighted score ES
    computes for converting a multivalue into a relevance signal); p
    a numeric literal; rounded 6 dp (S11 class).  One indexed
    transform + one fold — linear HOF work."""
    if len(args) != 2:
        raise ValueError("MV_PSERIES_WEIGHTED_SUM takes (col, p)")
    pm = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*", args[1])
    if not pm:
        raise ValueError(
            f"MV_PSERIES_WEIGHTED_SUM p must be a numeric literal: "
            f"{args[1]!r}"
        )
    p = repr(float(pm.group(1)))
    col = args[0].strip()
    return (
        f"(CASE WHEN {col} IS NULL THEN NULL ELSE"
        f" round(aggregate(transform(reverse(array_sort({col})),"
        f" (_v, _i) -> CAST(_v AS DOUBLE)"
        f" / power(CAST(_i + 1 AS DOUBLE), {p})),"
        f" CAST(0.0 AS DOUBLE), (_a, _x) -> _a + _x), 6) END)"
    )


def _h_ip_prefix(args: list[str]) -> str:
    """ES|QL ``IP_PREFIX(ip, prefix_v4, prefix_v6)`` — keep the top
    ``prefix_v4`` bits of a dotted-quad address and zero the rest
    (the network address, rendered back as dotted quad).  IPv4 only,
    like every ip operator in the engine (the v6 length is accepted
    for API parity and ignored — documented); malformed/NULL
    addresses yield NULL (the TO_IP gate guards the casts, which
    matters under ANSI mode)."""
    if len(args) != 3:
        raise ValueError("IP_PREFIX takes (ip, prefix_v4, prefix_v6)")
    col = args[0].strip()
    m4 = re.fullmatch(r"\s*(\d+)\s*", args[1])
    m6 = re.fullmatch(r"\s*(\d+)\s*", args[2])
    if not m4 or not m6 or int(m4.group(1)) > 32 or int(m6.group(1)) > 128:
        raise ValueError(
            f"IP_PREFIX lengths must be integer literals (v4 <= 32, "
            f"v6 <= 128): {args[1]!r}, {args[2]!r}"
        )
    bits = int(m4.group(1))
    # lambda-bound like CIDR_MATCH: a textual expansion would repeat
    # the dotted-quad split parse at every reference (masked uses
    # addr twice, the quad rendering uses masked four times — ~32
    # split calls per row, each re-inlining an EVAL'd argument);
    # binding through nested single-element transforms evaluates the
    # string, the parse, and the mask exactly once
    addr = (
        "(CAST(split(__ip_s, '\\\\.')[0] AS BIGINT) * 16777216"
        " + CAST(split(__ip_s, '\\\\.')[1] AS BIGINT) * 65536"
        " + CAST(split(__ip_s, '\\\\.')[2] AS BIGINT) * 256"
        " + CAST(split(__ip_s, '\\\\.')[3] AS BIGINT))"
    )
    masked = (
        "__ip_a" if bits == 32
        else f"(__ip_a - pmod(__ip_a, {1 << (32 - bits)}))"
    )
    quad = (
        "concat(CAST(__ip_m div 16777216 AS STRING), '.',"
        " CAST(pmod(__ip_m div 65536, 256) AS STRING), '.',"
        " CAST(pmod(__ip_m div 256, 256) AS STRING), '.',"
        " CAST(pmod(__ip_m, 256) AS STRING))"
    )
    return (
        f"element_at(transform(array({col}), __ip_s -> "
        f"CASE WHEN __ip_s RLIKE {_IPV4_RE_SQL} THEN "
        f"element_at(transform(array({addr}), __ip_a -> "
        f"element_at(transform(array({masked}), __ip_m -> {quad}), 1)"
        f"), 1) ELSE NULL END), 1)"
    )


# multi-argument ES|QL functions → handlers.  case=True entries
# collide with a Spark builtin of DIFFERENT semantics or argument
# order (SPLIT regex-vs-literal delimiter, REPLACE literal-vs-regex,
# LOCATE/DATE_FORMAT/DATE_TRUNC argument order) — only the uppercase
# ES|QL spelling rewrites; the lowercase Spark spelling passes
# through untouched (the PERCENTILE contract).
def _h_hash(args: list[str]) -> str:
    if len(args) != 2:
        raise ValueError("HASH takes (algorithm, input)")
    alg_lit = _str_lit_arg(args[0], "HASH algorithm")
    alg = alg_lit[1:-1].lower()
    inp = args[1].strip()
    if alg == "md5":
        return f"md5({inp})"
    if alg == "sha1":
        return f"sha1({inp})"
    if alg in ("sha256", "sha-256"):
        return f"sha2({inp}, 256)"
    raise ValueError(
        f"HASH algorithm must be md5/sha1/sha256, got {alg!r} "
        "(ES's full MessageDigest set is JVM-deployment-dependent)"
    )


def _h_round_to(args: list[str]) -> str:
    """ES|QL 9.x ROUND_TO(field, p1 [, p2, …]) — rounds DOWN to the
    greatest of the fixed points that is ≤ the value (the custom-
    histogram bucketing the ES docs describe); a value below every
    point clamps to the SMALLEST point, NULL propagates.  The field
    expression BINDS ONCE as a lambda variable (the MV_MAD trick —
    an expensive arg would otherwise re-evaluate per reference), the
    points sort at runtime so non-literal point expressions are
    legal, and everything stays one codegen-free but JVM-side HOF
    projection — no UDF, engine-exact."""
    if len(args) < 2:
        raise ValueError("ROUND_TO takes (field, p1 [, p2, ...])")
    v = args[0].strip()
    pts = ", ".join(a.strip() for a in args[1:])
    return (
        f"try_element_at(transform(array({v}), _v ->"
        " CASE WHEN _v IS NULL THEN NULL ELSE coalesce("
        f"try_element_at(filter(array_sort(array({pts})),"
        " _p -> _p <= _v), -1),"
        f" array_min(array({pts}))) END), 1)"
    )


_VARFNS: dict[str, tuple[bool, "callable"]] = {
    "CASE": (False, _h_case),
    "ROUND_TO": (False, _h_round_to),
    "SPLIT": (True, _h_split),
    # ES|QL REPLACE(string, regex, new) is a REGEX replace; Spark's
    # replace is literal — route to regexp_replace
    "REPLACE": (
        True,
        lambda a: (
            f"regexp_replace({a[0].strip()}, {a[1].strip()},"
            f" {a[2].strip()})"
            if len(a) == 3
            else (_ for _ in ()).throw(
                ValueError("REPLACE takes (string, regex, new)")
            )
        ),
    ),
    "LOCATE": (True, _h_locate),
    "STARTS_WITH": (
        False,
        lambda a: f"startswith({a[0].strip()}, {a[1].strip()})"
        if len(a) == 2
        else (_ for _ in ()).throw(
            ValueError("STARTS_WITH takes (string, prefix)")
        ),
    ),
    "ENDS_WITH": (
        False,
        lambda a: f"endswith({a[0].strip()}, {a[1].strip()})"
        if len(a) == 2
        else (_ for _ in ()).throw(
            ValueError("ENDS_WITH takes (string, suffix)")
        ),
    ),
    "DATE_FORMAT": (True, _h_date_format),
    "DATE_PARSE": (False, _h_date_parse),
    "DATE_TRUNC": (True, _h_date_trunc),
    "TOP": (False, _h_top),
    "VALUES": (False, _h_values),
    "WEIGHTED_AVG": (False, _h_weighted_avg),
    "STD_DEV": (False, _h_std_dev),
    "MV_APPEND": (
        False,
        lambda a: f"concat({a[0].strip()}, {a[1].strip()})"
        if len(a) == 2
        else (_ for _ in ()).throw(
            ValueError("MV_APPEND takes (mv1, mv2)")
        ),
    ),
    "MV_CONCAT": (
        False,
        lambda a: (
            f"array_join({a[0].strip()},"
            f" {_str_lit_arg(a[1], 'MV_CONCAT delimiter')})"
        )
        if len(a) == 2
        else (_ for _ in ()).throw(
            ValueError("MV_CONCAT takes (mv, delimiter)")
        ),
    ),
    "MV_ZIP": (False, _h_mv_zip),
    "MV_SLICE": (False, _h_mv_slice),
    "MV_PERCENTILE": (False, _h_mv_percentile),
    "MV_PSERIES_WEIGHTED_SUM": (False, _h_mv_pseries),
    "IP_PREFIX": (False, _h_ip_prefix),
    # ES|QL 8.18 HASH(alg, input): the algorithm must be a string
    # LITERAL (a per-row algorithm column would select a different
    # function per row — no columnar plan); md5/sha1/sha256 are the
    # cross-engine-stable subset.  CASE-SENSITIVE: Spark's lowercase
    # hash() builtin (murmur3, variadic) must keep passing through
    # (self-review r11 pass 1)
    "HASH": (True, _h_hash),
    # 8.17 TERM(field, value): the non-scoring exact-term filter —
    # an equality on the keyword value (the engine's keyword columns
    # are unanalyzed, exactly the term-query contract)
    "TERM": (
        True,
        lambda a: f"({a[0].strip()} = {a[1].strip()})"
        if len(a) == 2
        else (_ for _ in ()).throw(
            ValueError("TERM takes (field, value)")
        ),
    ),
}


_LIKE_LIST_RE = re.compile(
    r'([A-Za-z_][\w.]*)\s+(NOT\s+)?(R?LIKE)\s*\(\s*'
    r'("(?:[^"\\]|\\.)*"(?:\s*,\s*"(?:[^"\\]|\\.)*")*)\s*\)',
    re.I,
)


def _outside_literal(expr: str, pos: int) -> bool:
    """True when ``pos`` sits outside every double-quoted literal.
    Spans come from the proper literal regex (escape-correct — a
    quote-parity walk would miscount ``\\\\"``); the caller runs
    BEFORE any rewriter emits single-quoted SQL, so double-quoted
    user literals are the only kind in play."""
    for m in re.finditer(r'"(?:[^"\\]|\\.)*"', expr):
        if m.start() <= pos < m.end():
            return False
        if m.start() > pos:
            break
    return True


def _rewrite_like_lists(expr: str) -> str:
    """ES|QL 8.16+ pattern LISTS: ``field LIKE ("a*", "b*")`` matches
    ANY pattern (``NOT LIKE`` list = none of them); same for RLIKE.
    Expanded to an OR chain of single-pattern predicates, each then
    riding the normal LIKE wildcard translation.  The left operand
    must be a bare field name — bind a complex operand with EVAL
    first."""
    while True:
        m = None
        for cand in _LIKE_LIST_RE.finditer(expr):
            if _outside_literal(expr, cand.start()):
                m = cand
                break
        if m is None:
            return expr
        operand, neg, op = m.group(1), m.group(2), m.group(3).upper()
        pats = re.findall(r'"(?:[^"\\]|\\.)*"', m.group(4))
        chain = " OR ".join(f"{operand} {op} {p}" for p in pats)
        repl = f"(NOT ({chain}))" if neg else f"({chain})"
        expr = expr[:m.start()] + repl + expr[m.end():]


def _rewrite_varfns(expr: str) -> str:
    """Rewrite the multi-argument ES|QL functions in ``_VARFNS``,
    OUTERMOST-first with a rescan after every rewrite (handlers copy
    argument text verbatim, so an inner call re-surfaces in the
    emitted text and the next pass picks it up — nested and
    same-name-nested calls both converge).  Every handler emits only
    lowercase Spark spellings / SQL keywords that the scan cannot
    re-match, so the fixpoint loop terminates."""
    changed = True
    done: set[tuple[str, int]] = set()
    while changed:
        changed = False
        for fn, (case_sensitive, handler) in _VARFNS.items():
            calls = _find_calls(expr, fn, case_sensitive=case_sensitive)
            for start, open_p, close_p in calls:
                if (fn, start) in done:
                    continue
                # Spark's simple-CASE form with a parenthesized
                # operand — `CASE (v) WHEN 1 THEN …` — is documented
                # pass-through SQL, not the ES|QL CASE function
                # (self-review r10); leave it untouched
                if fn == "CASE" and re.match(
                    r"\s*WHEN\b", expr[close_p + 1:], re.I
                ):
                    done.add((fn, start))
                    continue
                args = _split_top(expr[open_p + 1:close_p], ",")
                expr = expr[:start] + handler(args) + expr[close_p + 1:]
                changed = True
                done.clear()  # offsets shifted; skip-keys are stale
                break
            if changed:
                break
    return expr


def _rewrite_percentile(expr: str) -> str:
    """ES|QL ``PERCENTILE(col, p)`` (p in 0..100) → the S4 exact
    contract: ``round(percentile(col, p/100), 6)`` — exact
    interpolated percentiles where ES runs t-digest, the established
    value_percentiles parity shape.  p must be a numeric literal.

    ONE right-to-left pass (replacements never shift earlier
    offsets): the emitted text contains the case-insensitively-
    matching ``percentile(`` itself, so a rescan-until-fixpoint loop
    would re-enter its own output."""
    calls = _find_calls(expr, "PERCENTILE", case_sensitive=True)
    for (s1, _, e1), (s2, _, _) in zip(calls, calls[1:]):
        if s2 < e1:
            raise ValueError("nested PERCENTILE calls are unsupported")
    for start, open_p, close_p in reversed(calls):
        parts = _split_top(expr[open_p + 1:close_p], ",")
        if len(parts) != 2:
            raise ValueError("PERCENTILE takes (column, p)")
        pm = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*", parts[1])
        if not pm or not 0 <= float(pm.group(1)) <= 100:
            raise ValueError(
                f"PERCENTILE p must be a literal in 0..100: {parts[1]!r}"
            )
        frac = repr(float(pm.group(1)) / 100.0)
        repl = f"round(percentile({parts[0].strip()}, {frac}), 6)"
        expr = expr[:start] + repl + expr[close_p + 1:]
    return expr


def _rewrite_date_diff(expr: str) -> str:
    """ES|QL ``DATE_DIFF("unit", start, end)`` → exact integer
    microsecond arithmetic: ``(unix_micros(end) − unix_micros(start))
    div unit_us`` — ChronoUnit.between's complete-units-truncated-
    toward-zero semantics (both engines' integral division truncates
    toward zero, verified).  Time-based units only (the shared
    ``_BUCKET_SPAN_US`` table — one unit→µs map for BUCKET and
    DATE_DIFF); calendar units (month/quarter/year) have no
    closed-form microsecond width and raise with guidance.
    CASE-SENSITIVE (uppercase = the ES|QL spelling): lowercase
    ``date_diff(end, start)`` stays Spark's 2-arg builtin."""
    while True:
        calls = _find_calls(expr, "DATE_DIFF", case_sensitive=True)
        if not calls:
            return expr
        start, open_p, close_p = calls[0]
        parts = _split_top(expr[open_p + 1:close_p], ",")
        if len(parts) != 3:
            raise ValueError('DATE_DIFF takes ("unit", start, end)')
        um = re.fullmatch(r'\s*"([A-Za-z]+?)s?"\s*', parts[0])
        unit = um.group(1).lower() if um else None
        if unit not in _BUCKET_SPAN_US:
            raise ValueError(
                f"DATE_DIFF unit must be one of {sorted(_BUCKET_SPAN_US)} "
                f"(calendar units have no fixed microsecond width), "
                f"got {parts[0].strip()!r}"
            )
        a, b = parts[1].strip(), parts[2].strip()
        repl = (
            f"((unix_micros({b}) - unix_micros({a})) "
            f"div {_BUCKET_SPAN_US[unit]})"
        )
        expr = expr[:start] + repl + expr[close_p + 1:]


def _rewrite_date_extract(expr: str) -> str:
    """ES|QL ``DATE_EXTRACT("chrono_field", ts)`` → the matching Spark
    date function, CAST to BIGINT (ES|QL returns long).  The supported
    ChronoField subset is the cross-engine-exact one (integer calendar
    fields); others raise."""
    while True:
        calls = _find_calls(expr, "DATE_EXTRACT")
        if not calls:
            return expr
        start, open_p, close_p = calls[0]
        parts = _split_top(expr[open_p + 1:close_p], ",")
        if len(parts) != 2:
            raise ValueError('DATE_EXTRACT takes ("field", ts)')
        fm = re.fullmatch(r'\s*"([A-Za-z_]+)"\s*', parts[0])
        field = fm.group(1).lower() if fm else None
        if field not in _DATE_EXTRACT_SQL:
            raise ValueError(
                f"DATE_EXTRACT field must be one of "
                f"{sorted(_DATE_EXTRACT_SQL)}, got {parts[0].strip()!r}"
            )
        body = _DATE_EXTRACT_SQL[field].replace("{0}", parts[1].strip())
        expr = expr[:start] + f"CAST({body} AS BIGINT)" + expr[close_p + 1:]


def _rewrite_cidr_match(expr: str) -> str:
    """ES|QL ``CIDR_MATCH(ip, "a.b.c.d/n", ...)`` → pure integer
    range tests: each CIDR block's [lo, hi) bounds compute at REWRITE
    time (Python — the same mask arithmetic as aggs.ip_range_agg) and
    the dotted-quad column parses to a BIGINT, so membership is
    engine-exact integer comparisons OR-chained across blocks.  NULL
    or non-numeric ips yield NULL (row filtered in WHERE).  IPv4
    only, like the ip aggregations (documented there).

    The ip argument and its BIGINT parse are bound ONCE through
    lambda variables (``exists(transform(array(ip), s -> addr), a ->
    ranges)``) instead of textual inlining: a plain OR-chain repeats
    the parse per bound (2 × blocks) and — because projection
    collapse re-inlines EVAL'd expressions into every consumer — an
    EVAL'd ``TO_IP(x)`` argument would re-run its validity regex at
    every repetition.  Measured on the cidr gate at sf0.1: 3.9 s →
    0.7 s (5.4×), identical rows/NULL semantics (a NULL element makes
    ``exists`` NULL, filtering the row exactly like the OR-chain)."""
    while True:
        calls = _find_calls(expr, "CIDR_MATCH")
        if not calls:
            return expr
        start, open_p, close_p = calls[0]
        parts = _split_top(expr[open_p + 1:close_p], ",")
        if len(parts) < 2:
            raise ValueError("CIDR_MATCH takes (ip, \"a.b.c.d/n\", ...)")
        col = parts[0].strip()
        addr = (
            "(CAST(split(__cm_s, '\\\\.')[0] AS BIGINT) * 16777216"
            " + CAST(split(__cm_s, '\\\\.')[1] AS BIGINT) * 65536"
            " + CAST(split(__cm_s, '\\\\.')[2] AS BIGINT) * 256"
            " + CAST(split(__cm_s, '\\\\.')[3] AS BIGINT))"
        )
        conds = []
        for blk in parts[1:]:
            bm = re.fullmatch(
                r'\s*"(\d+)\.(\d+)\.(\d+)\.(\d+)/(\d+)"\s*', blk
            )
            if not bm:
                raise ValueError(
                    f'CIDR_MATCH block must be a "a.b.c.d/n" literal: {blk!r}'
                )
            a, b, c, d, bits = (int(x) for x in bm.groups())
            if bits > 32 or max(a, b, c, d) > 255:
                raise ValueError(f"invalid CIDR block: {blk.strip()!r}")
            base = (a << 24) + (b << 16) + (c << 8) + d
            lo = base & (~((1 << (32 - bits)) - 1) & 0xFFFFFFFF)
            hi = lo + (1 << (32 - bits))
            conds.append(f"(__cm_a >= {lo} AND __cm_a < {hi})")
        repl = (
            f"exists(transform(array({col}), __cm_s -> {addr}), "
            f"__cm_a -> ({' OR '.join(conds)}))"
        )
        expr = expr[:start] + repl + expr[close_p + 1:]


def _rewrite_match_phrase(expr: str) -> str:
    """ES|QL 8.18 ``MATCH_PHRASE(field, "phrase")`` → an exact
    consecutive-token predicate over the engine's simple analyzer
    (lowercase whitespace tokens — the same chain ``MATCH`` and the
    no-analyzer ``match_phrase`` search operator use).  The phrase
    analyzes at REWRITE time, so the compiled predicate is one
    codegen ``exists`` over start positions with the token array
    bound ONCE via the transform-array trick (the `_h_ip_prefix`
    lambda-binding pattern — one tokenize per row, not one per
    position probe).  A NULL field yields NULL (row filtered),
    matching ES.

    The ES options map (slop / analyzer / zero_terms_query) is
    refused: sloppy phrase matching is a permutation-distance
    contract owned by search.match_phrase (slop, analyzed variants,
    S14 ordering rules) — a WHERE-level Column rendering would
    duplicate it divergently."""
    while True:
        calls = _find_calls(expr, "MATCH_PHRASE")
        if not calls:
            return expr
        start, open_p, close_p = calls[0]
        parts = _split_top(expr[open_p + 1:close_p], ",")
        if len(parts) == 3:
            raise ValueError(
                "MATCH_PHRASE options (slop/analyzer/zero_terms_query)"
                " are not supported here — use the search operator "
                "match_phrase (search.py) for sloppy/analyzed phrases"
            )
        if len(parts) != 2:
            raise ValueError('MATCH_PHRASE takes (field, "phrase")')
        col = parts[0].strip()
        qm = re.fullmatch(r'\s*"((?:[^"\\]|\\.)*)"\s*', parts[1])
        if not qm:
            raise ValueError(
                f"MATCH_PHRASE phrase must be a string literal: "
                f"{parts[1]!r}"
            )
        toks = [
            t for t in qm.group(1).replace('\\"', '"').lower().split() if t
        ]
        if not toks:
            raise ValueError("MATCH_PHRASE phrase has no tokens")
        lits = [
            "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"
            for t in toks
        ]
        fld = f"filter(split(lower(trim({col})), '\\\\s+'), _t -> _t != '')"
        n = len(toks)
        if n == 1:
            repl = f"array_contains({fld}, {lits[0]})"
        else:
            conds = " AND ".join(
                f"try_element_at(__mp, _i + {j}) = {lit}"
                for j, lit in enumerate(lits)
            )
            # the greatest(..., 1) floor keeps sequence() ascending on
            # short docs (sequence(1, 0) would generate a DESCENDING
            # [1, 0] range — Spark infers step -1 — and a 0 index
            # throws even through try_element_at); the size >= n
            # conjunct then rejects those rows
            repl = (
                f"element_at(transform(array({fld}), __mp -> "
                f"size(__mp) >= {n} AND "
                f"exists(sequence(1, greatest(size(__mp) - {n - 1}, 1)), "
                f"_i -> {conds})), 1)"
            )
        expr = expr[:start] + repl + expr[close_p + 1:]


def _rewrite_match(expr: str) -> str:
    """ES|QL 8.18 full-text ``MATCH(field, "query" [, options])`` →
    a token-set predicate over the engine's simple analyzer
    (lowercase whitespace tokens, the same chain `match` uses with no
    configured analyzer): default OR semantics (any query token
    present — ES's match default operator), ``{"operator": "and"}``
    in the options map switching to all-tokens-present.  The query
    string analyzes at REWRITE time (Python), so the compiled
    predicate is a pure codegen ``arrays_overlap``/``forall`` against
    literal tokens — no join, no UDF, and the WHERE it lives in can
    still push sibling predicates to the scan.  A NULL field yields
    NULL (row filtered), matching ES's no-match on missing fields."""
    while True:
        calls = _find_calls(expr, "MATCH")
        if not calls:
            return expr
        start, open_p, close_p = calls[0]
        parts = _split_top(expr[open_p + 1:close_p], ",")
        if len(parts) not in (2, 3):
            raise ValueError("MATCH takes (field, \"query\"[, options])")
        col = parts[0].strip()
        qm = re.fullmatch(r'\s*"((?:[^"\\]|\\.)*)"\s*', parts[1])
        if not qm:
            raise ValueError(
                f"MATCH query must be a string literal: {parts[1]!r}"
            )
        toks = [t for t in qm.group(1).replace('\\"', '"').lower().split() if t]
        if not toks:
            raise ValueError("MATCH query has no tokens")
        op = "or"
        if len(parts) == 3:
            om = re.search(r'"operator"\s*:\s*"([^"]*)"', parts[2], re.I)
            if om:
                op = om.group(1).lower()
                if op not in ("and", "or"):
                    # ES rejects invalid operator values; silently
                    # falling back to OR would pass rows the caller
                    # meant to require every token for
                    raise ValueError(
                        f"MATCH operator must be and/or, got {om.group(1)!r}"
                    )
        # Spark SQL escapes a quote inside a single-quoted literal
        # with a backslash ('it\'s'); doubled quotes would parse as
        # two adjacent literals and silently concatenate
        lits = ", ".join(
            "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"
            for t in toks
        )
        fld = (
            f"filter(split(lower(trim({col})), '\\\\s+'), _t -> _t != '')"
        )
        if op == "and":
            repl = f"forall(array({lits}), _q -> array_contains({fld}, _q))"
        else:
            repl = f"arrays_overlap({fld}, array({lits}))"
        expr = expr[:start] + repl + expr[close_p + 1:]


def _fork_branches(body: str) -> list[str]:
    """Parse a FORK body into its top-level parenthesized branch
    pipes — quote-aware balanced scan, refusing text outside the
    groups (a bare command between branches is a syntax error in ES
    too)."""
    branches: list[str] = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch.isspace():
            i += 1
            continue
        if ch != "(":
            raise ValueError(
                f"FORK branches must be parenthesized pipes: "
                f"unexpected {body[i:i + 20]!r}"
            )
        depth, j = 0, i
        in_str: str | None = None
        escaped = False
        while j < n:
            c = body[j]
            if in_str is not None:
                # toggling escape flag: "…\\\\" is a closed string
                # (the pair consumes itself), "…\\"" is not — a
                # single look-behind at body[j-1] gets both wrong
                if escaped:
                    escaped = False
                elif c == "\\" and in_str == '"':
                    escaped = True
                elif c == in_str:
                    in_str = None
            elif c in ('"', "'"):
                in_str = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise ValueError("FORK branch has unbalanced parentheses")
        br = body[i + 1:j].strip()
        if not br:
            raise ValueError("empty FORK branch")
        branches.append(br)
        i = j + 1
    return branches


def _split_kw(s: str, word: str) -> list[str]:
    """Split ONCE on keyword ``word`` appearing outside quotes and
    parentheses (the quote-aware twin of ``re.split`` for the STATS
    ``BY`` / per-aggregate ``WHERE`` keywords — a bare regex split
    would cut inside string literals like ``"WHERE it failed"``)."""
    depth, in_str, escaped = 0, False, False
    wl = len(word)
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            # toggling escape flag, same contract as _split_top
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and s[i:i + wl].upper() == word
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + wl == len(s)
                or not (s[i + wl].isalnum() or s[i + wl] == "_")
            )
        ):
            return [s[:i], s[i + wl:]]
        i += 1
    return [s]


def _expand(patterns: list[str], columns: list[str]) -> list[str]:
    out: list[str] = []
    for p in patterns:
        if "*" in p or "?" in p:
            matched = [c for c in columns if fnmatch.fnmatch(c, p)]
            out.extend(m for m in matched if m not in out)
        elif p in columns and p not in out:
            out.append(p)
        elif p not in columns:
            raise ValueError(f"unknown column in KEEP/DROP: {p}")
    return out


def _named_exprs(clause: str) -> list[tuple[str | None, str]]:
    """``a = expr, expr2`` → [(name, sql), (None, sql2)] — the name is
    the part before a TOP-LEVEL `=` that is a bare identifier."""
    out = []
    for item in _split_top(clause, ","):
        item = item.strip()
        if not item:
            continue
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_.]*)\s*=(?!=)\s*(.+)$", item, re.S)
        if m:
            out.append((m.group(1), m.group(2).strip()))
        else:
            out.append((None, item))
    return out


def _by_keys(clause: str) -> list[Column]:
    """STATS/INLINESTATS ``BY`` keys: plain columns, expressions, and
    named expressions (``BY b = BUCKET(ts, 1 hour)``) — ES|QL names an
    unnamed expression key by its source text.  Shared by both
    commands so expression keys behave identically."""
    keys: list[Column] = []
    for nm, sql in _named_exprs(clause):
        if nm is None and re.fullmatch(
            r"[A-Za-z_][A-Za-z0-9_.]*", sql.strip()
        ):
            keys.append(F.col(sql.strip()))
        else:
            keys.append(F.expr(_tr_expr(sql)).alias(nm or sql.strip()))
    return keys


def _dissect_regex(pattern: str) -> tuple[str, list[str]]:
    """Dissect pattern → (anchored regex, capture key list).  Each
    ``%{key}`` becomes a lazy capture; the literal text between keys
    escapes verbatim; ``%{}`` (empty key) matches without capturing."""
    keys: list[str] = []
    out = ["^"]
    pos = 0
    for m in re.finditer(r"%\{([^}]*)\}", pattern):
        out.append(re.escape(pattern[pos:m.start()]))
        key = m.group(1)
        if key:
            keys.append(key)
            out.append("(.*?)")
        else:
            out.append("(?:.*?)")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    out.append("$")
    if not keys:
        raise ValueError("DISSECT pattern has no %{key} captures")
    return "".join(out), keys


# The built-in grok pattern library, restricted to the Java-regex ∩
# RE2 portable core (no lookaround, no atomic groups, no backrefs) so
# the SAME regex evaluates identically on Spark and any independent
# oracle engine.  Names and intent follow the public Logstash
# grok-patterns file; definitions that upstream writes with
# lookbehind/atomic groups (BASE10NUM et al.) are re-rendered in the
# portable subset — the matched LANGUAGE is the practical one (a
# leading sign is taken greedily, not context-gated).  IP is the IPv4
# form (IPv6's upstream definition is lookahead-heavy; pass an
# explicit portable pattern inline if you need it).
_GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"[1-9]\d*",
    "NONNEGINT": r"\d+",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IPV4": (
        r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
        r"(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}"
    ),
    "IP": (
        r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
        r"(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}"
    ),
    "HOSTNAME": (
        r"(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?"
    ),
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|"
        r"NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|"
        r"[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|"
        r"[Ff]atal|FATAL|[Ss]evere|SEVERE|[Ee]merg(?:ency)?|"
        r"EMERG(?:ENCY)?)"
    ),
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"
        r"(?::\d{2}(?:\.\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?"
    ),
}

_GROK_TOKEN = re.compile(
    r"%\{(\w+)(?::([A-Za-z_][A-Za-z0-9_.]*))?(?::(int|long|float|double))?\}"
)


def _grok_check_literal(lit: str) -> None:
    """The text BETWEEN %{...} tokens is raw regex (grok's contract);
    a CAPTURING group in it would silently shift every extraction
    index — only non-capturing ``(?:`` groups are admitted, loudly.
    A leftover ``%{`` means a token the grammar did not parse (bad
    type suffix, illegal field name) — raise instead of letting it
    degrade into literal regex text."""
    if "%{" in lit:
        raise ValueError(
            f"malformed grok token in {lit!r} — expected "
            "%{PATTERN[:field[:int|long|float|double]]}"
        )
    i, in_class = 0, False
    while i < len(lit):
        ch = lit[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(" and not lit.startswith("(?:", i):
            # a '(' inside a character class ([(]) is a literal, not
            # a group (self-review r10)
            raise ValueError(
                "GROK literal text may only use non-capturing groups "
                "(?:...) — a capturing group would shift the "
                f"extraction indices: {lit!r}"
            )
        i += 1


def _grok_compile(pattern: str) -> tuple[str, list[tuple[str, str | None]]]:
    """Grok pattern → (regex, [(field, type), …]).  ``%{PAT:name}``
    captures, ``%{PAT:name:int}`` captures with conversion,
    ``%{PAT}`` matches without capturing; unknown pattern names and
    duplicate field names raise."""
    fields: list[tuple[str, str | None]] = []
    out: list[str] = []
    pos = 0
    for m in _GROK_TOKEN.finditer(pattern):
        lit = pattern[pos:m.start()]
        _grok_check_literal(lit)
        out.append(lit)
        pname, fname, ftype = m.group(1), m.group(2), m.group(3)
        body = _GROK_PATTERNS.get(pname)
        if body is None:
            raise ValueError(
                f"unknown grok pattern %{{{pname}}} — supported: "
                f"{sorted(_GROK_PATTERNS)}"
            )
        if fname:
            if any(f == fname for f, _ in fields):
                raise ValueError(f"duplicate grok field name: {fname!r}")
            fields.append((fname, ftype))
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
        pos = m.end()
    _grok_check_literal(pattern[pos:])
    out.append(pattern[pos:])
    if not fields:
        raise ValueError("GROK pattern extracts no fields")
    return "".join(out), fields


# the per-SERIES inner functions legal inside a TS STATS — ES|QL 9.x's
# time-series aggregation family
_TS_INNER_FNS = (
    "RATE",
    "MAX_OVER_TIME",
    "MIN_OVER_TIME",
    "SUM_OVER_TIME",
    "AVG_OVER_TIME",
    "COUNT_OVER_TIME",
    "FIRST_OVER_TIME",
    "LAST_OVER_TIME",
)


def _ts_rate_stats(
    df: DataFrame,
    aggs_txt: str,
    by_txt: str | None,
    dimensions: list[str],
    time_col: str,
    seq_col: str,
) -> DataFrame:
    """ES|QL 9.x ``TS … | STATS outer(inner(col)) BY keys`` — the
    TSDS per-series aggregation family.  Per SERIES (the dimension
    tuple) within each group the INNER function computes:

    * ``RATE(counter)`` — order events by the packed (ts, id)
      contract, sum the increases with Prometheus/ES reset
      compensation (a decrease is a counter reset: the post-reset
      sample counts as an increase from zero, so 1,5,2,7 yields
      4+2+5 = 11), divide by the series' observed time span in
      seconds, round 6 dp (the S11 class); a single-event series has
      no span and yields NULL;
    * ``MAX/MIN/SUM/AVG/COUNT_OVER_TIME`` — the plain per-series
      statistics (sum/avg in exact decimal, 6-dp round);
    * ``FIRST/LAST_OVER_TIME`` — the packed-order endpoints via
      primitive min_by/max_by buffers (stays a HashAggregate).

    The OUTER function (max/min/avg/sum) then aggregates the
    per-series values within each BY group — avg/sum re-accumulate in
    exact decimal.

    Plan: at most one Window (RATE's lag, partitioned by dimensions +
    keys, ordered by the packed decimal) feeding TWO hash
    aggregations — series collapse, then group collapse.  Nothing
    corpus-sized sorts globally.  Every aggregate in the STATS must
    wrap an inner time-series function (mixing row-level and
    series-level aggregates in one STATS would silently conflate
    grains)."""
    key_cols: list[str] = []
    if by_txt:
        for nm, sql in _named_exprs(by_txt):
            name = nm or sql.strip()
            df = df.withColumn(name, F.expr(_tr_expr(sql)))
            key_cols.append(name)
    fn_alt = "|".join(_TS_INNER_FNS)
    specs: list[tuple[str, str, str, str]] = []
    for i, (nm, sql) in enumerate(_named_exprs(aggs_txt)):
        m = re.fullmatch(
            rf"\s*(\w+)\s*\(\s*({fn_alt})\s*\(\s*([A-Za-z_][\w.]*)\s*\)"
            r"\s*\)\s*",
            sql,
        )
        if not m:
            raise ValueError(
                "in a TS STATS every aggregate must be "
                f"outer(RATE(col)) or outer(<fn>_OVER_TIME(col)): {sql!r}"
            )
        outer = m.group(1).lower()
        if outer not in ("max", "min", "avg", "sum"):
            raise ValueError(
                f"the outer aggregate must be max/min/avg/sum, "
                f"got {outer!r}"
            )
        specs.append((nm or f"agg{i}", outer, m.group(2), m.group(3)))

    pk = (
        F.unix_micros(F.col(time_col)).cast("decimal(38,0)")
        * F.lit(1_000_000_000)
        + F.col(seq_col).cast("decimal(38,0)")
    )
    w = Window.partitionBy(
        *[F.col(c) for c in list(dimensions) + key_cols]
    ).orderBy(pk)
    inc_cols = {}
    raw_cols: set[str] = set()
    need_pk = False
    for name, _outer, inner, col in specs:
        if inner == "RATE":
            prev = F.lag(F.col(col)).over(w)
            # explicit CASE, not greatest(): greatest's NULL handling
            # differs across engines — the contract must be one tree.
            # A decrease is a counter reset: the post-reset sample is
            # credited as an increase FROM ZERO (value itself), the
            # Prometheus/ES reset compensation (1,5,2,7 -> 4+2+5=11).
            inc_cols[f"_inc_{name}"] = (
                F.when(prev.isNull(), F.lit(0.0))
                .when(F.col(col) >= prev, F.col(col) - prev)
                .otherwise(F.col(col))
            )
        else:
            raw_cols.add(col)
            if inner in ("FIRST_OVER_TIME", "LAST_OVER_TIME"):
                need_pk = True
    rows = df.select(
        *[F.col(c) for c in list(dimensions) + key_cols],
        F.unix_micros(F.col(time_col)).alias("_tus"),
        *([pk.alias("_pk")] if need_pk else []),
        *[
            F.col(c)
            for c in sorted(raw_cols - set(dimensions) - set(key_cols))
        ],
        *[c.alias(n) for n, c in inc_cols.items()],
    )
    span = (F.max("_tus") - F.min("_tus")).cast("double") / 1_000_000.0

    def _series_agg(name: str, inner: str, col: str):
        c = F.col(col)
        if inner == "RATE":
            return F.when(
                span > 0,
                F.round(
                    F.sum(F.col(f"_inc_{name}").cast("decimal(18,6)"))
                    .cast("double") / span,
                    6,
                ),
            )
        if inner == "MAX_OVER_TIME":
            return F.max(c)
        if inner == "MIN_OVER_TIME":
            return F.min(c)
        if inner == "SUM_OVER_TIME":
            return F.round(
                F.sum(c.cast("decimal(18,6)")).cast("double"), 6
            )
        if inner == "AVG_OVER_TIME":
            return F.round(
                F.sum(c.cast("decimal(18,6)")).cast("double") / F.count(c),
                6,
            )
        if inner == "COUNT_OVER_TIME":
            return F.count(c)
        # FIRST/LAST: the packed (ts, id) order decides — primitive
        # min_by/max_by buffers (double payload, decimal key), stays
        # a HashAggregate
        if inner == "FIRST_OVER_TIME":
            return F.min_by(c, F.col("_pk"))
        return F.max_by(c, F.col("_pk"))

    series = rows.groupBy(
        *[F.col(c) for c in list(dimensions) + key_cols]
    ).agg(
        *[
            _series_agg(n, inner, c).alias(f"_rate_{n}")
            for n, _o, inner, c in specs
        ]
    )
    outs = []
    for n, outer, _inner, _c in specs:
        r = F.col(f"_rate_{n}")
        if outer == "max":
            outs.append(F.max(r).alias(n))
        elif outer == "min":
            outs.append(F.min(r).alias(n))
        elif outer == "sum":
            outs.append(
                F.round(F.sum(r.cast("decimal(28,6)")).cast("double"), 6)
                .alias(n)
            )
        else:  # avg — decimal sum over count of non-null rates
            outs.append(
                F.round(
                    F.sum(r.cast("decimal(28,6)")).cast("double")
                    / F.count(r),
                    6,
                ).alias(n)
            )
    if key_cols:
        return series.groupBy(*key_cols).agg(*outs)
    return series.groupBy().agg(*outs)


def esql(
    query: str,
    tables: dict[str, DataFrame],
    spark: SparkSession | None = None,
    enrich_policies: dict | None = None,
    dimensions: list[str] | None = None,
    time_col: str = "ts",
    seq_col: str = "event_id",
    fork_persist: bool = False,
) -> DataFrame:
    """Compile one ES|QL query against the given table map.
    ``enrich_policies`` maps a policy name to ``(frame, match_field)``
    for the ENRICH command.

    ``TS <index>`` (the 9.x time-series source command) needs the
    series metadata an ES TSDS index mapping would carry:
    ``dimensions`` (the fields identifying one series — ES's
    ``time_series_dimension``), ``time_col`` and ``seq_col`` (the
    deterministic within-series order, the engine's packed (ts, id)
    contract).  RATE() is then legal inside STATS — see
    ``_ts_rate_stats``.

    ``fork_persist``: FORK plans one independent subtree per branch
    and Spark does not dedupe identical subtrees, so a FORK whose
    input is an expensive computed pipe re-executes that pipe per
    branch (up to 8×).  True persists the branch input once before
    compilation; the caller owns the cache lifetime."""
    stages = [s.strip() for s in _split_top(query, "|") if s.strip()]
    if not stages:
        raise ValueError("empty ES|QL query")
    head = stages[0]
    hm = re.match(r"^(FROM|ROW|TS)\b(.*)$", head, re.I | re.S)
    if not hm:
        # name the refused source commands explicitly (S36): a typo'd
        # FROM and a deliberate SHOW deserve different errors
        if re.match(r"^SHOW\b", head, re.I):
            raise ValueError(
                "unsupported ES|QL command: SHOW — it reports the ES "
                "deployment's version/build metadata, which has no "
                "equivalent in an engine without an ES deployment "
                "(DIVERGENCES S36)"
            )
        if re.match(r"^METRICS\b", head, re.I):
            raise ValueError(
                "unsupported ES|QL command: METRICS — the 8.x preview "
                "spelling was renamed in 9.x; use TS with "
                "dimensions=[...] (DIVERGENCES S35/S36)"
            )
        raise ValueError("ES|QL must start with FROM, ROW, or TS")
    cmd, rest = hm.group(1).upper(), hm.group(2).strip()
    ts_mode = False
    if cmd == "TS":
        if dimensions is None:
            raise ValueError(
                "TS needs the series metadata an ES TSDS mapping "
                "carries — pass dimensions=[...] (and time_col/"
                "seq_col if not ts/event_id)"
            )
        ts_mode = True
        cmd = "FROM"
    if cmd == "FROM":
        # ES|QL FROM a, b unions the named indices; missing columns
        # null-fill the way a sparse multi-index mapping would.
        # `METADATA _index` binds the source index name per branch
        # BEFORE the union (each branch's name is a literal — no
        # per-row work); the other metadata fields are refused with
        # reasons: an arbitrary frame has no ES doc identity (_id /
        # _version are the sink's merge keys — map your id column
        # explicitly) and no relevance context (_score).
        meta_fields: list[str] = []
        mm = re.search(r"\bMETADATA\b(.*)$", rest, re.I | re.S)
        if mm:
            meta_fields = [f.strip() for f in mm.group(1).split(",") if f.strip()]
            rest = rest[: mm.start()]
            for f in meta_fields:
                if f != "_index":
                    raise ValueError(
                        f"unsupported METADATA field: {f} — _index is "
                        "supported; _id/_version are the document "
                        "sink's merge keys (select your id column "
                        "explicitly), _score needs a scoring query "
                        "(use the search operators), _ignored needs "
                        "the index mapping's ignore_* state"
                    )
        names = [n.strip() for n in rest.split(",") if n.strip()]
        for name in names:
            if name not in tables:
                raise ValueError(f"unknown table: {name}")

        def _branch(name: str) -> DataFrame:
            b = tables[name]
            if "_index" in meta_fields:
                b = b.withColumn("_index", F.lit(name))
            return b

        df = _branch(names[0])
        for name in names[1:]:
            df = df.unionByName(_branch(name), allowMissingColumns=True)
    else:
        if spark is None:
            spark = next(iter(tables.values())).sparkSession if tables else None
        if spark is None:
            raise ValueError("ROW needs a SparkSession")
        cols = [
            F.expr(_tr_expr(sql)).alias(nm or f"c{i}")
            for i, (nm, sql) in enumerate(_named_exprs(rest))
        ]
        df = spark.range(1).select(*cols)

    for stage in stages[1:]:
        sm = re.match(r"^([A-Za-z_]+)\b(.*)$", stage, re.S)
        if not sm:
            raise ValueError(f"unparseable stage: {stage!r}")
        cmd, body = sm.group(1).upper(), sm.group(2).strip()
        if cmd == "WHERE":
            df = _apply_where(df, body)
        elif cmd == "EVAL":
            for nm, sql in _named_exprs(body):
                if nm is None:
                    raise ValueError(f"EVAL needs name = expr: {sql!r}")
                df = df.withColumn(nm, F.expr(_tr_expr(sql)))
        elif cmd == "KEEP":
            pats = [p.strip() for p in body.split(",")]
            df = df.select(*_expand(pats, df.columns))
        elif cmd == "DROP":
            pats = [p.strip() for p in body.split(",")]
            df = df.drop(*_expand(pats, df.columns))
        elif cmd == "RENAME":
            for item in _split_top(body, ","):
                m = re.match(
                    r"^\s*([A-Za-z_][A-Za-z0-9_.]*)\s+AS\s+"
                    r"([A-Za-z_][A-Za-z0-9_.]*)\s*$",
                    item,
                    re.I,
                )
                if not m:
                    raise ValueError(f"RENAME needs `old AS new`: {item!r}")
                df = df.withColumnRenamed(m.group(1), m.group(2))
        elif cmd == "STATS":
            bm = _split_kw(body, "BY")
            if any(
                _find_calls(bm[0], fn, case_sensitive=True)
                for fn in _TS_INNER_FNS
            ):
                if not ts_mode:
                    raise ValueError(
                        "RATE()/*_OVER_TIME() are only legal over the "
                        "TS source command (they need the series "
                        "dimensions)"
                    )
                df = _ts_rate_stats(
                    df, bm[0], bm[1] if len(bm) == 2 else None,
                    dimensions, time_col, seq_col,
                )
                continue
            aggs = []
            for i, (nm, sql) in enumerate(_named_exprs(bm[0])):
                # ES|QL 8.16 per-aggregate filters: `AGG(x) WHERE cond`
                # maps onto the ANSI aggregate FILTER clause both
                # engines implement
                parts = _split_kw(sql, "WHERE")
                if len(parts) == 2:
                    sql = (
                        f"{parts[0].strip()} FILTER "
                        f"(WHERE {parts[1].strip()})"
                    )
                aggs.append(
                    F.expr(_tr_expr(sql)).alias(nm or f"agg{i}")
                )
            if len(bm) == 2:
                df = df.groupBy(*_by_keys(bm[1])).agg(*aggs)
            else:
                df = df.groupBy().agg(*aggs)
        elif cmd == "INLINESTATS":
            # ES|QL INLINESTATS: the STATS aggregates APPENDED to every
            # row instead of collapsing the frame — a window aggregate
            # partitioned by the BY keys (Catalyst: one Window exchange
            # on the keys, no join back).  Per-aggregate WHERE filters
            # rewrite to AGG(CASE WHEN cond THEN arg END) because
            # Spark's FILTER clause is not valid on window functions.
            bm = _split_kw(body, "BY")
            key_cols = _by_keys(bm[1]) if len(bm) == 2 else []
            w = Window.partitionBy(*key_cols)
            new_cols: dict[str, Column] = {}
            # a NAMED expression key (`BY b = BUCKET(...)`) binds the
            # key as a visible column, like the EVAL it abbreviates
            if len(bm) == 2:
                for nm, sql in _named_exprs(bm[1]):
                    if nm is not None:
                        new_cols[nm] = F.expr(_tr_expr(sql))
            for i, (nm, sql) in enumerate(_named_exprs(bm[0])):
                parts = _split_kw(sql, "WHERE")
                if len(parts) == 2:
                    call = parts[0].strip()
                    cond = parts[1].strip()  # translated with the whole expr
                    fm = re.match(r"^(\w+)\s*\((.*)\)\s*$", call, re.S)
                    if not fm:
                        raise ValueError(
                            f"INLINESTATS WHERE needs AGG(expr): {call!r}"
                        )
                    fn, arg = fm.group(1), fm.group(2).strip()
                    arg = "1" if arg == "*" else arg
                    sql = f"{fn}(CASE WHEN {cond} THEN {arg} END)"
                new_cols[nm or f"agg{i}"] = F.expr(_tr_expr(sql)).over(w)
            # ONE select so every aggregate resolves against the INPUT
            # frame (ES|QL semantics) — sequential withColumn would let
            # a later aggregate read a column an earlier one shadowed;
            # a replaced input column moves to the appended position
            df = df.select(
                *[c for c in df.columns if c not in new_cols],
                *[c.alias(n) for n, c in new_cols.items()],
            )
        elif cmd == "SAMPLE":
            # ES|QL SAMPLE p draws a true-random subset; random
            # membership can never hash-match an independent oracle,
            # so this carries the S24 deterministic keyed-hash
            # contract the random_sampler agg established: a row is
            # in the sample iff its md5-derived bucket (seed 17, keyed
            # on the frame's FIRST column — id-leading frames by
            # convention) lands under p·1e6.  Same inclusion
            # probability, reproducible across engines/partitionings/
            # retries, one codegen narrow filter — the row reduction
            # is the entire point at 100 TB.
            from monstache_spark.functions.text import shingle_hash

            sm2 = re.match(r"^([0-9.]+)$", body.strip())
            if not sm2:
                raise ValueError(f"SAMPLE needs a probability: {body!r}")
            p = float(sm2.group(1))
            if not (0 < p <= 1):
                raise ValueError("SAMPLE probability must be in (0, 1]")
            if p < 1:
                # round, don't truncate: int(0.000249 * 1e6) is 248 in
                # binary floats, silently breaking the `< p*1e6`
                # contract for ~1.2% of six-decimal probabilities
                threshold = int(round(p * 1_000_000))
                # null-safe key: hash(NULL) is NULL and `NULL < t`
                # filters the row out — a null-keyed row must still
                # have inclusion probability p, as in ES|QL
                key = F.coalesce(
                    F.col(df.columns[0]).cast("string"), F.lit("")
                )
                bucket = F.pmod(shingle_hash(key, 17), F.lit(1_000_000))
                df = df.filter(bucket < F.lit(threshold))
        elif cmd == "SORT":
            order = []
            for item in _split_top(body, ","):
                toks = item.split()
                if not toks:
                    continue
                c = F.expr(_tr_expr(toks[0]))
                words = [t.upper() for t in toks[1:]]
                desc = "DESC" in words
                nulls_first = words[-2:] == ["NULLS", "FIRST"]
                nulls_last = words[-2:] == ["NULLS", "LAST"]
                if desc:
                    c = (
                        c.desc_nulls_first()
                        if nulls_first
                        else c.desc_nulls_last()
                        if nulls_last
                        else c.desc()
                    )
                else:
                    c = (
                        c.asc_nulls_first()
                        if nulls_first
                        else c.asc_nulls_last()
                        if nulls_last
                        else c.asc()
                    )
                order.append(c)
            df = df.orderBy(*order)
        elif cmd == "LIMIT":
            df = df.limit(int(body))
        elif cmd == "MV_EXPAND":
            # explode_outer: ES|QL MV_EXPAND KEEPS a row whose column
            # is null (it expands to one null row) — plain explode
            # would silently drop it and undercount downstream STATS
            col = body.strip()
            df = df.withColumn(col, F.explode_outer(col))
        elif cmd == "ENRICH":
            m = re.match(
                r"^([A-Za-z_][A-Za-z0-9_.-]*)\s+ON\s+"
                r"([A-Za-z_][A-Za-z0-9_.]*)(?:\s+WITH\s+(.+))?$",
                body,
                re.I | re.S,
            )
            if not m:
                raise ValueError(f"ENRICH needs `policy ON field`: {body!r}")
            policy, on, with_ = m.group(1), m.group(2), m.group(3)
            if not enrich_policies or policy not in enrich_policies:
                raise ValueError(f"unknown enrich policy: {policy}")
            frame, match_field = enrich_policies[policy]
            cols = (
                [c.strip() for c in with_.split(",")]
                if with_
                else [c for c in frame.columns if c != match_field]
            )
            rhs = frame.select(
                F.col(match_field).alias(on),
                *[F.col(c) for c in cols],
            )
            df = df.join(F.broadcast(rhs), on, "left")
        elif cmd == "LOOKUP":
            # LOOKUP JOIN (8.18 GA): left join against a lookup-mode
            # index on one or more match fields.  ES semantics carried
            # exactly: a NULL match field never matches (left row kept
            # with nulls), MULTIPLE lookup matches fan the row out,
            # and non-key lookup fields OVERRIDE same-named incoming
            # columns (the documented name-collision rule — override,
            # not ambiguity), so colliding left columns drop first.
            # Lookup-mode indices are single-shard small by contract,
            # hence the pinned broadcast.
            m = re.match(
                r"^JOIN\s+([A-Za-z_][A-Za-z0-9_.]*)\s+ON\s+"
                r"([A-Za-z_][A-Za-z0-9_.]*"
                r"(?:\s*,\s*[A-Za-z_][A-Za-z0-9_.]*)*)$",
                body,
                re.I,
            )
            if not m:
                raise ValueError(
                    f"LOOKUP needs `JOIN table ON f1[, f2 …]`: {body!r}"
                )
            name = m.group(1)
            on_fields = [f.strip() for f in m.group(2).split(",")]
            if name not in tables:
                raise ValueError(f"unknown lookup table: {name}")
            rhs = tables[name]
            for f in on_fields:
                if f not in rhs.columns:
                    raise ValueError(
                        f"lookup table {name} has no match field {f!r}"
                    )
            overridden = [
                c for c in rhs.columns
                if c not in on_fields and c in df.columns
            ]
            df = df.drop(*overridden).join(
                F.broadcast(rhs), on_fields, "left"
            )
        elif cmd == "CHANGE_POINT":
            # ES|QL 8.16 CHANGE_POINT value ON key: the S22
            # deterministic step-change detector (aggs.change_point —
            # binary-segmentation variance reduction over exact
            # decimal prefix sums) run over the piped frame, which is
            # bucket-sized post-STATS by construction.  ES|QL
            # annotates the input rows; the flattened rendering
            # returns the detector's single verdict row
            # (key, change_type, score, mean_left, mean_right) —
            # stationary series report type 'stationary'
            m = re.match(
                r"^([A-Za-z_][A-Za-z0-9_.]*)"
                r"(?:\s+ON\s+([A-Za-z_][A-Za-z0-9_.]*))?$",
                body,
                re.I,
            )
            if not m:
                raise ValueError(
                    f"CHANGE_POINT needs `value [ON key]`: {body!r}"
                )
            from monstache_spark.operators.aggs import change_point

            value_col = m.group(1)
            key_col = m.group(2) or "@timestamp"
            df = change_point(df, key_col, value_col)
        elif cmd == "DISSECT":
            m = re.match(
                r'^([A-Za-z_][A-Za-z0-9_.]*)\s+"((?:[^"\\]|\\.)*)"$', body, re.S
            )
            if not m:
                raise ValueError(f'DISSECT needs `col "%{{a}} …"`: {body!r}')
            col, pattern = m.group(1), m.group(2).replace('\\"', '"')
            rx, keys = _dissect_regex(pattern)
            # extract from a preserved source copy: a capture key that
            # shares the source column's name would otherwise truncate
            # it on the first withColumn and corrupt later captures
            src_col = "_dissect_src"
            df = df.withColumn(src_col, F.col(col))
            for i, key in enumerate(keys, start=1):
                piece = F.regexp_extract(F.col(src_col), rx, i)
                df = df.withColumn(
                    key,
                    F.when(F.col(src_col).rlike(rx), piece),
                )
            df = df.drop(src_col)
        elif cmd == "GROK":
            m = re.match(
                r'^([A-Za-z_][A-Za-z0-9_.]*)\s+"((?:[^"\\]|\\.)*)"$', body, re.S
            )
            if not m:
                raise ValueError(f'GROK needs `col "%{{PAT:field}} …"`: {body!r}')
            col, pattern = m.group(1), m.group(2).replace('\\"', '"')
            rx, fields = _grok_compile(pattern)
            # unanchored search semantics (grok's contract — both
            # rlike and regexp_extract search, not match); a
            # non-matching row yields NULL in every extracted field,
            # a matching row yields each group's text (possibly "").
            # Same preserved-source-copy trick as DISSECT: a field
            # that shares the input column's name must not corrupt
            # later extractions.
            src_col = "_grok_src"
            df = df.withColumn(src_col, F.col(col))
            for i, (fname, ftype) in enumerate(fields, start=1):
                piece = F.regexp_extract(F.col(src_col), rx, i)
                c = F.when(F.col(src_col).rlike(rx), piece)
                if ftype in ("int", "long"):
                    c = c.cast("bigint")
                elif ftype in ("float", "double"):
                    c = c.cast("double")
                df = df.withColumn(fname, c)
            df = df.drop(src_col)
        elif cmd == "FORK":
            # ES|QL 9.1 FORK: each parenthesized branch is a full
            # sub-pipe applied to the INCOMING frame; outputs carry
            # the `_fork` discriminator ("fork1", "fork2", … in
            # branch order — the ES contract) and union by name with
            # null-fill for branch-local columns.  Each branch
            # compiles through a recursive esql() call whose table
            # map is the OUTER map plus the incoming frame under
            # `__fork_input__`, so every stage command (STATS, SORT,
            # LOOKUP JOIN against an outer lookup table, …) is legal
            # inside a branch exactly as in ES.  Declarative plan:
            # N independent subtrees over the same input, Union on
            # top — no per-row work.  Honesty note: Spark does NOT
            # dedupe identical scan subtrees without exchange reuse,
            # so an N-branch FORK plans N scans of the input; over a
            # raw parquet scan that exactly mirrors ES's per-branch
            # execution (each branch re-reads the shards), but over
            # an expensive COMPUTED upstream the subtree re-executes
            # per branch — pass fork_persist=True to cache the
            # input once across branches in that case.
            branches = _fork_branches(body)
            if "__fork_input__" in tables:
                raise ValueError(
                    "table name __fork_input__ is reserved for the "
                    "FORK branch input"
                )
            if not 2 <= len(branches) <= 8:
                raise ValueError(
                    f"FORK takes 2-8 parenthesized branches, got "
                    f"{len(branches)} (the ES limit)"
                )
            if fork_persist:
                # one materialization shared by all branch subtrees;
                # caller owns the lifetime (unpersist after the
                # result is consumed, or let the LRU evict it)
                df = df.persist()
            outs = []
            for i, br in enumerate(branches, start=1):
                for st in _split_top(br, "|"):
                    if re.match(r"\s*FORK\b", st, re.I):
                        raise ValueError(
                            "nested FORK is unsupported (as in ES)"
                        )
                sub = esql(
                    "FROM __fork_input__ | " + br,
                    {**tables, "__fork_input__": df},
                    spark=spark,
                    enrich_policies=enrich_policies,
                )
                outs.append(sub.withColumn("_fork", F.lit(f"fork{i}")))
            df = outs[0]
            for o in outs[1:]:
                df = df.unionByName(o, allowMissingColumns=True)
        elif cmd in ("COMPLETION", "RERANK"):
            # DIVERGENCES S31: COMPLETION/RERANK call a deployed
            # inference model (never hash-verifiable against an
            # independent oracle)
            raise ValueError(
                f"unsupported ES|QL command: {cmd} — model-dependent "
                "(DIVERGENCES S31); rerank via the retriever "
                "tree's text_similarity_reranker stand-in"
            )
        elif cmd == "RRF":
            # 9.x preview: RRF fuses the _score relevance column FORK
            # branches emit under ES scoring — frames here carry no
            # _score (the same grounds METADATA _score refuses on)
            raise ValueError(
                "unsupported ES|QL command: RRF — it fuses the _score "
                "relevance column this engine's frames don't carry; "
                "fuse ranked frames with the retriever tree's rrf "
                "node or search.hybrid_rrf instead (DIVERGENCES S36)"
            )
        else:
            raise ValueError(f"unsupported ES|QL command: {cmd}")
    return df
