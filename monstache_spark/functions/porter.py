"""The Porter stemming algorithm, rendered for Spark, Python, and
DuckDB from ONE definition.

Porter's algorithm (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980) is what Lucene's ``PorterStemFilter`` runs — the
`english` analyzer's stemmer — so full ES analyzer parity needs it,
not just the light suffix-strip list (DIVERGENCES S1 residual).  This
module implements the algorithm AS DISTRIBUTED by Porter's official
ports (including the documented departures the official C/Java
versions carry: ``bli→ble`` and ``logi→log`` in step 2), which is the
exact behavior Lucene ported.

The measure conditions (m>0, m=1, m>1, *v*, *o) use the classic regex
formulation of the official ports::

    C    = [^aeiou][^aeiouy]*          consonant sequence
    V    = [aeiouy][aeiou]*            vowel sequence
    m>0  = ^(C)?VC                     (search)
    m=1  = ^(C)?VC(V)?$
    m>1  = ^(C)?VCVC
    *v*  = ^(C)?[aeiouy]
    *o   = C[aeiouy][^aeiouwxy]$       (cvc where the last c is not w/x/y)

A leading ``y`` is marked as a consonant (uppercase ``Y``) before the
steps and restored after, as in every official port; tokens shorter
than 3 characters skip the algorithm entirely (marked with a sentinel
so the per-step pipeline below preserves the official entry-guard
semantics exactly).

WHY an ops interface: the algorithm is written ONCE against abstract
string/boolean operations and rendered three ways — ``_PyOps``
executes it directly (query-side analysis), ``_ColOps`` builds
Catalyst Column expressions (document-side, builtins only — no UDF),
``_SqlOps`` emits DuckDB SQL (the verification oracles).  Because all
three render the same expression tree, the renderings cannot drift
from each other; a vocabulary-wide parity test pins all three against
an independent imperative reference port.

WHY per-step passes: each of the 9 steps references its input several
times; inlining the whole cascade would multiply subexpressions
(~10⁵ fan-out by step 5).  Instead every step is applied as its own
``transform`` over the token array (Spark) / ``list_transform``
(DuckDB), so the step's input is a lambda VARIABLE and total
expression size stays linear in the number of steps.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

_C = "[^aeiou][^aeiouy]*"
_V = "[aeiouy][aeiou]*"
MGR0 = f"^({_C})?{_V}{_C}"
MEQ1 = f"^({_C})?{_V}{_C}({_V})?$"
MGR1 = f"^({_C})?{_V}{_C}{_V}{_C}"
HAS_VOWEL = f"^({_C})?[aeiouy]"
ENDS_CVC = f"{_C}[aeiouy][^aeiouwxy]$"

# (suffix → replacement), alternation order = the official port's order
STEP2_MAP = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
)
STEP3_MAP = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
STEP4_SUFFIXES = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)

_SKIP = "\x01"  # sentinel prefix: token was < 3 chars at entry


# ---------------------------------------------------------------------------
# the three renderings of string/boolean operations
# ---------------------------------------------------------------------------


class _PyOps:
    def lit(self, s):
        return s

    def matches(self, s, pat):
        return _re.search(pat, s) is not None

    def extract(self, s, pat, g):
        m = _re.search(pat, s)
        return m.group(g) if m and m.group(g) is not None else ""

    def concat(self, *parts):
        return "".join(parts)

    def chop(self, s):
        return s[:-1]

    def drop_first(self, s):
        return s[1:]

    def cond(self, b, t, f):
        return t if b else f

    def and_(self, a, b):
        return a and b

    def or_(self, a, b):
        return a or b

    def not_(self, a):
        return not a

    def eq(self, s, litval):
        return s == litval

    def len_lt(self, s, n):
        return len(s) < n


class _ColOps:
    def lit(self, s):
        return F.lit(s)

    def matches(self, s, pat):
        return s.rlike(pat)

    def extract(self, s, pat, g):
        return F.regexp_extract(s, pat, g)

    def concat(self, *parts):
        return F.concat(*parts)

    def chop(self, s):
        return F.substr(s, F.lit(1), F.length(s) - F.lit(1))

    def drop_first(self, s):
        return F.substr(s, F.lit(2), F.length(s))

    def cond(self, b, t, f):
        return F.when(b, t).otherwise(f)

    def and_(self, a, b):
        return a & b

    def or_(self, a, b):
        return a | b

    def not_(self, a):
        return ~a

    def eq(self, s, litval):
        return s == F.lit(litval)

    def len_lt(self, s, n):
        return F.length(s) < F.lit(n)


class _SqlOps:
    def lit(self, s):
        return "'" + s.replace("'", "''") + "'"

    def matches(self, s, pat):
        return f"regexp_matches({s}, '{pat}')"

    def extract(self, s, pat, g):
        return f"regexp_extract({s}, '{pat}', {g})"

    def concat(self, *parts):
        return "(" + " || ".join(parts) + ")"

    def chop(self, s):
        return f"substr({s}, 1, length({s}) - 1)"

    def drop_first(self, s):
        return f"substr({s}, 2)"

    def cond(self, b, t, f):
        return f"(CASE WHEN {b} THEN {t} ELSE {f} END)"

    def and_(self, a, b):
        return f"({a} AND {b})"

    def or_(self, a, b):
        return f"({a} OR {b})"

    def not_(self, a):
        return f"(NOT {a})"

    def eq(self, s, litval):
        return f"({s} = '{litval}')"

    def len_lt(self, s, n):
        return f"(length({s}) < {n})"


# ---------------------------------------------------------------------------
# the algorithm, written once against the ops interface
# ---------------------------------------------------------------------------


def _guarded(step):
    """Skip sentinel-marked tokens (the official entry guard)."""

    def wrapped(o, w):
        return o.cond(o.matches(w, "^" + _SKIP), w, step(o, w))

    return wrapped


def _step_pre(o, w):
    """Mark sub-3-char tokens to skip; mark a leading y as consonant."""
    return o.cond(
        o.len_lt(w, 3),
        o.concat(o.lit(_SKIP), w),
        o.cond(
            o.matches(w, "^y"),
            o.concat(o.lit("Y"), o.drop_first(w)),
            w,
        ),
    )


@_guarded
def _step1a(o, w):
    # sses→ss, ies→i, (ss keeps), s→""
    stem1 = o.extract(w, r"^(.+?)(ss|i)es$", 1)
    suf1 = o.extract(w, r"^(.+?)(ss|i)es$", 2)
    stem2 = o.extract(w, r"^(.+?)([^s])s$", 1)
    ch2 = o.extract(w, r"^(.+?)([^s])s$", 2)
    return o.cond(
        o.matches(w, r"^(.+?)(ss|i)es$"),
        o.concat(stem1, suf1),
        o.cond(o.matches(w, r"^(.+?)([^s])s$"), o.concat(stem2, ch2), w),
    )


@_guarded
def _step1b(o, w):
    eed_stem = o.extract(w, r"^(.+?)eed$", 1)
    ei_stem = o.extract(w, r"^(.+?)(ed|ing)$", 1)
    # the ed/ing-stripped value, further adjusted:
    s = ei_stem
    adjusted = o.cond(
        o.matches(s, r"(at|bl|iz)$"),
        o.concat(s, o.lit("e")),
        o.cond(
            # double consonant, not l/s/z → chop one
            o.matches(s, r"(bb|cc|dd|ff|gg|hh|jj|kk|mm|nn|pp|qq|rr|tt|vv|ww|xx)$"),
            o.chop(s),
            o.cond(
                o.and_(o.matches(s, MEQ1), o.matches(s, ENDS_CVC)),
                o.concat(s, o.lit("e")),
                s,
            ),
        ),
    )
    return o.cond(
        o.matches(w, r"^(.+?)eed$"),
        o.cond(
            o.matches(eed_stem, MGR0), o.concat(eed_stem, o.lit("ee")), w
        ),
        o.cond(
            o.and_(
                o.matches(w, r"^(.+?)(ed|ing)$"),
                o.matches(ei_stem, HAS_VOWEL),
            ),
            adjusted,
            w,
        ),
    )


@_guarded
def _step1c(o, w):
    stem = o.extract(w, r"^(.+?)y$", 1)
    return o.cond(
        o.and_(o.matches(w, r"^(.+?)y$"), o.matches(stem, HAS_VOWEL)),
        o.concat(stem, o.lit("i")),
        w,
    )


def _map_step(mapping, cond_pat):
    alts = "|".join(s for s, _ in mapping)
    pat = rf"^(.+?)({alts})$"

    @_guarded
    def step(o, w):
        stem = o.extract(w, pat, 1)
        suf = o.extract(w, pat, 2)
        mapped = o.lit(mapping[-1][1])
        for s_, r_ in reversed(mapping[:-1]):
            mapped = o.cond(o.eq(suf, s_), o.lit(r_), mapped)
        return o.cond(
            o.and_(o.matches(w, pat), o.matches(stem, cond_pat)),
            o.concat(stem, mapped),
            w,
        )

    return step


_step2 = _map_step(STEP2_MAP, MGR0)
_step3 = _map_step(STEP3_MAP, MGR0)


@_guarded
def _step4(o, w):
    alts = "|".join(STEP4_SUFFIXES)
    pat = rf"^(.+?)({alts})$"
    stem = o.extract(w, pat, 1)
    ion_stem = o.extract(w, r"^(.+?)(s|t)(ion)$", 1)
    ion_ch = o.extract(w, r"^(.+?)(s|t)(ion)$", 2)
    ion_keep = o.concat(ion_stem, ion_ch)
    return o.cond(
        o.and_(o.matches(w, pat), o.matches(stem, MGR1)),
        stem,
        o.cond(
            o.and_(
                o.matches(w, r"^(.+?)(s|t)(ion)$"),
                o.matches(ion_keep, MGR1),
            ),
            ion_keep,
            w,
        ),
    )


@_guarded
def _step5(o, w):
    # 5a: trailing e drops when m>1, or m=1 and not *o
    stem = o.extract(w, r"^(.+?)e$", 1)
    after_e = o.cond(
        o.and_(
            o.matches(w, r"^(.+?)e$"),
            o.or_(
                o.matches(stem, MGR1),
                o.and_(
                    o.matches(stem, MEQ1),
                    o.not_(o.matches(stem, ENDS_CVC)),
                ),
            ),
        ),
        stem,
        w,
    )
    # 5b: double l collapses when m>1
    return o.cond(
        o.and_(o.matches(after_e, r"ll$"), o.matches(after_e, MGR1)),
        o.chop(after_e),
        after_e,
    )


def _step_post(o, w):
    return o.cond(
        o.matches(w, "^" + _SKIP),
        o.drop_first(w),
        o.cond(
            o.matches(w, "^Y"),
            o.concat(o.lit("y"), o.drop_first(w)),
            w,
        ),
    )


_STEPS = (
    _step_pre, _step1a, _step1b, _step1c, _step2, _step3, _step4,
    _step5, _step_post,
)


# ---------------------------------------------------------------------------
# public renderings
# ---------------------------------------------------------------------------


def porter_stem_py(token: str) -> str:
    """Stem one (already lowercased) token — the Python rendering."""
    o = _PyOps()
    w = token
    for step in _STEPS:
        w = step(o, w)
    return w


def porter_tokens_col(arr: Column) -> Column:
    """Apply the stemmer to every element of a token-array Column —
    one ``transform`` pass per step (linear expression size)."""
    o = _ColOps()

    # closure factory, not a default arg — a two-parameter lambda is
    # the (element, index) HOF signature to F.transform
    def apply_step(step):
        return lambda t: step(o, t)

    for step in _STEPS:
        arr = F.transform(arr, apply_step(step))
    return arr


def porter_tokens_sql(arr_expr: str) -> str:
    """DuckDB rendering over a list expression — one nested
    ``list_transform`` per step."""
    o = _SqlOps()
    out = arr_expr
    for step in _STEPS:
        out = f"list_transform({out}, t -> {step(o, 't')})"
    return out
