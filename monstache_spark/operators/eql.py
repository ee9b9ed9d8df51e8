"""ES EQL (Event Query Language) sequence matching.

EQL is the ES surface security/observability consumers run over synced
event collections (``sequence by host.id [process where ...] [network
where ...] within 10m``) — exactly the event shape monstache's change
stream materializes.  This module implements the ``sequence`` core —
an ORDERED chain of step filters joined by a ``by`` key, the whole
sequence bounded by ``maxspan`` — plus ``sample``, simple event
queries with the head/tail pipes, ``with runs=N``, missing-event
steps (``![...]``), per-step ``by`` fields, ``until``, and a TEXT
endpoint (:func:`eql`) that parses the actual Event Query Language
into these operators.

Matching contract (deterministic; ES's own engine is a per-key state
machine over shard-ordered events): each step extends the sequence
with the EARLIEST qualifying event STRICTLY AFTER the previous step's
event (same ``by`` key; ties at equal timestamps break by event id
asc) — the head-greedy match.  One output row per step-1 event that
completes the chain; a step-1 event matches at most one sequence
(its earliest completion), later steps may serve multiple sequence
starts, as in EQL's overlapping-sequence semantics.

Plan shape (100 TB): each step filter prunes the corpus BEFORE any
join (pushdown-eligible bool-DSL predicates); step ``i`` resolves
with an equi-join on the ``by`` key plus a range predicate, and the
earliest-successor pick is ONE hash aggregation — the (ts, id) pair
packs into one exact decimal ``unix_micros(ts)·10⁹ + id`` (the
top_metrics packing contract: ``0 ≤ id < 10⁹``), so no struct ever
enters an aggregation buffer and nothing sorts.  Work is
O(matching events per step), never corpus².

Reference grounding: monstache syncs the event collections EQL
consumers query (SURVEY.md §2.5 routes read-path DSL to the sink);
the sequence semantics follow the public EQL docs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monstache_spark.operators.search import compile_bool_query


def _step_pred(query, analyzer=None):
    """A step/filter predicate: a bool-DSL dict compiles through the
    shared search machinery; a STRING is a SQL boolean expression
    (the text EQL endpoint passes translated conditions)."""
    if isinstance(query, str):
        return F.expr(query)
    return compile_bool_query(query, analyzer=analyzer)

# id occupies the low 9 decimal digits of the packed ordering key —
# the top_metrics packing contract: 0 <= id < 10^9, else ids bleed
# into the microsecond digits and can reorder events whose timestamps
# differ by less than id/10^9 seconds (aggs.top_metrics documents the
# same precondition; re-key ids into a dense range if yours exceed it)
_PACK = 1_000_000_000


def _pack(ts, id_col):
    return (
        F.unix_micros(ts).cast("decimal(38,0)") * F.lit(_PACK)
        + F.col(id_col).cast("decimal(38,0)")
    )


def _expand_runs(steps: list[dict]) -> list[dict]:
    """EQL ``[ filter ] with runs=N`` — the step must match N times
    CONSECUTIVELY.  The public EQL docs define it as identical to
    writing the step N times, which is exactly how it compiles: a
    ``{"query": ..., "runs": N}`` step expands to N copies of its
    query before the chain is built (the head-greedy successor pick
    then enforces the consecutive-match semantics step by step)."""
    out: list[dict] = []
    for s in steps:
        # string steps (SQL predicates from the text endpoint) pass
        # through — `"runs" in s` on a string is substring membership
        # and would false-trigger on any predicate mentioning a field
        # named `runs` (self-review r10)
        if isinstance(s, dict) and "runs" in s:
            if "query" not in s or not set(s) <= {"query", "runs", "by"}:
                raise ValueError(
                    'a runs step must be {"query": <bool-DSL>, '
                    f'"runs": N [, "by": fields]}}, got keys {sorted(s)}'
                )
            n = int(s["runs"])
            if n < 1:
                raise ValueError(f"runs must be >= 1, got {n}")
            item = (
                {"query": s["query"], "by": s["by"]}
                if "by" in s else s["query"]
            )
            out.extend([item] * n)
        else:
            out.append(s)
    return out


def eql_events(
    events: DataFrame,
    query: dict,
    ts_col: str = "ts",
    id_col: str = "event_id",
    head: int | None = None,
    tail: int | None = None,
    analyzer=None,
) -> DataFrame:
    """EQL simple event query with the ``head`` / ``tail`` pipes —
    the only two pipes ES EQL supports.  Events order by the packed
    (ts, id) total order (EQL's timestamp-then-tiebreaker contract,
    deterministic on any partitioning); ``head N`` keeps the N
    OLDEST matching events, ``tail N`` the N NEWEST.

    Plan shape (100 TB): the filter prunes at the scan
    (pushdown-eligible bool-DSL), and orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-N heaps merged at the
    driver, never a full sort.
    """
    if head is not None and tail is not None:
        raise ValueError("pick ONE of head/tail (EQL accepts one pipe)")
    df = events.filter(_step_pred(query, analyzer))
    p = _pack(F.col(ts_col), id_col)
    if head is not None:
        df = df.orderBy(p.asc()).limit(int(head))
    elif tail is not None:
        df = df.orderBy(p.desc()).limit(int(tail))
    return df


def eql_sequence(
    events: DataFrame,
    steps: list[dict],
    by: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    maxspan_s: float | None = None,
    analyzer=None,
    until: dict | None = None,
) -> DataFrame:
    """Match an EQL ``sequence`` of 2+ ``steps`` (each a bool-DSL
    dict, or ``{"query": <bool-DSL>, "runs": N}`` for EQL's
    ``with runs=N`` repeat — expanded to N copies per the public EQL
    equivalence — or ``{"missing": <bool-DSL>}`` for an ES 8.10+
    MISSING-event step: no matching event may fall strictly between
    its neighboring positive steps, or within the maxspan window
    before/after the chain for the leading/trailing forms) joined by
    the ``by`` key, the first→last gap bounded by ``maxspan_s``
    seconds.  A positive step written ``{"query": …, "by": fields}``
    extends the join key per step (EQL's ``[a] by f1 [b] by f2`` —
    the key tuple ``(by, f1)`` on step 1 must equal ``(by, f2)`` on
    step 2; every step must contribute the same field count).
    Returns one row per completed sequence:
    ``(by, t1, id1, t2, id2, ..., span_s)`` — positive steps only
    carry output columns.

    The earliest-successor pick per step is a hash agg over a packed
    decimal (no struct buffers); the maxspan bound applies to every
    successor join (pruning candidates early, not just at the end).

    ``until`` (the EQL ``sequence ... until [...]`` clause): an event
    matching it EXPIRES in-flight state for its key — under the
    head-greedy deterministic contract (DIVERGENCES S28) a completed
    sequence survives iff NO until-event for the same key falls
    AFTER its first step and AT-OR-BEFORE its completing step's
    packed (ts, id) position (an until-event coinciding with the
    completing event processes against the still-in-flight state and
    kills it; one coinciding with the FIRST event does not — the
    sequence starts with it); sequences completed strictly before the
    until-event stand, as in ES.  Cost: one more filtered frame and
    one broadcast-able range anti-join on the key — no extra corpus
    pass.
    """
    steps = _expand_runs(steps)
    # EQL missing events (ES 8.10+): `[a] ![b] [c]` — a step written
    # {"missing": <bool-DSL>} asserts NO matching event for the key
    # falls strictly between its neighboring positive events'
    # packed positions (leading/trailing forms window by maxspan —
    # required there, as in ES).  Positive steps form the join chain;
    # each missing step is ONE broadcast-able anti-join at the end.
    positive: list[dict] = []
    missing: list[dict] = []
    prev_was_missing = False
    for s in steps:
        if isinstance(s, dict) and set(s) == {"missing"}:
            if prev_was_missing:
                raise ValueError(
                    "adjacent missing-event steps are not allowed "
                    "(the ES restriction)"
                )
            missing.append({"query": s["missing"], "after": len(positive)})
            prev_was_missing = True
        else:
            positive.append(s)
            prev_was_missing = False
    for m in missing:
        if m["after"] in (0, len(positive)) and maxspan_s is None:
            raise ValueError(
                "a leading/trailing missing-event step needs maxspan "
                "(ES requires it too — the window is otherwise "
                "unbounded)"
            )
    steps = positive
    if len(steps) < 2:
        raise ValueError("a sequence needs at least 2 positive steps")
    # EQL per-step join fields: `sequence by host [a] by f1 [b] by f2`
    # extends the key TUPLE — (host, f1) on step 1 must equal
    # (host, f2) on step 2.  A positive step written
    # {"query": <bool-DSL>, "by": field-or-list} contributes its
    # fields positionally; every step must contribute the same count.
    parsed: list[tuple[dict, list[str]]] = []
    for s in steps:
        if isinstance(s, dict) and "query" in s and set(s) <= {"query", "by"}:
            sb = s.get("by", [])
            sb = [sb] if isinstance(sb, str) else list(sb)
            parsed.append((s["query"], sb))
        else:
            parsed.append((s, []))
    arities = {len(sb) for _, sb in parsed}
    if len(arities) != 1:
        raise ValueError(
            "every step must carry the same number of per-step `by` "
            f"fields, got arities {sorted(arities)}"
        )
    extra = arities.pop()
    if extra and (until is not None or missing):
        raise ValueError(
            "per-step `by` fields do not combine with until/missing "
            "steps (their key arity is ambiguous — ES scopes both to "
            "the global key only when every step agrees)"
        )

    def _key(sb: list[str]):
        # positional aliases keep the struct TYPE identical across
        # steps (struct equality in Spark compares field types by
        # name+position; f1 vs f2 would not join without the alias)
        if not extra:
            return F.col(by).alias("_k")
        return F.struct(
            *[F.col(c).alias(f"k{j}") for j, c in enumerate([by] + sb)]
        ).alias("_k")

    frames = []
    for i, (step, sb) in enumerate(parsed, start=1):
        f = events.filter(_step_pred(step, analyzer))
        frames.append(
            f.select(
                _key(sb),
                F.col(ts_col).alias(f"t{i}"),
                F.col(id_col).cast("long").alias(f"id{i}"),
                _pack(F.col(ts_col), id_col).alias(f"_p{i}"),
            )
        )
    seq = frames[0]
    for i in range(2, len(steps) + 1):
        nxt = frames[i - 1].select(
            F.col("_k").alias("_k2"),
            F.col(f"t{i}"),
            F.col(f"id{i}"),
            F.col(f"_p{i}"),
        )
        cond = (seq["_k"] == nxt["_k2"]) & (
            nxt[f"_p{i}"] > seq[f"_p{i-1}"]
        )
        if maxspan_s is not None:
            span_us = int(maxspan_s * 1_000_000)
            cond = cond & (
                F.unix_micros(nxt[f"t{i}"]) - F.unix_micros(seq["t1"])
                <= F.lit(span_us)
            )
        joined = seq.join(nxt, cond)
        keys = [c for c in seq.columns if c != "_k2"]
        # earliest qualifying successor per in-flight sequence: min of
        # the packed (ts, id) — one hash agg, then a join back to
        # recover the successor's columns from the packed key
        earliest = joined.groupBy(*keys).agg(
            F.min(f"_p{i}").alias("_pe")
        )
        succ = frames[i - 1].select(
            F.col("_k").alias("_k2"),
            F.col(f"t{i}"),
            F.col(f"id{i}"),
            F.col(f"_p{i}"),
        )
        seq = (
            earliest.join(
                succ,
                (earliest["_k"] == succ["_k2"])
                & (succ[f"_p{i}"] == earliest["_pe"]),
            )
            .drop("_k2", "_pe")
        )
    span = (
        (
            F.unix_micros(F.col(f"t{len(steps)}"))
            - F.unix_micros(F.col("t1"))
        ).cast("double")
        / 1_000_000.0
    )
    if until is not None:
        u = events.filter(_step_pred(until, analyzer)).select(
            F.col(by).alias("_ku"),
            _pack(F.col(ts_col), id_col).alias("_pu"),
        )
        n = len(steps)
        seq = seq.join(
            u,
            (seq["_k"] == u["_ku"])
            & (u["_pu"] > seq["_p1"])
            & (u["_pu"] <= seq[f"_p{n}"]),
            "left_anti",
        )
    for m in missing:
        mf = events.filter(_step_pred(m["query"], analyzer)).select(
            F.col(by).alias("_km"),
            F.col(ts_col).alias("_tm"),
            _pack(F.col(ts_col), id_col).alias("_pm"),
        )
        n = len(steps)
        pos = m["after"]
        cond = seq["_k"] == mf["_km"]
        if pos == 0:
            # leading: no matching event in the maxspan window BEFORE
            # the first step (strictly earlier in the packed order)
            span_us = int(maxspan_s * 1_000_000)
            cond = cond & (mf["_pm"] < seq["_p1"]) & (
                F.unix_micros(seq["t1"]) - F.unix_micros(mf["_tm"])
                <= F.lit(span_us)
            )
        elif pos == n:
            # trailing: none in the maxspan window AFTER the last step
            span_us = int(maxspan_s * 1_000_000)
            cond = cond & (mf["_pm"] > seq[f"_p{n}"]) & (
                F.unix_micros(mf["_tm"]) - F.unix_micros(seq[f"t{n}"])
                <= F.lit(span_us)
            )
        else:
            # in between: strictly inside the neighboring positives'
            # packed positions (the sequence span already bounds it)
            cond = cond & (mf["_pm"] > seq[f"_p{pos}"]) & (
                mf["_pm"] < seq[f"_p{pos + 1}"]
            )
        seq = seq.join(mf, cond, "left_anti")
    # with per-step keys only the GLOBAL field is output (the step
    # fields differ per step; the ids recover them)
    key_out = (
        F.col("_k").getField("k0").alias(by) if extra
        else F.col("_k").alias(by)
    )
    out_cols = [key_out]
    for i in range(1, len(steps) + 1):
        out_cols += [F.col(f"t{i}"), F.col(f"id{i}")]
    return seq.select(*out_cols, F.round(span, 6).alias("span_s"))


def eql_sample(
    events: DataFrame,
    filters: list[dict],
    by: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    analyzer=None,
) -> DataFrame:
    """EQL ``sample by <key> [f1] [f2] …`` (ES 8.6+): find keys where
    EVERY filter matched at least once — no temporal ordering, no
    maxspan (the documented contrast with ``sequence``) — and return
    one sample combination per key.  ES picks an arbitrary matching
    event per filter; deterministically here the EARLIEST (packed
    (ts, id)) event per (key, filter) is the sample — the same
    S13-class documented total order the samplers use.

    Plan: each filter prunes the corpus first, collapses to one row
    per key in ONE hash agg over the packed decimal (min — map-side
    combinable), recovers its columns by a self-join on the packed
    key, and the per-filter frames inner-join on the key (keys
    missing any filter drop, as in ES).  Returns
    ``(by, t1, id1, …, tn, idn)``.
    """
    if len(filters) < 2:
        raise ValueError("a sample needs at least 2 filters")
    out = None
    for i, flt in enumerate(filters, start=1):
        f = events.filter(_step_pred(flt, analyzer))
        rows = f.select(
            F.col(by).alias("_k"),
            F.col(ts_col).alias(f"t{i}"),
            F.col(id_col).cast("long").alias(f"id{i}"),
            _pack(F.col(ts_col), id_col).alias(f"_p{i}"),
        )
        earliest = rows.groupBy("_k").agg(F.min(f"_p{i}").alias("_pe"))
        picked = earliest.join(
            rows.withColumnRenamed("_k", "_k2"),
            (earliest["_k"] == F.col("_k2"))
            & (F.col(f"_p{i}") == earliest["_pe"]),
        ).select("_k", f"t{i}", f"id{i}")
        out = picked if out is None else out.join(picked, "_k")
    return out.withColumnRenamed("_k", by)


def eql_join(
    events: DataFrame,
    filters: list[dict],
    by: str,
    until: dict | str | None = None,
    ts_col: str = "ts",
    id_col: str = "event_id",
    analyzer=None,
) -> DataFrame:
    """EQL legacy ``join by <key> [f1] [f2] … [until [u]]`` — the
    original EQL language's UNORDERED key-correlated variant
    (eql.readthedocs.io grammar; Elasticsearch's EQL lists ``join``
    under unsupported syntax and shipped ``sample`` as the 8.6
    replacement — implemented here for parity with the legacy
    language, deprecated upstream).

    Semantics: a key matches when EVERY filter matched at least once,
    in any order.  Like ``sample``, the deterministic rendering picks
    the EARLIEST (packed ts, id) event per (key, filter).  ``until``
    carries the sequence-until contract into the unordered world: the
    join COMPLETES at the latest of its per-filter earliest positions,
    and an until-event for the same key at or before that completion
    position expires it (state flushed, as a streaming evaluator
    would); joins completed strictly before the until-event stand.

    Documented refinement (same class as the sequence docs' S28
    notes): the until test is applied to the GLOBAL earliest pick per
    (key, filter) only.  An event-by-event streaming evaluator whose
    state is flushed by the until could RE-complete the join from
    events after the flush — e.g. f1@t1, until@t2, f2@t3, f1@t5
    yields no match here (the global join completes at t3 and the
    t2 until expires it) but would match (t5, t3) downstream of the
    flush in a live evaluator.  This rendering therefore
    UNDER-reports relative to a replaying evaluator; the oracle
    mirrors the same deterministic contract.

    Plan shape (identical scale story to ``eql_sample``): per filter,
    one filtered scan collapses to one row per key in ONE map-side-
    combinable hash agg over the packed decimal, columns recover by a
    self-join on the packed key, per-filter frames inner-join on the
    key; ``until`` adds one more filtered frame, one min-agg, and one
    broadcast-size left join — no corpus re-scan, nothing unbounded.
    Returns ``(by, t1, id1, …, tn, idn)``.
    """
    if len(filters) < 2:
        raise ValueError("a join needs at least 2 filters")
    out = None
    packs = []
    for i, flt in enumerate(filters, start=1):
        f = events.filter(_step_pred(flt, analyzer))
        rows = f.select(
            F.col(by).alias("_k"),
            F.col(ts_col).alias(f"t{i}"),
            F.col(id_col).cast("long").alias(f"id{i}"),
            _pack(F.col(ts_col), id_col).alias(f"_p{i}"),
        )
        earliest = rows.groupBy("_k").agg(F.min(f"_p{i}").alias(f"_pe{i}"))
        picked = earliest.join(
            rows.withColumnRenamed("_k", "_k2"),
            (earliest["_k"] == F.col("_k2"))
            & (F.col(f"_p{i}") == earliest[f"_pe{i}"]),
        ).select("_k", f"t{i}", f"id{i}", f"_pe{i}")
        packs.append(f"_pe{i}")
        out = picked if out is None else out.join(picked, "_k")
    done = F.greatest(*[F.col(p) for p in packs]).alias("_done")
    out = out.withColumn("_done", done)
    if until is not None:
        u = events.filter(_step_pred(until, analyzer)).select(
            F.col(by).alias("_k"),
            _pack(F.col(ts_col), id_col).alias("_pu"),
        )
        ue = u.groupBy("_k").agg(F.min("_pu").alias("_pue"))
        out = out.join(ue, "_k", "left").filter(
            F.col("_pue").isNull() | (F.col("_pue") > F.col("_done"))
        ).drop("_pue")
    return out.drop("_done", *packs).withColumnRenamed("_k", by)


# ---------------------------------------------------------------------------
# the text EQL endpoint
# ---------------------------------------------------------------------------

_SPAN_UNITS_S = {"s": 1, "m": 60, "h": 3600, "d": 86400}


_EQL_STR_RE = re.compile(r'"(?:[^"\\]|\\.)*"')


def _sub_outside_strings(pattern: str, repl, text: str) -> str:
    """re.sub applied ONLY outside double-quoted literals — the EQL
    pre-rewrites must never reach inside quoted text (self-review
    r10: ``msg == "x == null"`` used to become ``msg = 'x  IS NULL '``)."""
    out, pos = [], 0
    for m in _EQL_STR_RE.finditer(text):
        out.append(re.sub(pattern, repl, text[pos:m.start()], flags=re.I))
        out.append(m.group(0))
        pos = m.end()
    out.append(re.sub(pattern, repl, text[pos:], flags=re.I))
    return "".join(out)


def _eql_expr(cond: str) -> str:
    """An EQL condition → a Spark SQL boolean expression, through the
    shared ES|QL dialect translation (`==`/string-literal/LIKE
    wildcard handling are identical between the two languages), plus
    the EQL-only spellings: ``== null`` / ``!= null`` → ``IS [NOT]
    NULL``, ``field regex "..."`` → ``RLIKE``, and the
    case-INsensitive ``regex~`` → ``RLIKE "(?i)…"`` (both regex
    dialects honor the inline flag).  All pre-rewrites are
    string-literal-aware."""
    from monstache_spark.operators.esql import _tr_expr

    cond = _sub_outside_strings(r"!=\s*null\b", " IS NOT NULL ", cond)
    cond = _sub_outside_strings(r"==\s*null\b", " IS NULL ", cond)
    # regex / regex~: the operator sits right BEFORE a pattern
    # literal; ~ injects the case-insensitivity flag INTO the literal
    # ((?i) — both regex dialects honor the inline flag), which a
    # plain outside-substitution could never do
    out, pos = [], 0
    for m in _EQL_STR_RE.finditer(cond):
        outside, lit = cond[pos:m.start()], m.group(0)
        m2 = re.search(r"\bregex\s*(~?)\s*$", outside, re.I)
        if m2:
            outside = outside[:m2.start()] + " RLIKE "
            if m2.group(1):
                lit = '"(?i)' + lit[1:]
        out.append(outside)
        out.append(lit)
        pos = m.end()
    out.append(cond[pos:])
    return _tr_expr("".join(out))


def _split_outside(s: str, sep: str) -> list[str]:
    """Split on a single-char separator outside double quotes and
    outside ``[...]`` groups.  Double quotes only, deliberately:
    the EQL grammar has no single-quoted strings (unlike the SQL
    the esql scanners must also handle), so a quote here is always
    a string delimiter."""
    parts, cur, depth, in_str = [], [], 0, False
    escaped = False  # toggling flag: "…\\\\" closes, "…\\"" doesn't
    for i, ch in enumerate(s):
        if in_str:
            cur.append(ch)
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _parse_step_body(body: str, category_col: str) -> str:
    """``<category> where <condition>`` → one SQL predicate string.
    ``any`` matches every category (no category conjunct)."""
    m = re.match(r"^\s*([A-Za-z_][\w.]*|\*)\s+where\b(.*)$", body, re.S | re.I)
    if not m:
        raise ValueError(f"expected `<category> where <condition>`: {body!r}")
    cat, cond = m.group(1), m.group(2).strip()
    pred = f"({_eql_expr(cond)})"
    if cat.lower() not in ("any", "*"):
        esc = cat.replace("'", "''")
        pred = f"({category_col} = '{esc}') AND {pred}"
    return pred


def _find_groups(text: str):
    """Yield ``(negated, inner, modifier_text)`` per bracketed step,
    quote-aware — ``modifier_text`` is the raw text between this
    group's ``]`` and the next ``[``/``!``/end (step-level ``by`` and
    ``with runs=N`` live there)."""
    groups = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\n":
            i += 1
            continue
        neg = False
        if ch == "!":
            neg = True
            i += 1
            while i < n and text[i] in " \t\n":
                i += 1
            if i >= n or text[i] != "[":
                raise ValueError("`!` must prefix a [ ... ] step")
            ch = text[i]
        if ch != "[":
            raise ValueError(f"expected `[` at: {text[i:i+30]!r}")
        depth, j, in_str = 0, i, False
        escaped = False
        while j < n:
            cj = text[j]
            if in_str:
                if escaped:
                    escaped = False
                elif cj == "\\":
                    escaped = True
                elif cj == '"':
                    in_str = False
            elif cj == '"':
                in_str = True
            elif cj == "[":
                depth += 1
            elif cj == "]":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise ValueError(f"unbalanced [ ] in: {text!r}")
        inner = text[i + 1:j]
        k = j + 1
        nxt = k
        while nxt < n and text[nxt] not in "[!":
            nxt += 1
        groups.append((neg, inner, text[k:nxt]))
        i = nxt
    return groups


def _parse_by_with(text: str):
    """Parse ``by f1[, f2]`` and ``with maxspan=Ns`` / ``with runs=N``
    modifiers out of header/step-trailer text."""
    by_fields: list[str] = []
    maxspan_s = None
    runs = None
    # finditer + duplicate checks, not search: the leftover sweep
    # below strips EVERY `by`/`with` occurrence, so a duplicated
    # modifier (`by a by b`, `with runs=2 with runs=3`) must refuse
    # here or it would be silently swallowed (round-11 ADVICE)
    by_matches = list(re.finditer(
        r"\bby\s+([A-Za-z_][\w.]*(?:\s*,\s*[A-Za-z_][\w.]*)*)",
        text, re.I))
    if len(by_matches) > 1:
        raise ValueError(
            f"duplicated `by` modifier in: {text.strip()!r}"
        )
    if by_matches:
        by_fields = [f.strip() for f in by_matches[0].group(1).split(",")]
    for wm in re.finditer(r"\bwith\s+(\w+)\s*=\s*(\w+)", text, re.I):
        key, val = wm.group(1).lower(), wm.group(2)
        if key == "maxspan":
            if maxspan_s is not None:
                raise ValueError(
                    f"duplicated `with maxspan` in: {text.strip()!r}"
                )
            sm = re.fullmatch(r"(\d+)([smhd])", val)
            if not sm:
                raise ValueError(f"bad maxspan (use Ns/Nm/Nh/Nd): {val!r}")
            maxspan_s = int(sm.group(1)) * _SPAN_UNITS_S[sm.group(2)]
        elif key == "runs":
            if runs is not None:
                raise ValueError(
                    f"duplicated `with runs` in: {text.strip()!r}"
                )
            runs = int(val)
        else:
            raise ValueError(f"unsupported `with` option: {key!r}")
    leftover = re.sub(r"\bby\s+[A-Za-z_][\w.]*(?:\s*,\s*[A-Za-z_][\w.]*)*",
                      "", text, flags=re.I)
    leftover = re.sub(r"\bwith\s+\w+\s*=\s*\w+", "", leftover, flags=re.I)
    if leftover.strip():
        raise ValueError(f"unparsed sequence modifier text: {leftover.strip()!r}")
    return by_fields, maxspan_s, runs


def eql(
    query: str,
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    category_col: str = "event_type",
    analyzer=None,
) -> DataFrame:
    """Run a TEXT EQL query — the actual ES Event Query Language —
    against an event frame.  Supported grammar (the surface the dict
    operators below implement, now reachable as the language):

    * ``<category> where <cond> [| head N | tail N]`` — simple event
      query; ``any where …`` skips the category conjunct
    * ``sequence [by f] [with maxspan=Nu] [cat where …] [by g]
      [with runs=N] ![cat where …] … [until [cat where …]]`` —
      per-step ``by``/``runs`` modifiers, missing-event steps, until
    * ``sample by f [cat where …] [cat where …] …``
    * ``join by f [cat where …] [cat where …] … [until [cat where …]]``
      — the legacy unordered variant (``eql_join``); pipes order by
      the join's completion position (latest per-filter earliest)
    * pipes ``| head N`` / ``| tail N`` (the only two ES supports) —
      on sequences they order by the packed (t1, id1) position of the
      sequence's FIRST event (deterministic; documented refinement of
      ES's response order)

    Conditions ride the shared ES|QL dialect translation (``==``,
    double-quoted strings, ``LIKE`` wildcards) plus EQL's ``== null``
    and ``regex`` spellings.  The category is an equality on
    ``category_col`` (ES's event.category routing).  One global
    ``by`` field; write per-step ``by`` on every step for composite
    keys (the same key-tuple semantics).
    """
    segs = _split_outside(query.strip(), "|")
    head_txt = segs[0].strip()
    # pipes are an ORDERED chain (ES applies them sequentially —
    # `head 10 | tail 3` = the last 3 of the first 10; self-review
    # r10: last-wins assignment returned wrong row counts)
    pipes: list[tuple[str, int]] = []
    for pipe in segs[1:]:
        pm = re.fullmatch(r"\s*(head|tail)\s+(\d+)\s*", pipe, re.I)
        if not pm:
            raise ValueError(
                f"unsupported pipe: {pipe.strip()!r} (ES EQL supports "
                "head/tail only)"
            )
        pipes.append((pm.group(1).lower(), int(pm.group(2))))

    def _apply_pipes(df: DataFrame, order_pack_fn) -> DataFrame:
        if not pipes:
            return df
        p = order_pack_fn()  # lazy: only built when a pipe needs it
        for kind_, n in pipes:
            if kind_ == "head":
                df = df.orderBy(p.asc()).limit(n)
            else:
                df = df.orderBy(p.desc()).limit(n)
        return df

    kind = head_txt.split(None, 1)[0].lower() if head_txt else ""
    if kind not in ("sequence", "sample", "join"):
        # simple event query
        df = events.filter(
            _step_pred(_parse_step_body(head_txt, category_col), analyzer)
        )
        return _apply_pipes(df, lambda: _pack(F.col(ts_col), id_col))

    rest = head_txt.split(None, 1)[1] if " " in head_txt else ""
    # split off `until [ ... ]` — a quote/bracket-aware scan (a plain
    # re.split would match a `until` inside a string literal or a
    # step condition; self-review r10)
    until_q = None
    upos = None
    depth, in_str = 0, False
    for m in re.finditer(r"\buntil\b", rest, re.I):
        seg = rest[:m.start()]
        depth = in_str = 0
        escaped = False
        i = 0
        while i < len(seg):
            ch = seg[i]
            if in_str:
                if escaped:
                    escaped = False
                elif ch == "\\":
                    escaped = True
                elif ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            i += 1
        if depth == 0 and not in_str:
            upos = m.start()
            break
    if upos is not None:
        ugroups = _find_groups(rest[upos + len("until"):].strip())
        rest = rest[:upos]
        if len(ugroups) != 1 or ugroups[0][0]:
            raise ValueError("until takes exactly one positive [ ... ] step")
        if ugroups[0][2].strip():
            raise ValueError(
                f"unparsed text after the until step: "
                f"{ugroups[0][2].strip()!r}"
            )
        until_q = _parse_step_body(ugroups[0][1], category_col)

    first_bracket = rest.find("[")
    bang = rest.find("!")
    if bang != -1 and (first_bracket == -1 or bang < first_bracket):
        first_bracket = bang
    if first_bracket == -1:
        raise ValueError(f"{kind} needs [ ... ] steps")
    header, body = rest[:first_bracket], rest[first_bracket:]
    g_by, maxspan_s, g_runs = _parse_by_with(header)
    if g_runs is not None:
        raise ValueError("`with runs` is a step modifier, not a header one")
    if len(g_by) > 1:
        raise ValueError(
            "one global `by` field here — write per-step `by` on every "
            "step for composite keys (same key-tuple semantics)"
        )

    steps: list = []
    filters: list = []
    for neg, inner, mods in _find_groups(body):
        pred = _parse_step_body(inner, category_col)
        s_by, s_span, s_runs = _parse_by_with(mods)
        if s_span is not None:
            raise ValueError("maxspan is a sequence header modifier")
        if kind in ("sample", "join"):
            if neg or s_by or s_runs:
                raise ValueError(f"{kind} steps take no !/by/runs modifiers")
            filters.append(pred)
            continue
        if neg:
            if s_by or s_runs:
                raise ValueError("a missing step takes no by/runs modifiers")
            steps.append({"missing": pred})
        else:
            step: dict = {"query": pred}
            if s_by:
                step["by"] = s_by
            if s_runs:
                step["runs"] = s_runs
            steps.append(step if len(step) > 1 else pred)

    if kind == "sample":
        if not g_by:
            raise ValueError("sample needs `by <field>`")
        if until_q is not None:
            raise ValueError(
                "until is not defined over sample (no temporal state "
                "to expire) — ES rejects it too"
            )
        if pipes:
            raise ValueError("pipes are not defined over sample results")
        if maxspan_s is not None:
            raise ValueError(
                "maxspan is not defined over sample (no temporal ordering)"
            )
        return eql_sample(
            events, filters, by=g_by[0], ts_col=ts_col, id_col=id_col,
            analyzer=analyzer,
        )

    if kind == "join":
        if not g_by:
            raise ValueError("join needs `by <field>`")
        if maxspan_s is not None:
            raise ValueError(
                "maxspan is not defined over join (unordered matching "
                "is its documented contrast with sequence)"
            )
        df = eql_join(
            events, filters, by=g_by[0], until=until_q,
            ts_col=ts_col, id_col=id_col, analyzer=analyzer,
        )
        n = len(filters)
        return _apply_pipes(
            df,
            lambda: F.greatest(
                *[_pack(F.col(f"t{i}"), f"id{i}") for i in range(1, n + 1)]
            ),
        )

    if not g_by:
        raise ValueError("sequence needs `by <field>`")
    df = eql_sequence(
        events, steps, by=g_by[0], ts_col=ts_col, id_col=id_col,
        maxspan_s=maxspan_s, analyzer=analyzer, until=until_q,
    )
    return _apply_pipes(df, lambda: _pack(F.col("t1"), "id1"))
