"""ES aggregations DSL compiled to one Spark hash-aggregation plan.

The reference feeds Elasticsearch so users can run the *other* half of
the ES read path: the aggregations DSL (terms facets, date histograms,
range buckets, stats/percentiles metrics — the queries Kibana issues).
The reference itself never aggregates (SURVEY.md §2.5: aggregation
over sink data is "Elasticsearch query DSL, out of scope of the
daemon"); a Spark-native replacement serves them directly on the
maintained table.  This module compiles the common ES ``aggs`` subset
to a single flattened DataFrame plan:

* bucket aggs: ``terms`` (``size``, ``min_doc_count``, count-desc
  ordering), ``multi_terms`` (compound field-tuple key, rendered as
  one '|'-joined string), ``rare_terms`` (the long-tail complement:
  buckets with total count ≤ ``max_doc_count``), ``histogram``
  (numeric ``interval``), ``date_histogram`` (``calendar_interval``
  hour/day/week/month), ``range`` (half-open ``[from, to)`` ranges; a
  doc lands in every range it matches, as in ES), ``filters`` (named
  bool-query predicates, multi-membership like ES).
* metric aggs: ``avg``, ``sum``, ``min``, ``max``, ``value_count``,
  ``cardinality`` (exact by default; ``precision_threshold`` switches
  to ``approx_count_distinct`` — documented divergence from the
  oracle), ``stats`` (count/min/max/avg/sum columns), ``percentiles``
  (exact interpolated percentiles where ES uses t-digest — documented
  divergence, exactness is the *stronger* contract).
* ``composite``: multi-source grouping with key-ordered ``size``
  truncation.

ES returns nested bucket JSON; a DataFrame engine flattens: one row
per leaf bucket combination carrying every ancestor bucket key, the
leaf ``doc_count``, and the leaf metrics.  That shape is exactly
``GROUP BY <key chain>`` — so the whole tree, however deep, compiles
to ONE hash aggregation (partial + final from Catalyst, no shuffle
per level).  ``terms.size`` truncation happens AFTER the agg on the
already-bucket-sized frame via a window rank over ancestor keys —
O(#buckets), never a second corpus pass.

Scale notes (100 TB): the input is touched exactly once; bucket key
assignment is a codegen projection (`date_trunc`, `floor`, CASE);
only ``range``/``filters`` explode, with amplification bounded by the
number of ranges (user-written, single digits); everything after the
groupBy is bucket-cardinality-sized.  No driver-side collection.

Reference parity evidence: monstache routes every indexed doc into ES
precisely so these aggregations work there (bulk request construction
monstache.go:3160-3245); the DSL semantics follow the public ES
aggregations contract.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from monstache_spark.operators.search import compile_bool_query
from monstache_spark.session import spread_scan

_METRIC_KINDS = {
    "avg",
    "sum",
    "min",
    "max",
    "value_count",
    "cardinality",
    "stats",
    "extended_stats",
    "weighted_avg",
    "percentiles",
    "percentile_ranks",
    "boxplot",
}

_BUCKET_KINDS = {
    "terms",
    "multi_terms",
    "rare_terms",
    "histogram",
    "date_histogram",
    "range",
    "date_range",
    "filter",
    "filters",
    "missing",
}

_CALENDAR_TRUNC = {
    "second": "second",
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "week": "week",
    "month": "month",
    "quarter": "quarter",
    "year": "year",
}

# sequence step per calendar unit for min_doc_count=0 gap filling
_CALENDAR_STEP = {
    "second": "INTERVAL 1 SECOND",
    "minute": "INTERVAL 1 MINUTE",
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "week": "INTERVAL 7 DAY",
    "month": "INTERVAL 1 MONTH",
    "quarter": "INTERVAL 3 MONTH",
    "year": "INTERVAL 1 YEAR",
}

_FIXED_INTERVAL_RE = re.compile(r"^(\d+)(s|m|h|d)$")
_FIXED_UNIT_S = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def fixed_interval_seconds(iv) -> int | None:
    """ES ``fixed_interval`` string (``30s``, ``10m``, ``3h``, ``7d``)
    → width in seconds, or None if ``iv`` isn't a fixed interval."""
    m = _FIXED_INTERVAL_RE.match(str(iv)) if iv is not None else None
    if not m:
        return None
    return int(m.group(1)) * _FIXED_UNIT_S[m.group(2)]


def _dh_trunc(iv):
    """(trunc callable, gap-fill step SQL) for a date_histogram
    interval.  Calendar names truncate via ``date_trunc``; ES
    ``fixed_interval`` strings (``30s``, ``10m``, …) floor exact epoch
    MICROS with integer ``pmod`` arithmetic — no float division, so
    bucket edges are engine-exact (UTC/epoch-aligned, the fixed-
    interval contract; the session pins UTC)."""
    if iv in _CALENDAR_TRUNC:
        unit = _CALENDAR_TRUNC[iv]
        return (lambda c: F.date_trunc(unit, c)), _CALENDAR_STEP[unit]
    w = fixed_interval_seconds(iv)
    if w is None:
        raise ValueError(f"unsupported date_histogram interval: {iv}")
    w_us = w * 1_000_000

    def trunc(c):
        us = F.unix_micros(c)
        return F.timestamp_micros(us - F.pmod(us, F.lit(w_us)))

    return trunc, f"INTERVAL {w} SECOND"


def _pct_suffix(p: float) -> str:
    """Lossless, collision-free column suffix for a percentile value:
    50.0 -> '50', 99.9 -> '99_9', 10.05 -> '10_05'.  (A naive
    str(p).replace('.0','') corrupts interior '.0' — 10.05 -> '105' —
    and can collide: 1.05 and 15.0 both -> '15'.)"""
    return f"{p:g}".replace(".", "_")


def _one(d: dict) -> tuple[str, dict]:
    body = {k: v for k, v in d.items() if k != "aggs"}
    if len(body) != 1:
        raise ValueError(f"aggregation must have exactly one kind: {sorted(body)}")
    ((kind, spec),) = body.items()
    return kind, spec


def _bucket_key_col(kind: str, spec: dict) -> Column:
    """Key expression for single-membership bucket kinds.  ES's
    ``missing`` parameter maps null keys to the given bucket value
    instead of dropping the docs (terms only here — the numeric kinds
    keep ES's default drop)."""
    if kind == "multi_terms":
        # ES multi_terms: the key is the field TUPLE; docs missing any
        # field drop (ES contract).  A DataFrame flattening renders the
        # tuple as one '|'-joined string key.
        fields = [F.col(t["field"]) for t in spec["terms"]]
        all_present = F.lit(True)
        for f in fields:
            all_present = all_present & f.isNotNull()
        return F.when(
            all_present, F.concat_ws("|", *[f.cast("string") for f in fields])
        )
    field = F.col(spec["field"])
    if kind in ("terms", "rare_terms"):
        key = field.cast("string")
        if "missing" in spec:
            key = F.coalesce(key, F.lit(str(spec["missing"])))
        # ES include/exclude: a full-match regex or a literal value
        # list restricting which terms become buckets (docs whose key
        # is excluded drop, they don't land in other buckets) — a
        # codegen predicate on the key, evaluated before the agg
        keep = F.lit(True)
        inc, exc = spec.get("include"), spec.get("exclude")
        if inc is not None:
            keep = keep & (
                key.isin(list(inc))
                if isinstance(inc, (list, tuple))
                else key.rlike(f"^(?:{inc})$")
            )
        if exc is not None:
            keep = keep & ~(
                key.isin(list(exc))
                if isinstance(exc, (list, tuple))
                else key.rlike(f"^(?:{exc})$")
            )
        if inc is not None or exc is not None:
            key = F.when(keep, key)
        return key
    if kind == "histogram":
        interval = float(spec["interval"])
        return (
            F.floor(field.cast("double") / F.lit(interval)) * F.lit(interval)
        ).cast("double")
    if kind == "date_histogram":
        iv = spec.get("calendar_interval") or spec.get("fixed_interval")
        trunc, _ = _dh_trunc(iv)
        key = trunc(field)
        hb = spec.get("hard_bounds")
        if hb:
            # ES hard_bounds: the NARROWING variant (extended_bounds
            # only extends) — buckets strictly outside [min, max] are
            # dropped even when they hold data, via key nulling (null
            # keys drop in every downstream path)
            lo = trunc(F.lit(hb["min"]).cast("timestamp"))
            hi = trunc(F.lit(hb["max"]).cast("timestamp"))
            key = F.when((key >= lo) & (key <= hi), key)
        return key
    if kind == "missing":
        # ES missing agg: ONE bucket counting docs where the field is
        # null/absent — inverted null handling (null keys normally
        # drop), expressed as a constant key on exactly those rows
        return F.when(field.isNull(), F.lit("missing"))
    raise ValueError(kind)


def _filter_bucket_key(spec: dict) -> Column:
    """ES singular ``filter`` agg: ONE bucket holding the docs
    matching a bool query — a constant key on matching rows (null
    elsewhere → dropped), so sub-aggs scope to the filtered set."""
    return F.when(compile_bool_query(spec), F.lit("filter"))


def _multi_membership_keys(kind: str, spec: dict) -> Column:
    """Array of bucket keys a row belongs to (range / filters).

    ES range buckets are half-open ``[from, to)`` and may overlap — a
    doc can land in several; ``filters`` likewise.  The array is built
    in one codegen projection and exploded; amplification is bounded
    by the (small, user-written) bucket count.
    """
    if kind == "range":
        field = F.col(spec["field"]).cast("double")
        keys = []
        for r in spec["ranges"]:
            lo, hi = r.get("from"), r.get("to")
            name = r.get("key") or f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (field >= F.lit(float(lo)))
            if hi is not None:
                cond = cond & (field < F.lit(float(hi)))
            keys.append(F.when(cond & field.isNotNull(), F.lit(name)))
        return F.array_compact(F.array(*keys))
    if kind == "date_range":
        # ES date_range: half-open [from, to) over a date field, with
        # DATE-MATH endpoints resolved against an EXPLICIT `now`
        # anchor (search.resolve_date_math — deterministic, no
        # wall-clock read); the default bucket key renders the
        # resolved endpoints
        from monstache_spark.operators.search import resolve_date_math

        field = F.col(spec["field"]).cast("timestamp")
        now = spec.get("now")
        keys = []
        for r in spec["ranges"]:
            lo = resolve_date_math(str(r["from"]), now) if "from" in r else None
            hi = resolve_date_math(str(r["to"]), now) if "to" in r else None
            name = r.get("key") or f"{lo or '*'}-{hi or '*'}"
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (field >= F.lit(lo).cast("timestamp"))
            if hi is not None:
                cond = cond & (field < F.lit(hi).cast("timestamp"))
            keys.append(F.when(cond & field.isNotNull(), F.lit(name)))
        return F.array_compact(F.array(*keys))
    if kind == "filters":
        conds = [
            (name, compile_bool_query(q))
            for name, q in sorted(spec["filters"].items())
        ]
        keys = [F.when(c, F.lit(name)) for name, c in conds]
        other = spec.get("other_bucket_key")
        if other is None and spec.get("other_bucket"):
            other = "_other_"
        if other is not None:
            # ES other_bucket: docs matching NO named filter land in
            # one extra bucket — the complement predicate, same
            # single-projection shape.  Each condition coalesces to
            # FALSE first: a NULL predicate (null field in a term/
            # range) means "did not match", and ES counts such docs
            # in the other bucket — bare ~NULL stays NULL and would
            # silently drop them from the agg
            none_matched = F.lit(True)
            for _n, c in conds:
                none_matched = none_matched & ~F.coalesce(c, F.lit(False))
            keys.append(F.when(none_matched, F.lit(str(other))))
        return F.array_compact(F.array(*keys))
    raise ValueError(kind)


def _metric_exprs(name: str, kind: str, spec: dict) -> list[Column]:
    """Aggregate expressions for one metric agg, aliased ``name`` (or
    ``name_<stat>`` for the multi-column kinds).

    sum/avg/stats accumulate in exact ``decimal(38,6)`` and cast the
    result to double — order-independent, so totals are identical on
    any engine and any partitioning (float summation order is not).
    """
    if kind == "weighted_avg":
        # ES weighted_avg: Σ(value·weight)/Σ(weight), both sums exact
        # decimal so the quotient's inputs are engine-identical
        v = F.col(spec["value"]["field"]).cast("decimal(38,6)")
        wt = F.col(spec["weight"]["field"]).cast("decimal(38,6)")
        both = v.isNotNull() & wt.isNotNull()
        num = F.sum(F.when(both, (v * wt).cast("decimal(38,6)"))).cast("double")
        den = F.sum(F.when(both, wt)).cast("double")
        return [(num / den).alias(name)]
    field = F.col(spec["field"])
    dec = field.cast("decimal(38,6)")
    exact_sum = F.sum(dec).cast("double")
    exact_avg = F.sum(dec).cast("double") / F.count(field).cast("double")
    if kind == "avg":
        return [exact_avg.alias(name)]
    if kind == "sum":
        return [exact_sum.alias(name)]
    if kind == "min":
        return [F.min(field).alias(name)]
    if kind == "max":
        return [F.max(field).alias(name)]
    if kind == "value_count":
        return [F.count(field).cast("long").alias(name)]
    if kind == "cardinality":
        if "precision_threshold" in spec:
            # ES cardinality is HLL-approximate; expose the same
            # behavior behind the explicit knob.  Default stays exact
            # (stronger than ES, and oracle-checkable).
            return [
                F.approx_count_distinct(field, 0.02).cast("long").alias(name)
            ]
        return [F.countDistinct(field).cast("long").alias(name)]
    if kind == "stats":
        return [
            F.count(field).cast("long").alias(f"{name}_count"),
            F.min(field.cast("double")).alias(f"{name}_min"),
            F.max(field.cast("double")).alias(f"{name}_max"),
            exact_avg.alias(f"{name}_avg"),
            exact_sum.alias(f"{name}_sum"),
        ]
    if kind == "percentiles":
        pcts = spec.get("percents", [25.0, 50.0, 75.0])
        if spec.get("approx"):
            # the 100 TB path: ES itself is t-digest-approximate here;
            # approx_percentile is a mergeable sketch (no global sort,
            # no exact-percentile buffer). Not oracle-hashable — the
            # default stays exact.
            acc = int(spec.get("accuracy", 10000))
            return [
                F.approx_percentile(
                    field.cast("double"), F.lit(p / 100.0), F.lit(acc)
                ).alias(f"{name}_p{_pct_suffix(p)}")
                for p in pcts
            ]
        return [
            F.round(F.percentile(field.cast("double"), F.lit(p / 100.0)), 6).alias(
                f"{name}_p{_pct_suffix(p)}"
            )
            for p in pcts
        ]
    if kind == "extended_stats":
        # ES extended_stats: stats + sum_of_squares / variance /
        # std_deviation.  Sums accumulate exact decimal; variance =
        # sos/n − mean² computed from those identical doubles, and
        # std = sqrt(variance) — IEEE-754 sqrt is correctly rounded,
        # so even the square root is engine-exact (no libm contract
        # needed).  Population variance, as ES reports.
        sos = F.sum((dec * dec).cast("decimal(38,6)")).cast("double")
        n = F.count(field).cast("double")
        mean = exact_sum / n
        # clamp: sos/n − mean² can cancel to a tiny NEGATIVE double
        # for constant/near-constant buckets; sqrt would yield NaN
        # where ES reports 0
        variance = F.greatest(sos / n - mean * mean, F.lit(0.0))
        return [
            F.count(field).cast("long").alias(f"{name}_count"),
            F.min(field.cast("double")).alias(f"{name}_min"),
            F.max(field.cast("double")).alias(f"{name}_max"),
            exact_avg.alias(f"{name}_avg"),
            exact_sum.alias(f"{name}_sum"),
            sos.alias(f"{name}_sum_of_squares"),
            F.round(variance, 6).alias(f"{name}_variance"),
            F.round(F.sqrt(variance), 6).alias(f"{name}_std_deviation"),
        ]
    if kind == "boxplot":
        # ES boxplot: min/max/q1/q2/q3 — exact interpolated quartiles
        # (ES is t-digest; exactness is the stronger contract, as with
        # percentiles), rounded 6 dp
        return [
            F.min(field.cast("double")).alias(f"{name}_min"),
            F.max(field.cast("double")).alias(f"{name}_max"),
            F.round(F.percentile(field.cast("double"), F.lit(0.25)), 6).alias(
                f"{name}_q1"
            ),
            F.round(F.percentile(field.cast("double"), F.lit(0.5)), 6).alias(
                f"{name}_q2"
            ),
            F.round(F.percentile(field.cast("double"), F.lit(0.75)), 6).alias(
                f"{name}_q3"
            ),
        ]
    if kind == "percentile_ranks":
        # ES percentile_ranks: for each requested value, the percent
        # of field values ≤ it.  ES interpolates on a t-digest sketch;
        # this is the EXACT empirical CDF — 100·|{x ≤ v}| / N, the
        # stronger contract (same stance as the exact percentiles
        # above), rounded to 6 decimals from integer counts so every
        # engine agrees bit-for-bit.
        return [
            F.round(
                F.sum(
                    F.when(field <= F.lit(v), F.lit(1)).otherwise(F.lit(0))
                ).cast("double")
                / F.count(field).cast("double")
                * F.lit(100.0),
                6,
            ).alias(f"{name}_rank_{_pct_suffix(float(v))}")
            for v in spec["values"]
        ]
    raise ValueError(f"unsupported metric aggregation: {kind}")


def compile_aggs(df: DataFrame, aggs: dict) -> DataFrame:
    """Compile an ES ``aggs`` tree over ``df`` to one flattened plan.

    ``aggs`` is the ES request subset documented in the module
    docstring: a dict of ``name -> {kind: spec, "aggs": {...}}``.  At
    most one *bucket* agg is allowed per level (ES allows sibling
    bucket aggs — :func:`compile_sibling_aggs` compiles those into a
    union of independent single-pass plans); metric siblings are
    unlimited.

    Returns one row per leaf bucket combination: a ``<name>`` key
    column per bucket level (string for terms/range/filters, double
    for histogram, timestamp for date_histogram), ``doc_count``
    (leaf), and the metric columns.  Rows whose bucket key is null
    (missing field) are dropped, as in ES.  ``terms`` ordering is
    ES's default — doc_count desc, key asc — applied *within* the
    parent bucket when truncating to ``size``.
    """
    key_names: list[str] = []
    # (name, size, min_doc_count, order) per terms level, applied post-agg
    truncations: list[tuple[str, int | None, int, dict | None]] = []
    # (name, max_doc_count) per rare_terms level, applied post-agg
    rare_filters: list[tuple[str, int]] = []
    # (name, spec) when a date_histogram asks for min_doc_count=0
    date_fill: tuple[str, dict] | None = None
    # (name, spec) when a numeric histogram asks for min_doc_count=0
    hist_fill: tuple[str, dict] | None = None
    metrics: list[Column] = []
    # frame snapshot taken right after each terms level's key column is
    # assigned — BEFORE any child level's explode / null-drop — so a
    # non-leaf terms bucket's total doc count matches ES's parent
    # doc_count (children with a missing key still count toward the
    # parent; multi-membership children don't double-count it)
    level_frames: dict[str, DataFrame] = {}
    out = df

    node = aggs
    while node:
        bucket_items = []
        for name, body in node.items():
            kind, spec = _one(body)
            if kind in _METRIC_KINDS:
                metrics.extend(_metric_exprs(name, kind, spec))
            elif kind in _BUCKET_KINDS:
                bucket_items.append((name, kind, spec, body.get("aggs") or {}))
            elif kind == "composite":
                raise ValueError("composite must be the only, top-level agg")
            else:
                raise ValueError(f"unsupported aggregation kind: {kind}")
        if len(bucket_items) > 1:
            raise ValueError(
                "one bucket agg per level; use compile_sibling_aggs for "
                "sibling bucket aggs"
            )
        if not bucket_items:
            break
        name, kind, spec, child = bucket_items[0]
        if kind == "date_histogram" and int(spec.get("min_doc_count", 1)) == 0:
            date_fill = (name, spec)
        if kind == "histogram" and int(spec.get("min_doc_count", 1)) == 0:
            hist_fill = (name, spec)
        if kind in ("range", "date_range", "filters"):
            out = out.withColumn(
                name, F.explode(_multi_membership_keys(kind, spec))
            )
        elif kind == "filter":
            out = out.withColumn(name, _filter_bucket_key(spec))
        else:
            out = out.withColumn(name, _bucket_key_col(kind, spec))
            if kind in ("terms", "multi_terms"):
                truncations.append(
                    (
                        name,
                        spec.get("size"),
                        int(spec.get("min_doc_count", 1)),
                        spec.get("order"),
                    )
                )
                level_frames[name] = out
            elif kind == "rare_terms":
                # ES rare_terms: buckets whose TOTAL doc count is at
                # most max_doc_count (the long-tail complement of
                # terms) — a post-agg filter, no size truncation
                rare_filters.append(
                    (name, int(spec.get("max_doc_count", 1)))
                )
                level_frames[name] = out
        key_names.append(name)
        node = child

    if not key_names:
        raise ValueError("aggs tree has no bucket aggregation")

    cond = F.lit(True)
    for k in key_names:
        cond = cond & F.col(k).isNotNull()
    grouped = (
        out.filter(cond)
        .groupBy(*key_names)
        .agg(F.count("*").cast("long").alias("doc_count"), *metrics)
    )

    # terms size / min_doc_count: rank buckets by their TOTAL doc
    # count within the parent bucket.  A LEAF terms level needs no
    # bucket-total (total == doc_count), and a leaf with no ancestors
    # top-sizes as orderBy().limit() — TakeOrderedAndProject, no
    # single-partition window even when the bucket cardinality is
    # large.  A NON-leaf terms level's total is computed as its own
    # aggregate over the frame snapshot taken before the child level
    # was assigned — summing leaf doc_counts would undercount parents
    # whose children have missing keys (dropped rows) and double-count
    # under multi-membership children (range/filters explode), either
    # of which can change which top-size parents survive vs ES.  The
    # totals frame is O(#buckets), so the join broadcasts.
    for name, size, min_dc, order in truncations:
        ancestors = key_names[: key_names.index(name)]
        is_leaf = name == key_names[-1]
        if is_leaf:
            total = F.col("doc_count")
        else:
            base = level_frames[name]
            tot_cond = F.lit(True)
            for k in [*ancestors, name]:
                tot_cond = tot_cond & F.col(k).isNotNull()
            totals = (
                base.filter(tot_cond)
                .groupBy(*ancestors, name)
                .agg(F.count("*").cast("long").alias("_bucket_total"))
            )
            grouped = grouped.join(
                F.broadcast(totals), [*ancestors, name], "left"
            )
            total = F.col("_bucket_total")
        if order:
            # ES `order`: rank buckets by a metric sub-agg (or _count /
            # _key) instead of the default count-desc. Metric columns
            # exist only on leaf rows, so metric ordering is a
            # LEAF-level feature (ES itself restricts deep ordering).
            ((okey, odir),) = order.items()
            if okey == "_count":
                ocol = total
            elif okey == "_key":
                ocol = F.col(name)
            elif is_leaf:
                ocol = F.col(okey)
            else:
                raise ValueError(
                    "metric `order` is only supported on the leaf terms level"
                )
            order_exprs = [
                ocol.asc() if odir == "asc" else ocol.desc(),
                F.col(name).asc(),
            ]
        else:
            order_exprs = [total.desc(), F.col(name).asc()]
        if min_dc > 1:
            grouped = grouped.filter(total >= F.lit(min_dc))
        if size is not None:
            exprs = order_exprs or [total.desc(), F.col(name).asc()]
            if is_leaf and not ancestors:
                grouped = grouped.orderBy(*exprs).limit(int(size))
            else:
                part = (
                    Window.partitionBy(*ancestors)
                    if ancestors
                    else Window.partitionBy()
                )
                rank_w = part.orderBy(*exprs)
                grouped = (
                    grouped.withColumn("_r", F.dense_rank().over(rank_w))
                    .filter(F.col("_r") <= F.lit(int(size)))
                    .drop("_r")
                )
        if not is_leaf:
            grouped = grouped.drop("_bucket_total")

    # rare_terms: keep only buckets whose TOTAL doc count is at most
    # max_doc_count — same leaf/non-leaf total derivation as terms
    for name, max_dc in rare_filters:
        ancestors = key_names[: key_names.index(name)]
        if name == key_names[-1]:
            grouped = grouped.filter(F.col("doc_count") <= F.lit(max_dc))
        else:
            base = level_frames[name]
            tot_cond = F.lit(True)
            for k in [*ancestors, name]:
                tot_cond = tot_cond & F.col(k).isNotNull()
            totals = (
                base.filter(tot_cond)
                .groupBy(*ancestors, name)
                .agg(F.count("*").cast("long").alias("_rare_total"))
            )
            grouped = (
                grouped.join(F.broadcast(totals), [*ancestors, name], "left")
                .filter(F.col("_rare_total") <= F.lit(max_dc))
                .drop("_rare_total")
            )

    if hist_fill is not None:
        # numeric histogram gap filling (min_doc_count=0): same
        # timeline contract as the date variant — empty buckets for
        # every interval between the data's min and max bucket (or
        # the union with extended_bounds), metrics null there.  The
        # bucket keys are exact interval multiples, so both engines
        # generate identical timelines from lo + i·interval.
        name, spec = hist_fill
        if len(key_names) != 1:
            raise ValueError(
                "min_doc_count=0 gap filling requires histogram "
                "to be the only bucket level"
            )
        interval = float(spec["interval"])
        data_bounds = grouped.agg(
            F.min(name).alias("_dlo"), F.max(name).alias("_dhi")
        )
        eb = spec.get("extended_bounds")
        if eb:
            qlo = math.floor(float(eb["min"]) / interval) * interval
            qhi = math.floor(float(eb["max"]) / interval) * interval
            bounds = data_bounds.select(
                F.least(F.col("_dlo"), F.lit(qlo)).alias("_lo"),
                F.greatest(F.col("_dhi"), F.lit(qhi)).alias("_hi"),
            )
        else:
            bounds = data_bounds.select(
                F.col("_dlo").alias("_lo"), F.col("_dhi").alias("_hi")
            )
        # _lo/_hi are themselves bucket keys (i·interval for integer
        # i), so recover the INTEGER indices (round, not floor — float
        # division of i·interval by a fractional interval can land a
        # hair under i) and regenerate each timeline key through the
        # IDENTICAL long·double expression the histogram key uses
        # (aggs.py:158).  Generating keys as _lo + i·interval instead
        # accumulates float drift for fractional intervals and the
        # left join then silently drops non-empty data buckets.
        lo_idx = F.round(F.col("_lo") / F.lit(interval)).cast("long")
        hi_idx = F.round(F.col("_hi") / F.lit(interval)).cast("long")
        timeline = bounds.select(
            F.explode(F.sequence(lo_idx, hi_idx)).alias("_i")
        ).select((F.col("_i") * F.lit(interval)).cast("double").alias(name))
        grouped = timeline.join(grouped, name, "left").withColumn(
            "doc_count", F.coalesce("doc_count", F.lit(0).cast("long"))
        )
    if date_fill is not None:
        # ES min_doc_count=0 gap filling: emit EMPTY buckets for every
        # interval between the first and last bucket (or the literal
        # extended_bounds) — the Kibana timeline contract (a chart
        # with missing days lies).  The timeline generates from the
        # aggregated frame's own min/max (bucket-cardinality work, one
        # sequence explode) and LEFT-joins the buckets: doc_count
        # coalesces to 0, metric columns stay null for empty buckets
        # (ES reports null avg/min/max there too; its sum reports 0.0
        # — coalesce downstream if that distinction matters).
        # Single-level trees only: nested gap filling would need a
        # per-parent timeline cross join.
        name, spec = date_fill
        if len(key_names) != 1:
            raise ValueError(
                "min_doc_count=0 gap filling requires date_histogram "
                "to be the only bucket level"
            )
        trunc, step = _dh_trunc(
            spec.get("calendar_interval") or spec.get("fixed_interval")
        )
        eb = spec.get("extended_bounds")
        hb = spec.get("hard_bounds")
        data_bounds = grouped.agg(
            F.min(name).alias("_dlo"), F.max(name).alias("_dhi")
        )
        if hb:
            # hard_bounds + min_doc_count=0: the timeline IS the hard
            # range (data outside was already key-nulled away)
            bounds = grouped.sparkSession.range(1).select(
                trunc(F.lit(hb["min"]).cast("timestamp")).alias("_lo"),
                trunc(F.lit(hb["max"]).cast("timestamp")).alias("_hi"),
            )
        elif eb:
            # ES extended_bounds can only EXTEND the timeline (the
            # narrowing variant is hard_bounds, unsupported here): the
            # range is the union of the literal bounds and the data's
            # own min/max — least/greatest skip nulls, so an empty
            # bucket frame still yields the literal range
            bounds = data_bounds.select(
                F.least(
                    F.col("_dlo"),
                    trunc(F.lit(eb["min"]).cast("timestamp")),
                ).alias("_lo"),
                F.greatest(
                    F.col("_dhi"),
                    trunc(F.lit(eb["max"]).cast("timestamp")),
                ).alias("_hi"),
            )
        else:
            bounds = data_bounds.select(
                F.col("_dlo").alias("_lo"), F.col("_dhi").alias("_hi")
            )
        timeline = bounds.select(
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(step))
            ).alias(name)
        )
        grouped = (
            timeline.join(grouped, name, "left")
            .withColumn("doc_count", F.coalesce("doc_count", F.lit(0).cast("long")))
        )
    return grouped


# the auto_date_histogram interval ladder, smallest first, with the
# approximate bucket width in seconds used to estimate counts — the
# same shared ladder renders the oracle's CASE.  Sub-hour rungs use
# ES's 1/5/10/30 second/minute multiples (the RoundingInfo ladder);
# multiples are fixed intervals (exact epoch-floor buckets), the
# plain units calendar intervals.
AUTO_INTERVAL_LADDER: list[tuple[str, int]] = [
    ("second", 1),
    ("5s", 5),
    ("10s", 10),
    ("30s", 30),
    ("minute", 60),
    ("5m", 300),
    ("10m", 600),
    ("30m", 1800),
    ("hour", 3600),
    ("day", 86400),
    ("week", 604800),
    ("month", 2592000),
    ("quarter", 7776000),
    ("year", 31536000),
]


def auto_date_histogram(
    df: DataFrame,
    field: str,
    buckets: int = 10,
    aggs: dict | None = None,
    name: str = "auto",
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the smallest calendar interval
    from the ladder whose estimated bucket count fits the ``buckets``
    target, then run the ordinary date_histogram at that interval.
    The chosen interval is emitted as a literal ``interval`` column
    (ES returns it in the agg metadata).

    The interval decision needs the data's time span — ONE
    control-plane aggregate collected to the driver (a single
    min/max row, never corpus-sized), the same class of plan-time
    decision as the percolator's active-query collect.  Estimation is
    ``ceil(span_seconds / width) ≤ buckets`` on the shared ladder, so
    any engine reading the same span picks the same interval.
    """
    lo, hi = (
        df.agg(F.min(field).alias("lo"), F.max(field).alias("hi"))
        .collect()[0]
    )
    interval = AUTO_INTERVAL_LADDER[-1][0]
    if lo is not None and hi is not None:
        span = (hi - lo).total_seconds()
        for unit, width in AUTO_INTERVAL_LADDER:
            if span / width <= buckets - 1:
                interval = unit
                break
    iv_key = (
        "calendar_interval" if interval in _CALENDAR_TRUNC else "fixed_interval"
    )
    body: dict = {"date_histogram": {"field": field, iv_key: interval}}
    if aggs:
        body["aggs"] = aggs
    out = compile_aggs(df, {name: body})
    return out.withColumn("interval", F.lit(interval))


def median_absolute_deviation(
    df: DataFrame,
    bucket_col: str,
    field: str,
    name: str = "mad",
) -> DataFrame:
    """ES ``median_absolute_deviation``: median of |x − median(x)| per
    bucket — the robust dispersion metric.  ES approximates on
    t-digest; this is EXACT: two percentile aggregations with the
    per-bucket median broadcast back between them (bucket-cardinality
    join), results rounded 6 dp.  Returns ``(bucket, doc_count,
    <name>)``."""
    base = df.filter(
        F.col(bucket_col).isNotNull() & F.col(field).isNotNull()
    )
    med = base.groupBy(bucket_col).agg(
        F.percentile(F.col(field).cast("double"), F.lit(0.5)).alias("_med")
    )
    joined = base.join(F.broadcast(med), bucket_col)
    dev = F.abs(F.col(field).cast("double") - F.col("_med"))
    return joined.groupBy(bucket_col).agg(
        F.count("*").cast("long").alias("doc_count"),
        F.round(F.percentile(dev, F.lit(0.5)), 6).alias(name),
    )


def string_stats(
    df: DataFrame,
    bucket_col: str,
    field: str,
) -> DataFrame:
    """ES ``string_stats``: per bucket, the count / min / max / avg
    LENGTH of a string field plus the character-level Shannon entropy
    of the bucket's concatenated text.  Lengths are exact (decimal
    avg); entropy is Σ −p·log₂p over per-character frequencies,
    ROUNDED to 6 dp (log₂ is libm — same rounded contract as the
    transcendental function_score modifiers).  Two hash aggs: one
    over rows for lengths, one over exploded characters for the
    distribution (amplification = avg string length, the same factor
    any tokenizer pass pays), joined at bucket cardinality."""
    base = df.filter(
        F.col(bucket_col).isNotNull() & F.col(field).isNotNull()
    )
    lens = base.groupBy(bucket_col).agg(
        F.count("*").cast("long").alias("doc_count"),
        F.min(F.length(field)).cast("long").alias("min_length"),
        F.max(F.length(field)).cast("long").alias("max_length"),
        (
            F.sum(F.length(field).cast("decimal(38,6)")).cast("double")
            / F.count(field).cast("double")
        ).alias("avg_length"),
    )
    chars = base.select(
        F.col(bucket_col),
        F.explode(F.split(F.col(field), "")).alias("_ch"),
    ).filter(F.col("_ch") != "")
    freq = chars.groupBy(bucket_col, "_ch").agg(
        F.count("*").cast("double").alias("_n")
    )
    tot = freq.groupBy(bucket_col).agg(F.sum("_n").alias("_tot"))
    # per-character contributions round at 10 dp and sum as exact
    # decimal — a float sum's result depends on partition order; the
    # rounded-decimal accumulation is the same order-independence
    # pattern BM25 scoring uses
    contrib = F.round(
        F.col("_p") * F.log2("_p"), 10
    ).cast("decimal(38,10)")
    ent = (
        freq.join(F.broadcast(tot), bucket_col)
        .withColumn("_p", F.col("_n") / F.col("_tot"))
        .groupBy(bucket_col)
        .agg(
            F.round((-F.sum(contrib)).cast("double"), 6).alias("entropy")
        )
    )
    return lens.join(F.broadcast(ent), bucket_col)


def sampler_agg(
    df: DataFrame,
    shard_size: int,
    id_col: str = "doc_id",
    dedup_field: str | None = None,
    max_docs_per_value: int = 1,
) -> DataFrame:
    """ES ``sampler`` / ``diversified_sampler`` aggregation: restrict
    any sub-aggregation to a bounded, deterministic sample of the
    input — "aggregate over the best 100 matches, not the whole
    index".  ES samples the top-scoring docs per shard; with no
    scorer in the agg path the engine's documented deterministic
    stand-in is the ``shard_size`` LOWEST-id docs (pass a pre-ranked
    frame to sample by any other criterion — the operator only needs
    a total order).

    ``dedup_field`` arms the diversified variant: at most
    ``max_docs_per_value`` docs per distinct value of the field enter
    the sample (the "don't let one author dominate" contract), via a
    bounded per-value window BEFORE the global cut.

    Returns the SAMPLE as a frame — compose any agg over it (exactly
    how ES nests sub-aggs under the sampler).  Plan: optional window
    (WindowGroupLimit pushes the per-value cutoff into the sort) +
    TakeOrderedAndProject for the global cut — never a full sort.
    """
    out = df
    if dedup_field is not None:
        w = Window.partitionBy(dedup_field).orderBy(F.col(id_col).asc())
        out = (
            out.withColumn("_dr", F.row_number().over(w))
            .filter(F.col("_dr") <= max_docs_per_value)
            .drop("_dr")
        )
    return out.orderBy(F.col(id_col).asc()).limit(shard_size)


def global_agg(
    df: DataFrame, query: dict | None, aggs: dict
) -> DataFrame:
    """ES ``global`` aggregation: a bucket that ESCAPES the request's
    query scope — "average price of the matching docs AND of the whole
    index, in one request".  ES nests sub-aggs under ``{"global": {}}``
    next to query-scoped siblings; the flattened DataFrame rendering is
    one row set per scope, unioned LONG-format with a leading ``scope``
    column (``'query'`` for the filtered context, ``'global'`` for the
    whole frame) — the same flattening contract as
    :func:`compile_sibling_aggs`.

    Plan shape: two independent single-pass plans over the same scan
    (each keeps its own pushdown — the query-scoped branch filters
    BEFORE its agg, the global branch scans unfiltered), one union of
    bucket-cardinality rows.  No shared cache: at 100 TB two pruned
    column scans beat materializing full rows to share one.
    """
    def one_scope(frame: DataFrame) -> DataFrame:
        kinds = {name: _one(body)[0] for name, body in aggs.items()}
        if all(k in _METRIC_KINDS for k in kinds.values()):
            # metric-only tree: ES's single implicit bucket — one
            # global hash agg row (compile_aggs requires a bucket)
            metrics: list[Column] = []
            for name, body in aggs.items():
                kind, spec = _one(body)
                metrics.extend(_metric_exprs(name, kind, spec))
            return frame.groupBy().agg(
                F.count("*").cast("long").alias("doc_count"), *metrics
            )
        return compile_aggs(frame, aggs)

    scoped = df if query is None else df.filter(compile_bool_query(query))
    q = one_scope(scoped).withColumn("scope", F.lit("query"))
    g = one_scope(df).withColumn("scope", F.lit("global"))
    cols = ["scope"] + [c for c in q.columns if c != "scope"]
    return q.select(*cols).unionByName(g.select(*cols))


def random_sampler_agg(
    df: DataFrame,
    probability: float,
    aggs: dict,
    seed: int = 17,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``random_sampler`` aggregation: run the sub-aggs over a
    ``probability`` Bernoulli sample of the docs and SCALE ``doc_count``
    back up by ``1/probability`` (ES's cheap-facets-over-a-sample
    contract; metric values are computed on the sample, unscaled, as in
    ES).  Divergence from ES, documented: membership here is a
    deterministic keyed hash of ``(seed, id)`` — md5-derived bucket in
    ``[0, 1e6)`` compared to ``probability·1e6`` — never per-shard RNG,
    so the sample (and therefore every downstream number) is
    reproducible across engines, partitionings, and retries, and the
    oracle can rehash it exactly.

    Scale: the sample is a pure narrow filter (no shuffle) that REDUCES
    the rows entering the agg by ``1/probability`` — the entire point
    of the agg at 100 TB; everything after is bucket-cardinality-sized.
    """
    from monstache_spark.functions.text import shingle_hash

    if not (0.0 < probability <= 1.0):
        raise ValueError("probability must be in (0, 1]")
    bucket = F.pmod(
        shingle_hash(F.col(id_col).cast("string"), seed), F.lit(1_000_000)
    )
    sample = df.filter(bucket < F.lit(int(probability * 1_000_000)))
    out = compile_aggs(sample, aggs)
    return out.withColumn(
        "doc_count",
        F.round(
            F.col("doc_count").cast("double") / F.lit(float(probability)), 0
        ).cast("long"),
    )


def nested_aggs(
    df: DataFrame,
    path: str,
    aggs: dict,
    parent_filter: dict | None = None,
    parent_id_col: str | None = None,
) -> DataFrame:
    """ES ``nested`` aggregation: re-scope the aggregation context
    from parent documents to the ELEMENTS of the array-of-struct at
    ``path`` — ``doc_count`` counts nested docs, bucket keys and
    metrics read element fields.  ``{"n": {"nested": {"path":
    "items"}, "aggs": {...}}}`` in ES terms; ``aggs`` here is the
    inner body, with fields written either bare or ``path.field``
    (both resolve to the element, as ES accepts).

    ``parent_filter`` optionally applies a bool query to the PARENT
    docs first (the standard query-then-nested-agg request shape) —
    compiled as a plain predicate so it pushes into the scan before
    the explode.

    ``parent_id_col`` arms ES's ``reverse_nested``: each bucket also
    reports ``parent_doc_count`` — how many PARENT documents
    contribute at least one element to the bucket ("how many orders
    contain a returned item", not "how many returned items").  The
    parent id rides through the explode and a distinct-count per
    top-level bucket key joins back onto the bucket frame
    (bucket-cardinality broadcast join).  Single-bucket-level trees
    only — a nested reverse_nested would need the full key chain.

    Plan shape: parent filter (pushdown-eligible) → one explode of
    the nested array (amplification = avg array length, the same
    factor ES pays storing nested docs as separate Lucene docs) →
    the inner tree through :func:`compile_aggs` (one hash agg).
    Parents with empty/null arrays contribute nothing, as in ES.

    Reference grounding: the engine faithfully syncs nested documents
    and arrays (monstachemap/encoding.go:84-138; empty-array test
    monstache_test.go:108-122) — consumers of a synced index
    aggregate them with `nested`.
    """
    out = df
    if parent_filter is not None:
        out = out.filter(compile_bool_query(parent_filter))
    prefix = path + "."

    def strip(node: dict) -> dict:
        fixed: dict = {}
        for k, v in node.items():
            if isinstance(v, dict):
                v = strip(v)
            if k == "field" and isinstance(v, str) and v.startswith(prefix):
                v = v[len(prefix):]
            fixed[k] = v
        return fixed

    stripped = strip(aggs)
    if parent_id_col is None:
        elem = out.select(F.explode(F.col(path)).alias("_e")).select("_e.*")
        return compile_aggs(elem, stripped)

    if len(stripped) != 1:
        raise ValueError("reverse_nested requires a single top-level bucket agg")
    ((name, body),) = stripped.items()
    kind, spec = _one(body)
    if kind not in _BUCKET_KINDS:
        raise ValueError("reverse_nested requires a bucket agg at the top level")
    elem = out.select(
        F.col(parent_id_col).alias("_pid"), F.explode(F.col(path)).alias("_e")
    ).select("_pid", "_e.*")
    buckets = compile_aggs(elem.drop("_pid"), stripped)
    parents = (
        elem.withColumn(name, _bucket_key_col(kind, spec))
        .filter(F.col(name).isNotNull())
        .groupBy(name)
        .agg(F.count_distinct(F.col("_pid")).cast("long").alias("parent_doc_count"))
    )
    return buckets.join(F.broadcast(parents), name, "left")


def variable_width_histogram(
    df: DataFrame,
    field: str,
    buckets: int,
    value_decimals: int = 4,
    range_partitions: int = 32,
) -> DataFrame:
    """ES ``variable_width_histogram``: cluster a numeric field into
    at most ``buckets`` dynamically-sized buckets, returning per
    bucket ``key`` (the centroid), ``min``, ``max``, ``doc_count``.

    DIVERGENCE, documented (DIVERGENCES S23): ES's implementation is
    an explicitly-approximate ONE-PASS clustering whose buckets depend
    on document arrival order; the deterministic contract here is
    LARGEST-GAP clustering — sort the distinct values, cut at the
    ``buckets − 1`` largest gaps (ties: larger value-adjacent pair
    first by gap desc, then smaller right endpoint first), buckets are
    the maximal runs between cuts.  Same bucket count, same
    "boundaries fall where the data is sparse" behavior the ES agg
    exists for, reproducible on any engine and any partitioning.

    Scale shape (100 TB): ONE corpus hash agg collapses to the
    distinct-value frame (map-side combinable); every later step is
    O(|V|).  The global neighbor gap is computed WITHOUT a
    single-partition sort: range-repartition the value frame, take
    in-partition ``lag`` windows, and stitch partition boundaries
    through a partition-count-sized min/max frame (driver-bounded,
    broadcast back) — the standard distributed adjacent-difference
    shape.  The ``buckets − 1`` cut values are control-plane-sized by
    construction (one TakeOrderedAndProject), entering the final
    bucket assignment as a literal CASE chain.  ``key`` is the
    doc-weighted mean accumulated in exact decimal at
    ``value_decimals`` source precision, rounded to 6 dp.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    v = F.col(field)
    dv = (
        df.filter(v.isNotNull())
        .groupBy(v.alias("v"))
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("vd", F.col("v").cast(f"decimal(19,{value_decimals})"))
    )
    cut_vals: list = []
    if buckets > 1:
        rv = dv.repartitionByRange(range_partitions, F.col("v").asc())
        rv = rv.withColumn("_pid", F.spark_partition_id())
        w = Window.partitionBy("_pid").orderBy(F.col("v").asc())
        g = rv.withColumn("_prev", F.lag("v").over(w))
        bounds = rv.groupBy("_pid").agg(F.max("v").alias("_hi"))
        wb = Window.orderBy(F.col("_pid").asc())  # partition-count rows
        prev_hi = bounds.withColumn("_prev_hi", F.lag("_hi").over(wb)).select(
            "_pid", "_prev_hi"
        )
        g = g.join(F.broadcast(prev_hi), "_pid", "left").withColumn(
            "_prev", F.coalesce("_prev", "_prev_hi")
        )
        gaps = g.filter(F.col("_prev").isNotNull()).select(
            "v", (F.col("v") - F.col("_prev")).alias("_gap")
        )
        cuts = (
            gaps.orderBy(F.col("_gap").desc(), F.col("v").asc())
            .limit(buckets - 1)
            .collect()
        )  # control-plane: at most buckets-1 rows by construction
        cut_vals = sorted(r["v"] for r in cuts)
    cluster: Column = F.lit(0)
    for c in cut_vals:
        cluster = cluster + F.when(F.col("v") >= F.lit(c), 1).otherwise(0)
    return (
        dv.withColumn("_b", cluster)
        .groupBy("_b")
        .agg(
            F.round(
                F.sum(F.col("vd") * F.col("n").cast("decimal(19,0)")).cast(
                    "double"
                )
                / F.sum("n").cast("double"),
                6,
            ).alias("key"),
            F.min("v").alias("min"),
            F.max("v").alias("max"),
            F.sum("n").cast("long").alias("doc_count"),
        )
        .drop("_b")
    )


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_parent_key: str,
    aggs: dict,
    parent_filter: dict | None = None,
) -> DataFrame:
    """ES ``children`` aggregation over the join field: re-scope the
    aggregation context from PARENT documents to their CHILD documents
    — "per market segment, stats over the customers' orders".  The
    dual of the has_child/has_parent QUERY pair on the read side; the
    parent/child shape is what monstache's relate subsystem syncs
    relational data into (monstache.go parent-child routing).

    ``parent_filter`` is the request's query over the parents,
    compiled as a plain predicate (pushdown-eligible) BEFORE the key
    projection.  The child frame then semi-joins the surviving parent
    key set — an equi-join, broadcastable when the matching parent
    set is small — and the inner tree compiles over child rows via
    :func:`compile_aggs` (one hash agg).  ``doc_count`` counts CHILD
    docs, as in ES.  To bucket children BY a parent attribute, carry
    the attribute on the child frame (denormalized, as a
    monstache-style sync materializes it) or join it in first.
    """
    keys = parents
    if parent_filter is not None:
        keys = keys.filter(compile_bool_query(parent_filter))
    keys = keys.select(F.col(parent_key).alias("_pk"))
    scoped = children.join(
        keys, children[child_parent_key] == keys["_pk"], "leftsemi"
    )
    return compile_aggs(scoped, aggs)


def parent_agg(
    children: DataFrame,
    parents: DataFrame,
    parent_key: str,
    child_parent_key: str,
    aggs: dict,
    child_filter: dict | None = None,
) -> DataFrame:
    """ES ``parent`` aggregation: re-scope from CHILD documents to
    their PARENT documents — each parent enters the inner tree ONCE
    no matter how many matching children it has (ES's join-field
    dedup contract).  ``child_filter`` prunes the child frame first
    (pushdown), the DISTINCT matching parent-key set semi-joins the
    parent frame, and the inner tree compiles over parent rows.
    Plan: filter → hash-distinct on the key (map-side combinable) →
    semi-join → one hash agg.
    """
    ch = children
    if child_filter is not None:
        ch = ch.filter(compile_bool_query(child_filter))
    keys = ch.select(F.col(child_parent_key).alias("_pk")).distinct()
    scoped = parents.join(
        keys, parents[parent_key] == keys["_pk"], "leftsemi"
    )
    return compile_aggs(scoped, aggs)


def compile_sibling_aggs(
    df: DataFrame,
    aggs: dict,
    agg_col: str = "agg",
    key_col: str = "key",
) -> DataFrame:
    """ES request with SIBLING bucket aggregations at one level — the
    shape real ES requests routinely carry (a ``terms`` facet next to
    a ``date_histogram`` in one body, as Kibana dashboards issue).

    Each sibling compiles through :func:`compile_aggs` into its own
    independent single-pass plan; the bucket frames are unioned into
    one LONG-format result: ``(agg, key, doc_count, <union of metric
    columns>)``, with ``agg`` the sibling's name, ``key`` the bucket
    key chain rendered as a string (nested levels joined with ``/``,
    timestamps as ``yyyy-MM-dd HH:mm:ss``), and metric columns a
    sibling doesn't compute left null — the DataFrame flattening of
    ES's named sibling results.

    Scale notes (100 TB): the union is a plan-level union of N
    independent hash aggregations — no barrier, no extra shuffle.
    Each branch scans the source with ITS OWN column pruning (a terms
    sibling on ``event_type`` reads one column, not the histogram's
    timestamp), which at wide-table scale beats caching full rows to
    "share" one scan; if the siblings genuinely read the same narrow
    columns, persist the projected input before calling.
    """
    if not aggs:
        raise ValueError("sibling aggs body must be non-empty")
    frames: list[DataFrame] = []
    for name, body in aggs.items():
        sub = compile_aggs(df, {name: body})
        cols = sub.columns
        dc = cols.index("doc_count")
        key_names, metric_names = cols[:dc], cols[dc + 1 :]
        key_parts = []
        for k in key_names:
            dt = sub.schema[k].dataType.simpleString()
            c = F.col(k)
            if dt.startswith("timestamp"):
                key_parts.append(F.date_format(c, "yyyy-MM-dd HH:mm:ss"))
            else:
                key_parts.append(c.cast("string"))
        sel = [
            F.lit(name).alias(agg_col),
            F.concat_ws("/", *key_parts).alias(key_col),
            F.col("doc_count"),
            *[F.col(m) for m in metric_names],
        ]
        frames.append(sub.select(*sel))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def compile_composite_agg(df: DataFrame, name: str, body: dict) -> DataFrame:
    """ES ``composite`` aggregation: multi-source grouping with
    key-ordered pagination.

    ``body`` is ``{"composite": {"sources": [{name: {terms|histogram|
    date_histogram: spec}}, ...], "size": N, "after": {name: key}},
    "aggs": {metrics...}}``.  Sources become one composite group-by
    key; buckets order by the key tuple ascending (the composite
    contract — that is what makes ``after`` cursors work); ``after``
    resumes strictly after the given key tuple; ``size`` caps the
    page.  Returns ``(source cols..., doc_count, metrics...)``.

    One hash agg + TakeOrderedAndProject for the page — the input is
    read once regardless of page position; ``after`` prunes buckets
    post-agg (bucket-cardinality work, and for leading ``terms``
    sources a matching pre-agg filter would push into the scan — add
    it when pages go deep).
    """
    spec = body["composite"]
    metrics: list[Column] = []
    for mname, mbody in (body.get("aggs") or {}).items():
        kind, mspec = _one(mbody)
        if kind not in _METRIC_KINDS:
            raise ValueError("composite sub-aggs must be metrics")
        metrics.extend(_metric_exprs(mname, kind, mspec))

    key_names: list[str] = []
    out = df
    first_source: tuple[str, str, dict] | None = None
    for src in spec["sources"]:
        ((sname, sbody),) = src.items()
        kind, sspec = _one(sbody)
        if kind not in ("terms", "histogram", "date_histogram"):
            raise ValueError(f"unsupported composite source: {kind}")
        if first_source is None:
            first_source = (sname, kind, sspec)
        out = out.withColumn(sname, _bucket_key_col(kind, sspec))
        key_names.append(sname)

    after = spec.get("after")
    if after and first_source is not None:
        # deep-page pruning: rows whose LEADING source key is below the
        # cursor cannot appear in any later page, and for a `terms`
        # first source the raw column equals the key, so the >= bound
        # reaches the scan as a PushedFilter — the input shrinks BEFORE
        # the aggregation, not after
        sname, kind, sspec = first_source
        if kind == "terms":
            out = out.filter(
                F.col(sspec["field"]).cast("string") >= F.lit(after[sname])
            )
        else:
            out = out.filter(F.col(sname) >= F.lit(after[sname]))

    cond = F.lit(True)
    for k in key_names:
        cond = cond & F.col(k).isNotNull()
    grouped = (
        out.filter(cond)
        .groupBy(*key_names)
        .agg(F.count("*").cast("long").alias("doc_count"), *metrics)
    )
    if after:
        # strictly-after in the lexicographic key order: build the
        # row-comparison predicate (k1 > a1) OR (k1 = a1 AND k2 > a2)…
        cond = F.lit(False)
        eq = F.lit(True)
        for k in key_names:
            a = F.lit(after[k])
            cond = cond | (eq & (F.col(k) > a))
            eq = eq & (F.col(k) == a)
        grouped = grouped.filter(cond)

    ordered = grouped.orderBy(*[F.col(k).asc() for k in key_names])
    size = spec.get("size")
    return ordered.limit(int(size)) if size is not None else ordered


def pipeline_aggs(
    buckets: DataFrame,
    sort_col: str,
    value_col: str,
    parent_cols: list[str] | None = None,
    derivative: bool = False,
    cumulative: bool = False,
    moving_avg: int | None = None,
    serial_diff: int | None = None,
) -> DataFrame:
    """ES pipeline aggregations over an already-bucketed frame (the
    output of :func:`compile_aggs`): ``derivative``,
    ``cumulative_sum``, ``moving_avg`` and ``serial_diff`` of
    ``value_col`` along ``sort_col`` order, per parent bucket — the
    Kibana time-series post-processing (rate of change, running
    totals, smoothing, seasonal differencing).

    All three are ONE window pass over bucket-cardinality rows (the
    corpus was already reduced by the bucket agg); the window
    partitions by the parent bucket keys, so it parallelizes across
    parents and is control-plane-sized within each.  ``moving_avg``
    is the trailing simple average over the last ``moving_avg``
    buckets (ES ``moving_fn`` with ``MovingFunctions.unweightedAvg``),
    computed in exact decimal accumulation and rounded to 6 decimals.
    Derivative of the first bucket is null, as in ES.
    """
    part = (
        Window.partitionBy(*parent_cols) if parent_cols else Window.partitionBy()
    )
    w = part.orderBy(F.col(sort_col).asc())
    out = buckets
    v = F.col(value_col)
    if derivative:
        out = out.withColumn(
            f"{value_col}_deriv", v - F.lag(v).over(w)
        )
    if cumulative:
        out = out.withColumn(
            f"{value_col}_cumsum",
            F.sum(v.cast("decimal(38,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"),
        )
    if moving_avg is not None:
        frame = w.rowsBetween(-(moving_avg - 1), 0)
        out = out.withColumn(
            f"{value_col}_mavg",
            F.round(
                F.sum(v.cast("decimal(38,6)")).over(frame).cast("double")
                / F.count(v).over(frame).cast("double"),
                6,
            ),
        )
    if serial_diff is not None:
        # ES serial_diff: value minus the value `lag` buckets back —
        # seasonal differencing (lag=1 equals derivative; lag=24 on
        # hourly buckets removes the daily cycle). Null for the first
        # `lag` buckets, as in ES.
        out = out.withColumn(
            f"{value_col}_sdiff", v - F.lag(v, int(serial_diff)).over(w)
        )
    return out


def moving_fn(
    buckets: DataFrame,
    sort_col: str,
    value_col: str,
    window: int,
    fn: str = "unweightedAvg",
    shift: int = 0,
    alpha: float = 0.3,
    parent_cols: list[str] | None = None,
) -> DataFrame:
    """ES ``moving_fn`` pipeline aggregation (r14): a builtin
    ``MovingFunctions`` evaluation over a sliding window of PRIOR
    bucket metric values along ``sort_col``, per parent bucket.

    Window convention (the ES contract): with ``shift=0`` the window
    is the ``window`` buckets strictly BEFORE the current one —
    ``[i-window, i-1]`` — so the first bucket sees an empty window
    and yields NULL (ES's NaN renders as null); ``shift=1`` slides
    the window right to include the current bucket.

    Functions (each deterministic and engine-exact under the S11
    disciplines): ``max``/``min``; ``sum`` and ``unweightedAvg``
    (exact ``decimal(38,6)`` accumulation, double at the division,
    rounded to 6 dp); ``stdDev`` (population, ES's form —
    ``sqrt(E[v²] − E[v]²)`` with both expectations from exact
    decimal sums of 6-dp-rounded squares); ``linearWeightedAvg``
    (weight = 1-based position from the OLDEST window value, the ES
    newest-weighs-most ramp, exact integer weights over decimal
    values); ``ewma`` (the exact ES left fold oldest→newest —
    ``avg = v·α + avg·(1−α)``, seeded with the oldest value — in
    double arithmetic, identical fold order in every engine, rounded
    to 6 dp).  ``holt``/``holtWinters`` are REFUSED: their
    double-exponential state recursions have published parameters
    but unpublished seeding edge cases in ES — no independent
    oracle could disagree meaningfully.

    The ordered window values materialize as a sorted
    ``(sort_key, value)`` struct array — ``sort_array`` of a framed
    ``collect_list``, deterministic regardless of collection order —
    and fold through ``F.aggregate``; the frame is one window pass
    over bucket-cardinality rows.  Adds ``<value_col>_mfn``.
    """
    fns = ("max", "min", "sum", "unweightedAvg", "stdDev",
           "linearWeightedAvg", "ewma")
    if fn in ("holt", "holtWinters"):
        raise ValueError(
            f"moving_fn {fn} is refused: the ES double-exponential "
            "state recursion has unpublished seeding edge cases — "
            "use ewma / linearWeightedAvg (DIVERGENCES S4)"
        )
    if fn not in fns:
        raise ValueError(f"moving_fn fn must be one of {fns}: {fn!r}")
    if window <= 0:
        raise ValueError(f"window must be > 0: {window}")
    part = (
        Window.partitionBy(*parent_cols) if parent_cols else Window.partitionBy()
    )
    w = part.orderBy(F.col(sort_col).asc())
    frame = w.rowsBetween(shift - window, shift - 1)
    v = F.col(value_col)
    out_col = f"{value_col}_mfn"
    if fn == "max":
        return buckets.withColumn(out_col, F.max(v).over(frame))
    if fn == "min":
        return buckets.withColumn(out_col, F.min(v).over(frame))
    if fn == "sum":
        return buckets.withColumn(
            out_col,
            F.round(
                F.sum(v.cast("decimal(38,6)")).over(frame).cast("double"), 6
            ),
        )
    if fn == "unweightedAvg":
        return buckets.withColumn(
            out_col,
            F.round(
                F.sum(v.cast("decimal(38,6)")).over(frame).cast("double")
                / F.count(v).over(frame).cast("double"),
                6,
            ),
        )
    if fn == "stdDev":
        n = F.count(v).over(frame).cast("double")
        ev = F.sum(v.cast("decimal(38,6)")).over(frame).cast("double") / n
        ev2 = (
            F.sum(F.round(v * v, 6).cast("decimal(38,6)")).over(frame)
            .cast("double") / n
        )
        # the empty-window guard must be explicit: F.greatest SKIPS
        # nulls, so greatest(NULL variance, 0.0) would yield 0.0 for
        # the first bucket instead of ES's null
        return buckets.withColumn(
            out_col,
            F.when(
                n > 0,
                F.round(F.sqrt(F.greatest(ev2 - ev * ev, F.lit(0.0))), 6),
            ),
        )
    # ordered-fold functions: deterministic ordered values via
    # sort_array over the framed collect_list of (key, value) structs
    arr = F.sort_array(
        F.collect_list(
            F.struct(F.col(sort_col).alias("k"), v.alias("v"))
        ).over(frame)
    )
    # ES MovingFunctions skip NaN/missing values inside the window
    vals = F.filter(
        F.transform(arr, lambda s: s["v"]), lambda x: x.isNotNull()
    )
    if fn == "linearWeightedAvg":
        num = F.aggregate(
            F.transform(
                vals,
                lambda x, i: (
                    x.cast("decimal(38,6)")
                    * (i + 1).cast("decimal(18,0)")
                ).cast("decimal(38,6)"),
            ),
            F.lit(0).cast("decimal(38,6)"),
            lambda acc, x: (acc + x).cast("decimal(38,6)"),
        )
        nn = F.size(vals)
        den = (nn * (nn + 1) / F.lit(2)).cast("double")
        res = F.when(
            nn > 0, F.round(num.cast("double") / den, 6)
        )
    else:  # ewma — the exact ES fold, doubles, oldest seeds
        res = F.when(
            F.size(vals) > 0,
            F.round(
                F.aggregate(
                    F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
                    F.element_at(vals, 1).cast("double"),
                    lambda acc, x: x * F.lit(float(alpha))
                    + acc * F.lit(1.0 - float(alpha)),
                ),
                6,
            ),
        )
    return buckets.withColumn(out_col, res)


def normalize_agg(
    buckets: DataFrame,
    value_col: str,
    method: str = "percent_of_sum",
    parent_cols: list[str] | None = None,
) -> DataFrame:
    """ES ``normalize`` pipeline aggregation: rescale a bucket metric
    within its parent — ``percent_of_sum`` (share of the total, the
    Kibana percent-mode bar chart), ``rescale_0_1`` (min-max), or
    ``mean`` (value − mean).  One aggregate over bucket-cardinality
    rows broadcast back; sums accumulate exact decimal so every
    engine derives the same denominators; results round to 6
    decimals.  Adds ``<value_col>_norm``.
    """
    parent_cols = parent_cols or []
    v = F.col(value_col)
    stats = buckets.groupBy(*parent_cols).agg(
        F.sum(v.cast("decimal(38,6)")).cast("double").alias("_tot"),
        F.min(v.cast("double")).alias("_mn"),
        F.max(v.cast("double")).alias("_mx"),
        F.count(v).cast("double").alias("_n"),
    )
    joined = (
        buckets.join(F.broadcast(stats), parent_cols)
        if parent_cols
        else buckets.crossJoin(F.broadcast(stats))
    )
    if method == "percent_of_sum":
        norm = v.cast("double") / F.col("_tot") * F.lit(100.0)
    elif method == "rescale_0_1":
        rng = F.col("_mx") - F.col("_mn")
        norm = F.when(rng > 0, (v.cast("double") - F.col("_mn")) / rng).otherwise(
            F.lit(0.0)
        )
    elif method == "mean":
        # ES 'mean' method: (value − mean) / (max − min) — mean-shift
        # scaled by the range, 0 when the range collapses
        rng = F.col("_mx") - F.col("_mn")
        norm = F.when(
            rng > 0,
            (v.cast("double") - F.col("_tot") / F.col("_n")) / rng,
        ).otherwise(F.lit(0.0))
    else:
        raise ValueError(f"unsupported normalize method: {method}")
    return joined.withColumn(
        f"{value_col}_norm", F.round(norm, 6)
    ).drop("_tot", "_mn", "_mx", "_n")


def bucket_sort_agg(
    buckets: DataFrame,
    sort: list[tuple[str, str]],
    size: int | None = None,
    from_: int = 0,
) -> DataFrame:
    """ES ``bucket_sort`` pipeline aggregation: reorder/truncate the
    parent's buckets by metric values — "top 5 buckets by revenue".
    ``sort`` is ``[(column, "asc"|"desc"), ...]``.  Emits a ``_rank``
    column carrying the sort position (a DataFrame has no implicit
    order; the rank IS the result).  TakeOrderedAndProject when only
    ``size`` truncates from rank 1; window-ranked otherwise."""
    exprs = [
        (F.col(c).asc() if d == "asc" else F.col(c).desc()) for c, d in sort
    ]
    w = Window.orderBy(*exprs)
    out = buckets.withColumn("_rank", F.row_number().over(w).cast("long"))
    if from_:
        out = out.filter(F.col("_rank") > from_)
    if size is not None:
        out = out.filter(F.col("_rank") <= from_ + size)
    return out


def cumulative_cardinality(
    df: DataFrame,
    bucket_col: Column,
    value_col: str,
    name: str = "bucket",
) -> DataFrame:
    """ES ``cumulative_cardinality``: per time bucket, how many
    DISTINCT values have been seen up to and including it — "new
    unique visitors per day" when differenced.  Not derivable from
    bucket frames (distinct doesn't sum), but it collapses to two
    hash aggs + one bucket-cardinality cumulative window: each
    value's FIRST bucket (min over buckets — map-side combined),
    count of first-appearances per bucket, then a running sum.  Also
    emits that per-bucket ``new_values`` count (the differenced
    series ES users actually chart).  At 100 TB the corpus reduces to
    |distinct values| rows in pass one; nothing corpus-sized reaches
    the window."""
    firsts = (
        df.filter(F.col(value_col).isNotNull())
        .select(bucket_col.alias(name), F.col(value_col).alias("_v"))
        .groupBy("_v")
        .agg(F.min(name).alias(name))
    )
    per_bucket = firsts.groupBy(name).agg(
        F.count("*").cast("long").alias("new_values")
    )
    w = Window.orderBy(F.col(name).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_bucket.withColumn(
        "cumulative_cardinality", F.sum("new_values").over(w).cast("long")
    )


def bucket_script(
    buckets: DataFrame, name: str, expr: str, round_to: int | None = 6
) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: compute a new per-bucket
    metric from the bucket's existing metric columns (the Kibana
    "math on series" panel — ratios, percentages, deltas of sibling
    metrics).  ``expr`` is a SQL expression over the bucket frame's
    columns — exactly ES's ``buckets_path``-bound script, with column
    names instead of path bindings.

    One codegen projection over bucket-cardinality rows; no shuffle,
    no corpus access.  Rounded to ``round_to`` decimals so any engine
    agrees (pass None to skip).
    """
    col = F.expr(expr)
    if round_to is not None:
        col = F.round(col.cast("double"), round_to)
    return buckets.withColumn(name, col)


def bucket_selector(buckets: DataFrame, predicate: str) -> DataFrame:
    """ES ``bucket_selector`` pipeline agg: keep only buckets whose
    metrics satisfy ``predicate`` (a SQL boolean expression over the
    bucket frame's columns) — the "having" clause of the aggs DSL.
    A narrow filter over bucket-cardinality rows.
    """
    return buckets.filter(F.expr(predicate))


def stats_bucket(
    buckets: DataFrame,
    value_col: str,
    parent_cols: list[str] | None = None,
) -> DataFrame:
    """ES sibling pipeline aggs ``stats_bucket`` (and its projections
    ``avg_bucket`` / ``sum_bucket`` / ``min_bucket`` / ``max_bucket``):
    one summary row (per parent bucket) over a metric ACROSS the
    sibling buckets — "average of the daily sums".  One hash agg over
    bucket-cardinality rows; sums/avgs in exact decimal.  Returns
    ``<value_col>_bucket_{count,min,max,avg,sum}``.
    """
    v = F.col(value_col)
    dec = v.cast("decimal(38,6)")
    aggs = [
        F.count(v).cast("long").alias(f"{value_col}_bucket_count"),
        F.min(v.cast("double")).alias(f"{value_col}_bucket_min"),
        F.max(v.cast("double")).alias(f"{value_col}_bucket_max"),
        (F.sum(dec).cast("double") / F.count(v).cast("double")).alias(
            f"{value_col}_bucket_avg"
        ),
        F.sum(dec).cast("double").alias(f"{value_col}_bucket_sum"),
    ]
    g = buckets.groupBy(*parent_cols) if parent_cols else buckets.groupBy()
    return g.agg(*aggs)


def extended_stats_bucket(
    buckets: DataFrame,
    value_col: str,
    parent_cols: list[str] | None = None,
) -> DataFrame:
    """ES sibling pipeline agg ``extended_stats_bucket``:
    :func:`stats_bucket` plus sum_of_squares / variance /
    std_deviation across the sibling buckets — same exact-decimal
    moment sums and negative-cancellation clamp as the
    ``extended_stats`` metric (population variance, correctly-rounded
    IEEE sqrt — engine-exact, no libm contract).  One hash agg over
    bucket-cardinality rows.
    """
    v = F.col(value_col)
    dec = v.cast("decimal(38,6)")
    exact_sum = F.sum(dec).cast("double")
    sos = F.sum((dec * dec).cast("decimal(38,6)")).cast("double")
    n = F.count(v).cast("double")
    mean = exact_sum / n
    variance = F.greatest(sos / n - mean * mean, F.lit(0.0))
    p = value_col
    aggs = [
        F.count(v).cast("long").alias(f"{p}_bucket_count"),
        F.min(v.cast("double")).alias(f"{p}_bucket_min"),
        F.max(v.cast("double")).alias(f"{p}_bucket_max"),
        mean.alias(f"{p}_bucket_avg"),
        exact_sum.alias(f"{p}_bucket_sum"),
        sos.alias(f"{p}_bucket_sum_of_squares"),
        F.round(variance, 6).alias(f"{p}_bucket_variance"),
        F.round(F.sqrt(variance), 6).alias(f"{p}_bucket_std_deviation"),
    ]
    g = buckets.groupBy(*parent_cols) if parent_cols else buckets.groupBy()
    return g.agg(*aggs)


def percentiles_bucket(
    buckets: DataFrame,
    value_col: str,
    percents: tuple = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    parent_cols: list[str] | None = None,
) -> DataFrame:
    """ES sibling pipeline agg ``percentiles_bucket``: percentiles of a
    metric ACROSS the sibling buckets ("the p99 of the daily sums").
    Exact interpolated percentiles rounded to 6 dp — the S4 exactness
    contract (ES uses t-digest here too); column per percent named with
    the same ``pNN`` suffix scheme as the ``percentiles`` metric.  One
    hash agg over bucket-cardinality rows.
    """
    v = F.col(value_col).cast("double")
    aggs = [
        F.round(F.percentile(v, F.lit(p / 100.0)), 6).alias(
            f"{value_col}_p{_pct_suffix(p)}"
        )
        for p in percents
    ]
    g = buckets.groupBy(*parent_cols) if parent_cols else buckets.groupBy()
    return g.agg(*aggs)


def scripted_metric(
    df: DataFrame,
    map_script: str,
    reduce: str = "sum",
    group_by: list[str] | None = None,
    name: str = "value",
    round_to: int | None = 6,
) -> DataFrame:
    """ES ``scripted_metric`` aggregation, the deterministic subset: a
    ``map_script`` that emits one numeric per document (the shared
    painless→SQL binding contract — the script's field reads become
    column references) and an associative ``reduce`` in
    ``sum`` / ``min`` / ``max`` / ``avg`` / ``count``.  That subset is
    exactly the map-side-combinable part of ES's init/map/combine/
    reduce contract — the part that is order-independent and therefore
    reproducible; scripts carrying mutable cross-document state are
    order-dependent by construction and refused (raise) rather than
    silently approximated.

    Plan shape: one codegen projection (the mapped expression) + one
    hash agg — partial aggregation map-side, exact decimal sums.
    """
    reducers = {
        "sum": lambda c: F.sum(c.cast("decimal(38,6)")).cast("double"),
        "min": lambda c: F.min(c.cast("double")),
        "max": lambda c: F.max(c.cast("double")),
        "avg": lambda c: (
            F.sum(c.cast("decimal(38,6)")).cast("double")
            / F.count(c).cast("double")
        ),
        "count": lambda c: F.count(c).cast("double"),
    }
    if reduce not in reducers:
        raise ValueError(
            f"unsupported reduce {reduce!r}: the deterministic subset is "
            f"{sorted(reducers)} (stateful scripts are order-dependent)"
        )
    mapped = df.withColumn("_m", F.expr(map_script))
    agg = reducers[reduce](F.col("_m"))
    if round_to is not None:
        agg = F.round(agg, round_to)
    g = mapped.groupBy(*group_by) if group_by else mapped.groupBy()
    return g.agg(
        agg.alias(name), F.count("*").cast("long").alias("doc_count")
    )


def adjacency_matrix(
    df: DataFrame, filters: dict[str, dict], id_col: str = "doc_id"
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: doc counts for every named
    filter and every pairwise intersection, keyed ``"a"`` and
    ``"a&b"`` exactly as ES keys them — co-occurrence matrices over
    saved segments.

    ``doc_count`` is the number of distinct ``id_col`` values per
    cell — ES counts DOCUMENTS, and an input carrying duplicate rows
    per document (a pre-join fan-out) must not inflate the matrix.
    When rows are unique per id the distinct collapses to a row count
    at the same plan shape.

    One codegen projection builds each row's membership key array
    (singles + ordered pairs, bounded by ``k + k·(k-1)/2`` for k
    user-written filters), one bounded explode, one dedup-then-count
    pair of hash aggs.  The corpus is touched once regardless of
    filter count.
    """
    if not filters:
        raise ValueError("filters must be non-empty")
    names = sorted(filters)
    singles = [
        F.when(compile_bool_query(filters[n]), F.lit(n)) for n in names
    ]
    pairs = [
        F.when(
            compile_bool_query(filters[a]) & compile_bool_query(filters[b]),
            F.lit(f"{a}&{b}"),
        )
        for i, a in enumerate(names)
        for b in names[i + 1 :]
    ]
    keys = F.array_compact(F.array(*singles, *pairs))
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(keys).alias("key"))
        .groupBy("key")
        .agg(F.count_distinct(F.col("_id")).cast("long").alias("doc_count"))
    )


def top_metrics(
    df: DataFrame,
    bucket_col: str,
    sort_col: str,
    metric_cols: list[str],
    ascending: bool = False,
    id_col: str = "event_id",
) -> DataFrame:
    """ES ``top_metrics`` aggregation: per bucket, the metric values
    carried by the row with the max (or min) ``sort_col`` — "the
    price at the latest timestamp", cheaper than top_hits when only
    scalar metrics are wanted.

    Ties on ``sort_col`` break on ``id_col`` (descending picks the
    LARGEST id, ascending the smallest) so any engine picks the same
    row.  Null ``bucket_col`` rows drop, matching the
    :func:`compile_aggs` null-key contract.

    Three plan shapes — NONE ever sort-aggregates or sorts the corpus
    (a string in ANY aggregate buffer — ``max(s)``, ``max_by(m, s)``,
    even ``first(s)`` — silently degrades the whole aggregate to
    SortAggregate; the plan audit guards this class of regression):

    * timestamp ``sort_col`` — ONE hash aggregation; the (ts, id) pair
      packs into one exact decimal ``unix_micros·10⁹ + id``.
      Precondition: ``0 ≤ id < 10⁹`` (the id occupies the low nine
      decimal digits; a larger or negative id would mis-order across
      adjacent microseconds), validated at plan time against the
      id column's max when cheaply available, otherwise documented.
    * numeric / date ``sort_col`` — an exact TWO-phase path: hash-agg
      the per-bucket extreme, broadcast the bucket-cardinality
      extremes back as an equi-join to keep only tied rows, then one
      more hash agg picking metrics by the id tiebreak.  No packing
      contract, no precision loss, every aggregate a HashAggregate.
    * string ``sort_col`` — strings are fine as GROUP KEYS, just not
      in buffers, so the extremes come from a DISTINCT-pairs phase:
      hash-agg the distinct (bucket, key) pairs (bounded by
      buckets × key cardinality, not corpus rows), pick each bucket's
      extreme with one row_number window over that small frame,
      broadcast the extremes back, and the final agg groups by
      (bucket, key) so only numeric metrics and the id enter buffers.
      The only Sort in the plan orders the post-agg distinct frame —
      the corpus itself never sorts.
    """
    pick = F.min_by if ascending else F.max_by
    ext = F.min(sort_col) if ascending else F.max(sort_col)
    base = df.filter(
        F.col(sort_col).isNotNull() & F.col(bucket_col).isNotNull()
    )
    dt = df.schema[sort_col].dataType.simpleString()
    if dt.startswith("timestamp"):
        key = (
            F.unix_micros(F.col(sort_col)).cast("decimal(38,0)")
            * F.lit(1_000_000_000)
            + F.col(id_col)
        )
        return base.groupBy(bucket_col).agg(
            ext.alias(sort_col),
            *[pick(m, key).alias(m) for m in metric_cols],
        )
    id_pick = F.max_by if not ascending else F.min_by
    if dt in ("string", "binary"):
        pairs = base.select(bucket_col, sort_col).distinct()
        order = F.col(sort_col).asc() if ascending else F.col(sort_col).desc()
        w = Window.partitionBy(bucket_col).orderBy(order)
        best = (
            pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        tied = base.join(F.broadcast(best), [bucket_col, sort_col])
        return tied.groupBy(bucket_col, sort_col).agg(
            *[id_pick(m, F.col(id_col)).alias(m) for m in metric_cols]
        )
    best = base.groupBy(bucket_col).agg(ext.alias(sort_col))
    tied = base.join(F.broadcast(best), [bucket_col, sort_col])
    return tied.groupBy(bucket_col).agg(
        F.min(sort_col).alias(sort_col),
        *[id_pick(m, F.col(id_col)).alias(m) for m in metric_cols],
    )


def top_hits_agg(
    df: DataFrame,
    bucket_col: str,
    sort_col: str,
    n: int = 3,
    ascending: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``top_hits`` sub-aggregation: the ``n`` best documents per
    bucket by ``sort_col`` (ties break on ``id_col`` asc) — "show me
    examples per group", the most-used ES sub-agg Kibana tables are
    built on.

    One window rank partitioned by the bucket — parallel across
    buckets, WindowGroupLimit pushes the n-cutoff into the sort, so
    per-bucket work is a bounded heap, not a full sort.  Null bucket
    keys drop, as in ES.  Returns the input columns plus ``hit_rank``.
    """
    w = Window.partitionBy(bucket_col).orderBy(
        F.col(sort_col).asc() if ascending else F.col(sort_col).desc(),
        F.col(id_col).asc(),
    )
    return (
        df.filter(F.col(bucket_col).isNotNull())
        .withColumn("hit_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("hit_rank") <= n)
    )


def anomaly_flags(
    buckets: DataFrame,
    value_col: str,
    parent_cols: list[str] | None = None,
    threshold_sigma: float = 3.0,
) -> DataFrame:
    """Static z-score anomaly flags over a bucketed metric series (the
    shape of Kibana/Watcher threshold alerts): flag buckets where
    ``(x - mean)² > threshold² · variance`` within the parent bucket.

    All arithmetic is EXACT: mean and population variance enter as
    decimal sums (Σx, Σx², n) and the flag compares
    ``(n·x − Σx)² > threshold²·(n·Σx² − (Σx)²)`` — the z² > t² test
    cross-multiplied by n², no square roots, no float rounding, so
    every engine flags identical rows.  One aggregate over
    bucket-cardinality rows broadcast back.  Emits ``is_anomaly``
    (0/1) plus the ``dev2_scaled``/``var_scaled`` evidence columns.
    """
    parent_cols = parent_cols or []
    dec = F.col(value_col).cast("decimal(38,6)")
    stats = (
        buckets.groupBy(*parent_cols).agg(
            F.count("*").cast("decimal(38,0)").alias("_n"),
            F.sum(dec).cast("decimal(38,6)").alias("_sx"),
            F.sum((dec * dec).cast("decimal(38,6)")).cast("decimal(38,6)").alias("_sxx"),
        )
    )
    joined = (
        buckets.join(F.broadcast(stats), parent_cols)
        if parent_cols
        else buckets.crossJoin(F.broadcast(stats))
    )
    # z² > t²  ⇔  (x−μ)² > t²σ²  ⇔  (n·x − Σx)² > t²·(n·Σx² − (Σx)²)
    # after multiplying through by n² — both sides exact decimals
    lhs = (joined["_n"] * dec - F.col("_sx")).cast("decimal(38,6)")
    dev2 = (lhs * lhs).cast("decimal(38,6)")
    varn = (
        joined["_n"] * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    ).cast("decimal(38,6)")
    t2 = F.lit(threshold_sigma * threshold_sigma).cast("decimal(18,6)")
    flag = dev2 > (t2 * varn).cast("decimal(38,6)")
    return (
        joined.withColumn("dev2_scaled", dev2.cast("double"))
        .withColumn("var_scaled", varn.cast("double"))
        .withColumn("is_anomaly", flag.cast("long"))
        .drop("_n", "_sx", "_sxx")
    )


_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def rate_agg(
    df: DataFrame,
    ts_col: str,
    calendar_interval: str = "month",
    unit: str = "day",
    value_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """ES ``rate`` aggregation inside a ``date_histogram``: per
    calendar bucket, the sum of ``value_col`` (or the doc count when
    no field is given) DIVIDED by the bucket's duration expressed in
    ``unit`` — "events per day" over monthly buckets, the Kibana
    normalization panel.  Calendar buckets have calendar durations:
    a month bucket divides by ITS OWN day count (31 for January, 29
    for February 2024), quarters and years by their exact day spans —
    computed from the bucket key with ``last_day``/``add_months``
    arithmetic, never a 30-day approximation (the ES contract: rate
    uses the full bucket duration regardless of data coverage).

    ``unit`` must not exceed the bucket interval (the ES validation).
    The sum is exact decimal accumulation; one division per bucket
    row, rounded to ``round_to``.  One hash agg over the corpus —
    the date_histogram plan plus a constant-per-row duration
    expression.
    """
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported rate unit: {unit}")
    fixed = {"minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    if calendar_interval in fixed:
        if _UNIT_SECONDS[unit] > fixed[calendar_interval]:
            raise ValueError("rate unit must not exceed the bucket interval")
    key = F.date_trunc(calendar_interval, F.col(ts_col))
    base = df.filter(F.col(ts_col).isNotNull())
    total = (
        F.count("*").cast("double")
        if value_col is None
        else F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double")
    )
    out = base.groupBy(key.alias("key")).agg(
        F.count("*").cast("long").alias("doc_count"),
        total.alias("_total"),
    )
    if calendar_interval in fixed:
        dur_units = F.lit(fixed[calendar_interval] / _UNIT_SECONDS[unit])
    elif calendar_interval == "month":
        days = F.dayofmonth(F.last_day(F.col("key")))
        dur_units = days.cast("double") * F.lit(86400.0 / _UNIT_SECONDS[unit])
    elif calendar_interval in ("quarter", "year"):
        months = 3 if calendar_interval == "quarter" else 12
        days = F.datediff(F.add_months(F.col("key"), months), F.col("key"))
        dur_units = days.cast("double") * F.lit(86400.0 / _UNIT_SECONDS[unit])
    else:
        raise ValueError(f"unsupported calendar_interval: {calendar_interval}")
    return (
        out.withColumn("rate", F.round(F.col("_total") / dur_units, round_to))
        .drop("_total")
        .orderBy("key")
    )


def transform_latest(
    df: DataFrame,
    unique_key: list[str],
    sort_col: str,
    id_col: str,
) -> DataFrame:
    """ES ``_transform`` with a ``latest`` config: materialize the
    most recent document per ``unique_key`` tuple, ordered by
    ``sort_col`` (ties broken by max ``id_col`` — ES relies on
    ingestion order there).  The continuous-transform destination
    index, as one batch materialization; under CDC the same frame is
    exactly what ``cdc_materialize`` maintains incrementally.

    Plan shape: the two-phase extreme + tie-join (the ``top_metrics``
    shape) returning WHOLE ROWS — one hash agg for the per-key max
    sort value, an equi-join back keeping only tied rows, one more
    hash agg picking the max id among ties, and a final equi-join
    recovering the full row.  No struct/string ever enters an agg
    buffer; the corpus never sorts.
    """
    keys = list(unique_key)
    s = F.col(sort_col)
    # renamed projections break the self-join lineage so Spark never
    # sees an ambiguous column (the standard aliased-self-join shape)
    ext = (
        df.filter(s.isNotNull())
        .groupBy(*[F.col(c).alias(f"_k_{c}") for c in keys])
        .agg(F.max(s).alias("_ext"))
    )
    # NO broadcast hint on the extreme/pick frames: they are
    # KEY-CARDINALITY (one row per unique_key tuple — unbounded at the
    # transform's own scale), so forcing a driver collect would OOM
    # exactly where the operator matters; Spark/AQE auto-broadcasts
    # when the key set actually is small
    tied = df.join(
        ext,
        [df[c] == ext[f"_k_{c}"] for c in keys]
        + [df[sort_col] == ext["_ext"]],
    ).select(*[df[c] for c in df.columns])
    pick = tied.groupBy(
        *[F.col(c).alias(f"_k_{c}") for c in keys],
        F.col(sort_col).alias("_s"),
    ).agg(F.max(F.col(id_col)).alias("_pid"))
    out = df.join(
        pick,
        [df[c] == pick[f"_k_{c}"] for c in keys]
        + [df[sort_col] == pick["_s"], df[id_col] == pick["_pid"]],
    )
    return out.select(*[df[c] for c in df.columns])


def downsample(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    gauges: list[str],
    counters: list[str] | tuple = (),
    fixed_interval: str = "1h",
    id_col: str = "event_id",
) -> DataFrame:
    """ES TSDB downsampling (the ``_downsample`` API — the rollup that
    makes metrics indexes queryable at long retention): collapse a
    time-series table to ONE row per (dimension tuple, fixed-interval
    bucket).  Gauge metrics keep ``_min/_max/_sum/_count`` (sums in
    exact decimal, so rollup totals are partitioning-independent);
    counter metrics keep ``_last`` — the value at the LATEST
    (timestamp, id) in the bucket (deterministic where ES relies on
    ``_tsid`` doc order; the id is the doc-order stand-in).  Buckets
    floor exact epoch micros with integer ``pmod`` (the fixed-interval
    contract — UTC-aligned, engine-exact edges).

    This is the hypertable-rollup shape at 100 TB: ONE corpus hash agg
    (map-side combinable) does everything — the counter last-value
    rides the ``top_metrics`` packing contract, ``unix_micros·10⁹ +
    id`` as one exact decimal (precondition ``0 ≤ id < 10⁹``), picked
    with ``max_by(value, pack)`` whose buffer holds only numerics (no
    struct, no string — stays a HashAggregate).  Downsampled output is
    ~|buckets| rows; every stat merges ASSOCIATIVELY, which is what
    lets ``sinks/downsample.DownsampleTable`` maintain the same frame
    incrementally under a stream with restatement equality.
    """
    w = fixed_interval_seconds(fixed_interval)
    if w is None:
        raise ValueError(f"unsupported fixed_interval: {fixed_interval}")
    w_us = w * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    base = df.filter(F.col(ts_col).isNotNull()).withColumn(
        "bucket", F.timestamp_micros(us - F.pmod(us, F.lit(w_us)))
    )
    keys = [*dims, "bucket"]
    return base.groupBy(*keys).agg(*downsample_aggs(ts_col, gauges, counters, id_col))


def downsample_aggs(
    ts_col: str,
    gauges: list[str],
    counters: list[str] | tuple = (),
    id_col: str = "event_id",
    state_form: bool = False,
) -> list[Column]:
    """The per-bucket aggregate expressions of :func:`downsample` —
    shared with the streaming sink (``sinks/downsample``) so batch and
    continuous rollups are the same arithmetic BY CONSTRUCTION, not by
    parallel maintenance.  ``state_form=True`` is the sink's persisted
    variant: gauge sums stay exact DECIMAL (aliased ``_sum_{g}``, cast
    to double only at read) and each counter also carries its max pack
    (``_pk_{c}``) so cross-batch merges can re-pick the latest value.
    """
    pack = (
        F.unix_micros(F.col(ts_col)).cast("decimal(38,0)")
        * F.lit(1_000_000_000)
        + F.col(id_col).cast("decimal(38,0)")
    )
    aggs: list[Column] = [F.count("*").cast("long").alias("doc_count")]
    for g_name in gauges:
        c = F.col(g_name)
        dec_sum = F.sum(c.cast("decimal(38,6)"))
        aggs += [
            F.min(c).alias(f"{g_name}_min"),
            F.max(c).alias(f"{g_name}_max"),
            dec_sum.alias(f"_sum_{g_name}")
            if state_form
            else dec_sum.cast("double").alias(f"{g_name}_sum"),
            F.count(c).cast("long").alias(f"{g_name}_count"),
        ]
    for c_name in counters:
        aggs += [F.max_by(F.col(c_name), pack).alias(f"{c_name}_last")]
        if state_form:
            aggs += [F.max(pack).alias(f"_pk_{c_name}")]
    return aggs


def moving_percentiles(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    percents: list[float],
    window: int = 3,
    interval: str = "day",
    round_to: int = 6,
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline agg, under the exact
    contract of DIVERGENCES S4: per date-histogram bucket, the
    percentiles of the RAW values in the trailing ``window`` buckets
    (ES merges the window's t-digest sketches — approximate; here the
    percentile is the exact interpolated quantile over the window's
    values, the stronger hash-checkable contract; swap in
    ``percentile_approx`` at extreme scale).

    Scale shape: never collects a bucket's values — each row is
    replicated ``window`` times (a small constant) to every target
    bucket whose trailing window contains it (``sequence`` +
    ``explode``), then ONE hash-partitioned exact-percentile agg per
    target bucket.  Target buckets past the last real bucket are
    dropped with a 1-row max-bucket broadcast (the ES window never
    extends past the series); leading buckets keep their shrinking
    window, as in ES.  Returns ``(key, doc_count, p<N>...)``.
    """
    if interval not in ("minute", "hour", "day", "week"):
        raise ValueError(f"unsupported interval: {interval}")
    step = f"interval 1 {interval}"
    b = F.date_trunc(interval, F.col(ts_col))
    base = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        b.alias("_b"), F.col(value_col).cast("double").alias("_v")
    )
    targets = F.sequence(
        F.col("_b"),
        F.col("_b") + F.expr(f"{step} * {window - 1}"),
        F.expr(step),
    )
    exploded = base.select(
        F.explode(targets).alias("key"), "_b", "_v"
    )
    last = base.agg(F.max("_b").alias("_last"))
    exploded = exploded.crossJoin(F.broadcast(last)).filter(
        F.col("key") <= F.col("_last")
    )
    aggs = [
        # doc_count counts the TARGET bucket's own rows, as ES keys
        # pipeline output on the histogram's buckets
        F.sum((F.col("_b") == F.col("key")).cast("long")).alias("doc_count"),
    ]
    for p in percents:
        aggs.append(
            F.round(F.percentile(F.col("_v"), F.lit(p / 100.0)), round_to)
            .alias(_pct_suffix(p))
        )
    return exploded.groupBy("key").agg(*aggs).orderBy("key")


def categorize_text(
    df: DataFrame,
    text_col: str,
    size: int = 10,
) -> DataFrame:
    """ES ``categorize_text`` aggregation (the ML log-categorization
    agg) under a DETERMINISTIC contract: messages group by their
    sequence of non-numeric tokens — any whitespace token containing
    a digit is treated as a variable placeholder and dropped from the
    category key, which is exactly the first-order behavior of the
    ES/ML categorizer (it tokenizes, discards numbers, and clusters
    on the remaining token sequence; its second-order 70%%-similarity
    merge step is data-order-dependent and has no deterministic
    analogue, so categories here are exact-key groups — documented
    divergence, reproducible on any engine).

    Top ``size`` categories by doc_count (key tie-break).  One
    projection + hash agg + TakeOrderedAndProject; messages with no
    surviving tokens drop (as in ES).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    key = F.array_join(
        F.filter(toks, lambda t: (t != "") & ~t.rlike("[0-9]")), " "
    )
    base = df.filter(F.col(text_col).isNotNull()).select(key.alias("key"))
    return (
        base.filter(F.col("key") != "")
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )


def frequent_item_sets(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: float = 0.1,
    max_size: int = 2,
    size: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation (market-basket mining):
    item sets of size 1..``max_size`` whose SUPPORT — the fraction of
    baskets (distinct ``group_col`` values) containing EVERY item of
    the set — reaches ``min_support``; top ``size`` sets by doc_count
    with the joined-key tie-break.  ES mines closed sets with its ECLAT
    variant and the same support definition; exact-key enumeration at
    bounded set size is the deterministic contract here (sets of size
    ≤ 3 — the sizes the ES UI surfaces — via equi-self-joins).

    Scale shape (Apriori): the basket frame is deduplicated to
    distinct (basket, item) pairs, items are pruned to FREQUENT
    singletons first (the Apriori downward-closure property, one
    broadcast semi-join), then pair/triple candidates come from
    equi-joins on the basket key — shuffle-partitioned on baskets,
    never all-pairs over the corpus; the basket total is a 1-row
    broadcast.  Returns ``(items, n_items, doc_count, support)``.
    """
    if max_size not in (1, 2, 3):
        raise ValueError("max_size must be 1, 2, or 3")
    b = (
        df.filter(F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(group_col).alias("_g"), F.col(item_col).alias("_i"))
        .distinct()
    )
    # the distinct pair frame feeds 4+ consumers (basket total,
    # singleton census, and each self-join side per level) and AQE's
    # stage reuse does NOT dedupe it (the consumers aggregate on
    # different keys, so nothing above the distinct is canonical-equal);
    # one eager checkpoint of the two-column pairs runs the scan +
    # distinct once (guide §2.2) — A/B'd: 1.8-5.9 -> 1.4-2.5 s at sf0.1
    b = b.localCheckpoint(eager=True)
    tot = b.agg(F.count_distinct("_g").cast("double").alias("_tot"))

    def finish(grouped: DataFrame, items: Column) -> DataFrame:
        return grouped.crossJoin(F.broadcast(tot)).select(
            items.alias("items"),
            F.col("doc_count"),
            F.round(F.col("doc_count") / F.col("_tot"), round_to).alias(
                "support"
            ),
        )

    # Apriori prune: only items frequent on their own can appear in
    # any frequent set
    singles = b.groupBy("_i").agg(F.count("*").cast("long").alias("doc_count"))
    freq1 = finish(singles, F.col("_i")).filter(
        F.col("support") >= F.lit(min_support)
    )
    levels = [freq1.select("items", "doc_count", "support")]
    if max_size >= 2:
        kept = b.join(
            F.broadcast(freq1.select(F.col("items").alias("_i"))), "_i", "semi"
        )
        a, c = kept.alias("a"), kept.alias("c")
        pairs = (
            a.join(c, (F.col("a._g") == F.col("c._g")) & (F.col("a._i") < F.col("c._i")))
            .groupBy(F.col("a._i").alias("_i1"), F.col("c._i").alias("_i2"))
            .agg(F.count("*").cast("long").alias("doc_count"))
        )
        freq2 = finish(
            pairs, F.concat_ws(" ", F.col("_i1"), F.col("_i2"))
        ).filter(F.col("support") >= F.lit(min_support))
        levels.append(freq2)
        if max_size >= 3:
            d = kept.alias("d")
            triples = (
                a.join(c, (F.col("a._g") == F.col("c._g")) & (F.col("a._i") < F.col("c._i")))
                .join(d, (F.col("a._g") == F.col("d._g")) & (F.col("c._i") < F.col("d._i")))
                .groupBy(
                    F.col("a._i").alias("_i1"),
                    F.col("c._i").alias("_i2"),
                    F.col("d._i").alias("_i3"),
                )
                .agg(F.count("*").cast("long").alias("doc_count"))
            )
            freq3 = finish(
                triples, F.concat_ws(" ", F.col("_i1"), F.col("_i2"), F.col("_i3"))
            ).filter(F.col("support") >= F.lit(min_support))
            levels.append(freq3)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return (
        out.withColumn(
            "n_items", (F.size(F.split(F.col("items"), " "))).cast("long")
        )
        .select("items", "n_items", "doc_count", "support")
        .orderBy(F.col("doc_count").desc(), F.col("items").asc())
        .limit(size)
    )


def matrix_stats(
    df: DataFrame,
    fields: list[str],
    round_to: int = 6,
) -> DataFrame:
    """ES ``matrix_stats`` aggregation: multivariate statistics over
    numeric fields — per field mean / variance / skewness / kurtosis
    and per pair covariance / correlation, computed from EXACT decimal
    raw-moment sums (Σx, Σx², Σx³, Σx⁴, Σxy) in one hash aggregate,
    then combined in mirrored double arithmetic and rounded.

    Estimators (the ES RunningStats contract): sample variance and
    covariance (n−1 denominators); skewness ``√n·M3 / M2^{3/2}`` and
    kurtosis ``n·M4 / M2²`` over the population central sums
    ``M_k = Σ(x−x̄)^k`` expanded from the raw sums.  Documents missing
    ANY of the fields are skipped entirely, as in ES.

    Input contract for exactness: values carry ≤ 2 decimals and
    |x| < 10⁶ (the per-step decimal downcasts keep x⁴ within
    decimal(38,8); wider inputs need rescaling).  Output: one row per
    unordered field pair (field_a < field_b) carrying both fields'
    univariate stats plus covariance and correlation.
    """
    if len(fields) < 2:
        raise ValueError("matrix_stats needs at least two fields")
    cond = F.lit(True)
    for f in fields:
        cond = cond & F.col(f).isNotNull()
    # 16+ exact-decimal moment sums per row is per-row-heavy: spread
    # a single-file scan so the partial aggregate parallelizes
    # (scale-adaptive no-op on a real multi-split scan; the filter
    # pushes below the added exchange).  Measured at sf0.1:
    # 1.1 s -> 0.8 s warm best-of-3.
    base = spread_scan(df.filter(cond))
    aggs = [F.count("*").cast("long").alias("_n")]
    for f in fields:
        x = F.col(f).cast("decimal(10,2)")
        x2 = (x * x).cast("decimal(16,4)")
        x3 = (x2 * x).cast("decimal(22,6)")
        x4 = (x3 * x).cast("decimal(33,8)")
        aggs += [
            F.sum(x).cast("double").alias(f"_s1_{f}"),
            F.sum(x2).cast("double").alias(f"_s2_{f}"),
            F.sum(x3).cast("double").alias(f"_s3_{f}"),
            F.sum(x4).cast("double").alias(f"_s4_{f}"),
        ]
    pairs = [
        (fields[i], fields[j])
        for i in range(len(fields))
        for j in range(i + 1, len(fields))
    ]
    for fa, fb in pairs:
        xa = F.col(fa).cast("decimal(10,2)")
        xb = F.col(fb).cast("decimal(10,2)")
        aggs.append(
            F.sum((xa * xb).cast("decimal(16,4)"))
            .cast("double")
            .alias(f"_p_{fa}_{fb}")
        )
    row = base.agg(*aggs)
    nd = F.col("_n").cast("double")

    def m2(f):
        return F.col(f"_s2_{f}") - F.col(f"_s1_{f}") * F.col(f"_s1_{f}") / nd

    def stats_of(f, suffix):
        s1, s2, s3, s4 = (F.col(f"_s{k}_{f}") for k in (1, 2, 3, 4))
        c2 = m2(f)
        c3 = s3 - F.lit(3.0) * s1 * s2 / nd + F.lit(2.0) * s1 * s1 * s1 / (nd * nd)
        c4 = (
            s4
            - F.lit(4.0) * s1 * s3 / nd
            + F.lit(6.0) * s1 * s1 * s2 / (nd * nd)
            - F.lit(3.0) * s1 * s1 * s1 * s1 / (nd * nd * nd)
        )
        # guards: n = 1 has no sample variance (null, as ES reports
        # for degenerate buckets); zero spread has no skew/kurtosis
        return [
            F.round(s1 / nd, round_to).alias(f"mean_{suffix}"),
            F.round(
                F.when(nd > 1, c2 / (nd - F.lit(1.0))), round_to
            ).alias(f"variance_{suffix}"),
            F.round(
                F.when(c2 > 0, F.sqrt(nd) * c3 / (c2 * F.sqrt(c2))), round_to
            ).alias(f"skewness_{suffix}"),
            F.round(
                F.when(c2 > 0, nd * c4 / (c2 * c2)), round_to
            ).alias(f"kurtosis_{suffix}"),
        ]

    # ONE aggregation, the pair rows produced by exploding an array
    # of structs over the single agg row.  A union of per-pair
    # ``row.select(...)`` branches re-plans the aggregate per branch
    # (no exchange to reuse above a 1-row LocalTableScan-sized agg):
    # measured 6 parquet scans + 12 HashAggregates for 3 pairs; this
    # shape is 1 scan + 1 aggregate and the identical arithmetic per
    # pair, so values are bit-identical.
    pair_structs = []
    for fa, fb in pairs:
        cxy = F.col(f"_p_{fa}_{fb}") - F.col(f"_s1_{fa}") * F.col(f"_s1_{fb}") / nd
        pair_structs.append(
            F.struct(
                F.lit(fa).alias("field_a"),
                F.lit(fb).alias("field_b"),
                F.col("_n").alias("doc_count"),
                *stats_of(fa, "a"),
                *stats_of(fb, "b"),
                F.round(
                    F.when(nd > 1, cxy / (nd - F.lit(1.0))), round_to
                ).alias("covariance"),
                F.round(
                    F.when(
                        (m2(fa) > 0) & (m2(fb) > 0),
                        cxy / (F.sqrt(m2(fa)) * F.sqrt(m2(fb))),
                    ),
                    round_to,
                ).alias("correlation"),
            )
        )
    out = row.select(F.explode(F.array(*pair_structs)).alias("_ps")).select("_ps.*")
    return out.orderBy("field_a", "field_b")


def bucket_correlation(
    buckets: DataFrame,
    sort_col: str,
    value_col: str,
    indicator: list[float],
    round_to: int = 6,
) -> DataFrame:
    """ES ``bucket_correlation`` pipeline agg (``count_correlation``
    function): the Pearson correlation between the bucket metric
    series (in ``sort_col`` order) and a caller-provided indicator
    vector of the same length — the "does this metric track my
    expected pattern" ML helper.

    One window pass assigns positions, the indicator enters as a
    literal array (``element_at``), and a single 1-row aggregate
    computes the five sums; exact IEEE arithmetic rounded at
    ``round_to``.  Returns one row ``(correlation, n)``.
    """
    w = Window.orderBy(F.col(sort_col).asc())
    idx = F.row_number().over(w)
    ind = F.array(*[F.lit(float(v)) for v in indicator])
    base = buckets.select(
        # decimal accumulation: plain double sums are
        # partition-order-dependent and would break hash parity
        # (input contract: metric values with <= 6 decimals)
        F.col(value_col).cast("decimal(19,6)").alias("_x"),
        F.element_at(ind, idx).cast("decimal(19,6)").alias("_y"),
    ).filter(F.col("_y").isNotNull())
    agg = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum("_y").cast("double").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("double").alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).cast("double").alias("_sxy"),
    )
    n = F.col("_n")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    return agg.select(
        F.round(
            F.when((vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))),
            round_to,
        ).alias("correlation"),
        F.col("_n").cast("long").alias("n"),
    )


def bucket_count_ks_test(
    buckets: DataFrame,
    sort_col: str,
    count_col: str = "doc_count",
    fractions: list[float] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """ES ``bucket_count_ks_test`` pipeline agg: the two-sample
    Kolmogorov-Smirnov statistic between the bucket doc-count
    distribution (in ``sort_col`` order) and the caller-provided
    expected ``fractions`` (uniform when omitted, the ES default) —
    ``D = max_k |CDF_counts(k) − CDF_expected(k)|``, computed exactly
    from one cumulative-sum window pass over bucket-cardinality rows.

    The statistic is exact; ``p_approx`` is the one-term asymptotic
    tail bound ``2·exp(−2·n·D²)`` (n = total doc count) under the
    DIVERGENCES S11 4-dp transcendental contract — ES's ML module
    evaluates the full K series; the one-term bound is its leading
    term and monotone in D, so threshold decisions agree (documented
    divergence).  Returns one row ``(statistic, p_approx, n)``.
    """
    w = Window.orderBy(F.col(sort_col).asc())
    idx = F.row_number().over(w)
    # counts are integral — long cumsums are exact and order-stable
    cum = F.sum(F.col(count_col).cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    base = buckets.select(
        F.col(count_col).cast("double").alias("_c"),
        idx.alias("_i"),
        cum.cast("double").alias("_cum"),
    )
    if fractions is not None:
        fr = F.array(*[F.lit(float(v)) for v in fractions])
        # expected CDF at position i = prefix sum of the literal list
        exp_cdf = F.aggregate(
            F.slice(fr, F.lit(1), F.col("_i")), F.lit(0.0), lambda s, x: s + x
        )
    else:
        exp_cdf = None
    tot = base.agg(
        F.sum("_c").alias("_tot"), F.count("*").cast("double").alias("_k")
    )
    j = base.crossJoin(F.broadcast(tot))
    ecdf = F.col("_cum") / F.col("_tot")
    expected = exp_cdf if exp_cdf is not None else F.col("_i") / F.col("_k")
    d = F.abs(ecdf - expected)
    out = j.agg(
        F.round(F.max(d), round_to).alias("statistic"),
        F.max(F.col("_tot")).alias("_n"),
    )
    return out.select(
        "statistic",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(2.0)
                * F.exp(F.lit(-2.0) * F.col("_n") * F.col("statistic") * F.col("statistic")),
            ),
            4,
        ).alias("p_approx"),
        F.col("_n").cast("long").alias("n"),
    )


def change_point(
    buckets: DataFrame,
    sort_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """ES ``change_point`` aggregation (the ML step-change detector)
    under a deterministic contract: over the bucket metric series in
    ``sort_col`` order, the change point is the split k maximizing
    the variance REDUCTION of binary segmentation —
    ``R(k) = SST − (SSE[1..k] + SSE[k+1..n])`` — computed exactly
    from one cumulative-sum window pass (``Σx``, ``Σx²`` prefixes +
    the 1-row totals broadcast); ties break on the earliest key.
    ES's detector tests spike/dip/trend/distribution types with
    p-values from simulation; the step_change type with the variance
    criterion is its deterministic core (documented divergence: a
    series whose best split reduces no variance reports
    ``stationary`` instead of a p-value).

    Window work is bucket-cardinality (the corpus was already
    reduced); returns one row ``(key, change_type, score, mean_left,
    mean_right)``.
    """
    w = Window.orderBy(F.col(sort_col).asc())
    # decimal cumsums: windowed double sums are segment-tree in some
    # engines and sequential in others — exact accumulation is the
    # order-stable contract (input: metric values with <= 6 decimals)
    dec = F.col(value_col).cast("decimal(19,6)")
    cum1 = F.sum(dec).over(w.rowsBetween(Window.unboundedPreceding, 0))
    cum2 = F.sum(dec * dec).over(w.rowsBetween(Window.unboundedPreceding, 0))
    idx = F.row_number().over(w)
    base = buckets.select(
        F.col(sort_col).alias("key"),
        idx.alias("_i"),
        cum1.cast("double").alias("_s1"),
        cum2.cast("double").alias("_s2"),
    )
    tot = base.agg(
        F.max("_i").cast("double").alias("_n"),
        # totals = the LAST cumsum (max_by on position): a plain max
        # of _s1 would be wrong for series with negative values
        F.max_by("_s1", "_i").alias("_t1"),
        F.max_by("_s2", "_i").alias("_t2"),
    )
    j = base.crossJoin(F.broadcast(tot)).filter(F.col("_i") < F.col("_n"))
    i = F.col("_i").cast("double")
    n = F.col("_n")
    sse_l = F.col("_s2") - F.col("_s1") * F.col("_s1") / i
    r1 = F.col("_t1") - F.col("_s1")
    r2 = F.col("_t2") - F.col("_s2")
    sse_r = r2 - r1 * r1 / (n - i)
    sst = F.col("_t2") - F.col("_t1") * F.col("_t1") / n
    red = sst - (sse_l + sse_r)
    scored = j.select(
        "key",
        F.round(red, round_to).alias("score"),
        F.round(F.col("_s1") / i, round_to).alias("mean_left"),
        F.round(r1 / (n - i), round_to).alias("mean_right"),
    )
    best = scored.orderBy(F.col("score").desc(), F.col("key").asc()).limit(1)
    return best.select(
        "key",
        F.when(F.col("score") > 0, F.lit("step_change"))
        .otherwise(F.lit("stationary"))
        .alias("change_type"),
        "score",
        "mean_left",
        "mean_right",
    )


def _norm_sf(x: Column) -> Column:
    """Two-sided normal tail 2·(1 − Φ(|x|)) via the Abramowitz &
    Stegun 26.2.17 polynomial (|error| < 7.5e-8), rendered with the
    same expression tree on every engine.  Shared by t_test_agg."""
    ax = F.abs(x)
    k = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * ax)
    poly = (
        F.lit(0.319381530) * k
        + F.lit(-0.356563782) * k * k
        + F.lit(1.781477937) * k * k * k
        + F.lit(-1.821255978) * k * k * k * k
        + F.lit(1.330274429) * k * k * k * k * k
    )
    phi = F.exp(F.lit(-0.5) * ax * ax) / F.lit(2.5066282746310002)
    return F.lit(2.0) * phi * poly


def t_test_agg(
    df: DataFrame,
    field_a: str,
    field_b: str | None = None,
    group_field: str | None = None,
    group_values: tuple | None = None,
    type: str = "heteroscedastic",
    round_to: int = 6,
) -> DataFrame:
    """ES ``t_test`` aggregation: Student's t between two samples —
    either two FIELDS of the same documents (``field_b``; the
    ``paired`` type needs this form, as in ES) or one field split by
    two ``group_values`` of ``group_field`` (the ES filters form).
    Types: ``paired`` (t over the per-doc differences),
    ``homoscedastic`` (pooled variance), ``heteroscedastic`` (Welch,
    the ES default) with the Welch–Satterthwaite df.

    All sums accumulate as exact decimals (order-stable, inputs with
    ≤ 2 decimals); the statistic and df combine in mirrored double
    arithmetic rounded at ``round_to``.  ES returns the two-sided
    p-value from the exact t distribution; here ``p_value`` uses the
    NORMAL approximation (A&S 26.2.17, |err| < 7.5e-8 in Φ) under the
    S11 4-dp contract — indistinguishable for the df ≫ 100 regime of
    corpus-scale buckets, documented divergence below (where the t
    and normal tails differ at small df, the exact ``t_statistic``
    and ``df`` columns carry the decision).  Returns one row
    ``(t_statistic, df, p_value, n_a, n_b)``.
    """
    if type not in ("paired", "homoscedastic", "heteroscedastic"):
        raise ValueError(f"unsupported t_test type: {type}")
    if (field_b is None) == (group_field is None):
        raise ValueError("exactly one of field_b / group_field is required")
    if type == "paired" and field_b is None:
        raise ValueError("paired t_test needs the two-fields form (field_b)")

    def sums(col: Column, flag: Column):
        dec = col.cast("decimal(19,4)")
        return [
            F.sum(F.when(flag, F.lit(1)).otherwise(F.lit(0)))
            .cast("double"),
            F.sum(F.when(flag, dec)).cast("double"),
            F.sum(F.when(flag, (dec * dec).cast("decimal(38,8)")))
            .cast("double"),
        ]

    if type == "paired":
        both = F.col(field_a).isNotNull() & F.col(field_b).isNotNull()
        d = (
            F.col(field_a).cast("decimal(19,4)")
            - F.col(field_b).cast("decimal(19,4)")
        ).cast("decimal(19,4)")
        agg = df.agg(
            F.sum(F.when(both, F.lit(1)).otherwise(F.lit(0)))
            .cast("double")
            .alias("_n"),
            F.sum(F.when(both, d)).cast("double").alias("_s1"),
            F.sum(F.when(both, (d * d).cast("decimal(38,8)")))
            .cast("double")
            .alias("_s2"),
        )
        n = F.col("_n")
        mean = F.col("_s1") / n
        var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - F.lit(1.0))
        t = mean / F.sqrt(var / n)
        dfree = n - F.lit(1.0)
        return agg.select(
            F.round(t, round_to).alias("t_statistic"),
            F.round(dfree, round_to).alias("df"),
            F.round(F.least(F.lit(1.0), _norm_sf(t)), 4).alias("p_value"),
            n.cast("long").alias("n_a"),
            n.cast("long").alias("n_b"),
        )

    if field_b is not None:
        fa = F.col(field_a).isNotNull()
        fb = F.col(field_b).isNotNull()
        na, sa1, sa2 = sums(F.col(field_a), fa)
        nb, sb1, sb2 = sums(F.col(field_b), fb)
    else:
        va, vb = group_values
        fa = (F.col(group_field) == F.lit(va)) & F.col(field_a).isNotNull()
        fb = (F.col(group_field) == F.lit(vb)) & F.col(field_a).isNotNull()
        na, sa1, sa2 = sums(F.col(field_a), fa)
        nb, sb1, sb2 = sums(F.col(field_a), fb)
    agg = df.agg(
        na.alias("_na"), sa1.alias("_sa1"), sa2.alias("_sa2"),
        nb.alias("_nb"), sb1.alias("_sb1"), sb2.alias("_sb2"),
    )
    n1, n2 = F.col("_na"), F.col("_nb")
    m1 = F.col("_sa1") / n1
    m2 = F.col("_sb1") / n2
    v1 = (F.col("_sa2") - F.col("_sa1") * F.col("_sa1") / n1) / (n1 - F.lit(1.0))
    v2 = (F.col("_sb2") - F.col("_sb1") * F.col("_sb1") / n2) / (n2 - F.lit(1.0))
    if type == "homoscedastic":
        sp2 = ((n1 - F.lit(1.0)) * v1 + (n2 - F.lit(1.0)) * v2) / (
            n1 + n2 - F.lit(2.0)
        )
        t = (m1 - m2) / F.sqrt(sp2 / n1 + sp2 / n2)
        dfree = n1 + n2 - F.lit(2.0)
    else:
        se2 = v1 / n1 + v2 / n2
        t = (m1 - m2) / F.sqrt(se2)
        dfree = (se2 * se2) / (
            (v1 / n1) * (v1 / n1) / (n1 - F.lit(1.0))
            + (v2 / n2) * (v2 / n2) / (n2 - F.lit(1.0))
        )
    return agg.select(
        F.round(t, round_to).alias("t_statistic"),
        F.round(dfree, round_to).alias("df"),
        F.round(F.least(F.lit(1.0), _norm_sf(t)), 4).alias("p_value"),
        n1.cast("long").alias("n_a"),
        n2.cast("long").alias("n_b"),
    )


def ip_range_agg(
    df: DataFrame,
    ip_col: str,
    ranges: list[dict],
) -> DataFrame:
    """ES ``ip_range`` aggregation: bucket dotted-quad IPv4 strings
    into ``[from, to)`` ranges or CIDR ``mask`` blocks.  The address
    parses to a BIGINT (``a·2²⁴ + b·2¹⁶ + c·2⁸ + d`` — pure integer
    arithmetic, engine-identical); a document lands in EVERY matching
    range (ES range-family multi-membership), so membership keys
    build as an array and explode.  Range keys follow ES: the given
    ``key``, else ``from-to`` (with ``*`` for open ends), else the
    mask.  One projection + explode + hash agg; IPv6 is out of scope
    (documented).  Returns ``(key, doc_count)``.
    """
    parts = F.split(F.col(ip_col), r"\.")
    addr = (
        F.element_at(parts, 1).cast("long") * F.lit(16777216)
        + F.element_at(parts, 2).cast("long") * F.lit(65536)
        + F.element_at(parts, 3).cast("long") * F.lit(256)
        + F.element_at(parts, 4).cast("long")
    )

    def ip_to_long(s: str) -> int:
        a, b, c, d = (int(x) for x in s.split("."))
        return (a << 24) + (b << 16) + (c << 8) + d

    keys = []
    for r in ranges:
        if "mask" in r:
            base, bits = r["mask"].split("/")
            lo = ip_to_long(base) & (~((1 << (32 - int(bits))) - 1) & 0xFFFFFFFF)
            hi = lo + (1 << (32 - int(bits)))
            key = r.get("key", r["mask"])
        else:
            lo = ip_to_long(r["from"]) if "from" in r else None
            hi = ip_to_long(r["to"]) if "to" in r else None
            key = r.get(
                "key",
                f"{r.get('from', '*')}-{r.get('to', '*')}",
            )
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (addr >= F.lit(lo))
        if hi is not None:
            cond = cond & (addr < F.lit(hi))
        keys.append(F.when(cond, F.lit(key)))
    key_arr = F.array_compact(F.array(*keys))
    base = df.filter(F.col(ip_col).isNotNull()).select(
        F.explode(key_arr).alias("key")
    )
    return (
        base.groupBy("key")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .orderBy("key")
    )


def ip_prefix_agg(
    df: DataFrame,
    ip_col: str,
    prefix_length: int,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``ip_prefix`` aggregation (8.1+): bucket IPv4 addresses by
    their ``/prefix_length`` network — the BIGINT dotted-quad parse of
    :func:`ip_range_agg` masked down to the prefix (pure integer
    shifts, engine-identical) and rendered back as the dotted network
    address (the ES bucket key).  One projection + hash agg; IPv6 out
    of scope (documented, as in ip_range_agg).  Returns
    ``(key, prefix_length, doc_count)`` ordered by the network.
    """
    if not 0 < prefix_length <= 32:
        raise ValueError("prefix_length must be in 1..32")
    parts = F.split(F.col(ip_col), r"\.")
    addr = (
        F.element_at(parts, 1).cast("long") * F.lit(16777216)
        + F.element_at(parts, 2).cast("long") * F.lit(65536)
        + F.element_at(parts, 3).cast("long") * F.lit(256)
        + F.element_at(parts, 4).cast("long")
    )
    shift = 32 - prefix_length
    net = (addr.bitwiseAND(F.lit(0xFFFFFFFF - ((1 << shift) - 1)))).alias("_net")
    base = df.filter(F.col(ip_col).isNotNull()).select(net)
    n = F.col("_net")
    key = F.concat_ws(
        ".",
        F.floor(n / F.lit(16777216)).cast("long").cast("string"),
        F.pmod(F.floor(n / F.lit(65536)), F.lit(256)).cast("long").cast("string"),
        F.pmod(F.floor(n / F.lit(256)), F.lit(256)).cast("long").cast("string"),
        F.pmod(n, F.lit(256)).cast("long").cast("string"),
    )
    return (
        base.groupBy("_net")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .filter(F.col("doc_count") >= F.lit(int(min_doc_count)))
        .select(
            key.alias("key"),
            F.lit(prefix_length).cast("long").alias("prefix_length"),
            "doc_count",
            "_net",
        )
        .orderBy("_net")
        .drop("_net")
    )
