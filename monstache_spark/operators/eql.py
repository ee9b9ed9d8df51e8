"""ES EQL (Event Query Language) sequence matching.

EQL is the ES surface security/observability consumers run over synced
event collections (``sequence by host.id [process where ...] [network
where ...] within 10m``) — exactly the event shape monstache's change
stream materializes.  This module implements the ``sequence`` core:
an ORDERED chain of step filters joined by a ``by`` key, the whole
sequence bounded by ``maxspan``.

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monstache_spark.operators.search import compile_bool_query

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
    """Match an EQL ``sequence`` of 2+ ``steps`` (each a bool-DSL dict)
    joined by the ``by`` key, the first→last gap bounded by
    ``maxspan_s`` seconds.  Returns one row per completed sequence:
    ``(by, t1, id1, t2, id2, ..., span_s)``.

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
    if len(steps) < 2:
        raise ValueError("a sequence needs at least 2 steps")
    frames = []
    for i, step in enumerate(steps, start=1):
        f = events.filter(compile_bool_query(step, analyzer=analyzer))
        frames.append(
            f.select(
                F.col(by).alias("_k"),
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
        u = events.filter(compile_bool_query(until, analyzer=analyzer)).select(
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
    out_cols = [F.col("_k").alias(by)]
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
        f = events.filter(compile_bool_query(flt, analyzer=analyzer))
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
