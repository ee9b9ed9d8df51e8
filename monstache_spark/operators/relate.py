"""Relate — the foreign-key fan-out join subsystem (SURVEY.md §2.4 J1-J3).

Reference semantics (processRelated, monstache.go:1221-1358): an op in
namespace A with a configured relation A→B extracts ``src-field`` from
the doc (dotted paths supported, extractData monstache.go:1112-1138),
coerces it to ``match-field-type`` (monstache.go:1157-1219), queries B
for every doc where ``match-field`` equals the value, and re-emits each
match as a synthetic op. Multi-hop chains BFS with a ``max-depth``
guard (monstache.go:1236-1238); ``keep-src`` controls whether the A op
itself survives (monstache.go:3419-3462).

The reference executes this as a per-row MongoDB ``Find`` RPC from a
10-thread pool with a 1000-op overflow-drop queue (monstache.go:99-100,
104). Spark-first, it is simply an equi-join: the "query B per A row"
becomes ``A.join(B, A[src] == B[match])`` — broadcast when B is small
(dimension tables), sort-merge otherwise, chosen by Catalyst/AQE. The
multi-hop BFS becomes a bounded loop emitting chained joins at
plan-build time; no queue, no drops (the reference's silent overflow
drop is an intentional divergence we do NOT replicate — SURVEY.md §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# match-field-type coercions, monstache.go:1157-1219
_COERCIONS = {
    "objectId": "string",
    "string": "string",
    "int": "int",
    "long": "long",
    "decimal": "decimal(38,9)",
}


@dataclass
class Relation:
    """One relate config entry (reference struct monstache.go:206-217)."""

    namespace: str               # source namespace A
    with_namespace: str          # target namespace B
    src_field: str               # field in A's doc (dotted path ok)
    match_field: str             # field in B to equality-match
    match_field_type: str | None = None
    keep_src: bool = False       # keep the A op too (monstache.go:3419-3462)
    max_depth: int = 0           # 0 = unlimited hops from this relation
    dot_notation: bool = False   # selector style (monstache.go:1271-1275)


def coerce_key(col, match_field_type: str | None):
    if match_field_type is None:
        return col
    try:
        return col.cast(_COERCIONS[match_field_type])
    except KeyError:
        raise ValueError(f"unsupported match-field-type: {match_field_type}") from None


def relate_once(
    src: DataFrame,
    target: DataFrame,
    rel: Relation,
    broadcast_target: bool | None = None,
) -> DataFrame:
    """J1 single hop: re-emit every target doc matching a source op.

    Returns the joined rows (one per A-event × B-match, like the
    reference's re-emission); dotted ``src_field`` paths resolve
    through struct columns via ``F.col("a.b.c")``.

    ``broadcast_target=None`` lets Catalyst/AQE choose the join
    strategy; True forces a broadcast (the right call for dimension
    tables at any scale); False forces shuffle.
    """
    key = coerce_key(F.col(rel.src_field), rel.match_field_type)
    tgt = F.broadcast(target) if broadcast_target else target
    return src.join(tgt, key == coerce_key(tgt[rel.match_field], rel.match_field_type), "inner")


def relate_chain(
    frames: dict[str, DataFrame],
    start: DataFrame,
    relations: list[Relation],
    max_depth: int | None = None,
    start_ns: str | None = None,
) -> list[DataFrame]:
    """Multi-hop BFS at plan-build time (monstache.go:1221-1358).

    Walks relations breadth-first from ``start``'s namespace; each hop
    is one equi-join DataFrame. ``max_depth`` bounds the hop count
    (monstache.go:1236-1238). Returns the per-hop result frames — the
    caller unions what it wants (keep_src picks whether hop 0 rows
    survive, monstache.go:3419-3462).

    Cycles terminate via the depth bound, same as the reference.
    """
    by_ns: dict[str, list[Relation]] = {}
    for r in relations:
        by_ns.setdefault(r.namespace, []).append(r)

    results: list[DataFrame] = []
    # frontier: (namespace, DataFrame of rows that just arrived there);
    # start_ns says which namespace `start`'s rows live in (defaults to
    # the first relation's source ns for back-compat)
    root = start_ns if start_ns is not None else (relations[0].namespace if relations else None)
    frontier: list[tuple[str, DataFrame]] = [(root, start)] if relations else []
    depth = 0
    while frontier:
        if max_depth is not None and depth >= max_depth:
            break
        nxt: list[tuple[str, DataFrame]] = []
        for ns, df in frontier:
            for rel in by_ns.get(ns, ()):  # fan out every relation on this ns
                joined = relate_once(df, frames[rel.with_namespace], rel)
                results.append(joined)
                nxt.append((rel.with_namespace, joined))
        frontier = nxt
        depth += 1
    return results


def identity_delete_propagation(deletes: DataFrame, rel: Relation) -> DataFrame:
    """J2: a delete in A with an _id→_id relation synthesizes a delete
    for the same id in B (monstache.go:1239-1251, IsIdentity
    monstache.go:452-457). Pure projection — no join needed."""
    return deletes.withColumn("ns", F.lit(rel.with_namespace))


def delete_via_sink_lookup(deletes: DataFrame, sink_state: DataFrame, rel: Relation) -> DataFrame:
    """J3: non-identity delete — the source doc is gone, so recover its
    fields from the sink state table (the reference searches ES for the
    _id: findDeletedSrcDoc monstache.go:4015-4051), then relate.

    ``sink_state`` is the engine's materialized state table keyed
    (ns, id) — the decision that the sink is a queryable table, not a
    fire-and-forget write (SURVEY.md §7.3)."""
    recovered = deletes.select("ns", "id", "version").join(
        sink_state.drop("version"), ["ns", "id"], "inner"
    )
    return recovered
