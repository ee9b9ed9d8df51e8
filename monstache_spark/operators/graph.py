"""ES Graph explore API (the X-Pack graph the Kibana graph UI calls).

``_graph/explore`` takes a seed query plus vertex field specs and
returns VERTICES (the most relevant terms per field among the seed
documents) and CONNECTIONS (vertex pairs that co-occur in documents,
weighted by co-occurrence) — the entity-relationship view consumers
build over a monstache-synced index (who-talks-to-whom, account →
merchant, host → process).

Deterministic contract (DIVERGENCES S29): vertices rank by DOC COUNT
within the seed set (ties by term asc), where ES's default vertex
weight is a sampled significance score (its docs: computed over a
"sample of the best-matching documents", so the weights move with
scoring and sampling); connections weigh by the EXACT co-occurrence
doc count over the whole seed set rather than ES's sampled estimate.
Membership of the returned graph is what users act on, and the
count-ranked graph over the full seed set is reproducible on any
engine.  Multi-hop spidering is, as in ES itself, iterated calls —
feed a hop's vertex terms back as the next seed query.

Plan shape (100 TB): the seed predicate prunes once at the scan; each
vertex list is ONE hash agg + TakeOrderedAndProject; each connection
frame is one hash agg over the (field_i, field_j) pairs of seed docs,
SEMI-JOINED to the two (broadcast, size-bounded) vertex lists —
nothing all-pairs, nothing corpus² (the pair cardinality is bounded by
|seed docs|, pre-aggregated map-side).  Output is one LONG-format
frame: ``kind`` ('vertex' | 'connection'), ``field``/``term``,
``field2``/``term2`` (null for vertices), ``weight``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monstache_spark.operators.search import compile_bool_query


def graph_explore(
    df: DataFrame,
    seed_query: dict | None,
    vertices: list[dict],
    min_doc_count: int = 1,
    analyzer=None,
    use_significance: bool = False,
) -> DataFrame:
    """Explore one hop: ``vertices`` is the ES request's vertex spec
    list — ``[{"field": ..., "size": N}, ...]`` (2+ fields; connections
    are computed for every field pair in list order).

    ``use_significance=True`` ranks vertices by the JLH significance
    score of the value in the seed set versus the whole frame —
    ``(fg% − bg%)·(fg%/bg%)``, the same exact-IEEE 6-dp formula as
    ``significant_terms`` — which is ES's DEFAULT vertex weighting
    (computed here over the FULL seed/background counts rather than
    ES's sample, the S29 determinism refinement); ``weight`` is then
    the score (double).  ``False`` ranks by plain seed doc count —
    ES's ``use_significance: false`` mode, bit for bit.
    """
    if len(vertices) < 2:
        raise ValueError("graph explore needs at least 2 vertex fields")
    seed_pred = (
        compile_bool_query(seed_query, analyzer=analyzer)
        if seed_query is not None
        else F.lit(True)
    )
    seed = df.filter(seed_pred)
    flagged = df.withColumn(
        "_fg", F.when(seed_pred, F.lit(1)).otherwise(F.lit(0))
    )
    totals = flagged.agg(
        F.sum("_fg").cast("double").alias("_fg_total"),
        F.count("*").cast("double").alias("_bg_total"),
    )
    vertex_frames = []
    kept = {}
    for spec in vertices:
        field, size = spec["field"], int(spec.get("size", 10))
        if use_significance:
            counts = (
                flagged.filter(F.col(field).isNotNull())
                .groupBy(F.col(field).cast("string").alias("term"))
                .agg(
                    F.sum("_fg").cast("long").alias("_fg_count"),
                    F.count("*").cast("long").alias("_bg_count"),
                )
                .filter(F.col("_fg_count") >= F.lit(int(min_doc_count)))
            )
            n11 = F.col("_fg_count").cast("double")
            n_1 = F.col("_bg_count").cast("double")
            n1_ = F.col("_fg_total")
            N = F.col("_bg_total")
            v = (
                counts.crossJoin(F.broadcast(totals))
                .withColumn(
                    "weight",
                    F.round(
                        (n11 / n1_ - n_1 / N) * ((n11 / n1_) / (n_1 / N)), 6
                    ),
                )
                .select("term", "weight")
                .orderBy(F.col("weight").desc(), F.col("term").asc())
                .limit(size)
            )
        else:
            v = (
                seed.filter(F.col(field).isNotNull())
                .groupBy(F.col(field).cast("string").alias("term"))
                .agg(F.count("*").cast("long").alias("weight"))
                .filter(F.col("weight") >= F.lit(int(min_doc_count)))
                .orderBy(F.col("weight").desc(), F.col("term").asc())
                .limit(size)
            )
        kept[field] = v.select("term")
        vertex_frames.append(
            v.select(
                F.lit("vertex").alias("kind"),
                F.lit(field).alias("field"),
                "term",
                F.lit(None).cast("string").alias("field2"),
                F.lit(None).cast("string").alias("term2"),
                "weight",
            )
        )
    conn_frames = []
    fields = [spec["field"] for spec in vertices]
    for i in range(len(fields)):
        for j in range(i + 1, len(fields)):
            fi, fj = fields[i], fields[j]
            pairs = (
                seed.filter(F.col(fi).isNotNull() & F.col(fj).isNotNull())
                .groupBy(
                    F.col(fi).cast("string").alias("term"),
                    F.col(fj).cast("string").alias("term2"),
                )
                .agg(F.count("*").cast("long").alias("weight"))
            )
            pairs = pairs.join(
                F.broadcast(kept[fi]), "term", "leftsemi"
            ).join(
                F.broadcast(kept[fj].select(F.col("term").alias("term2"))),
                "term2",
                "leftsemi",
            )
            w = (
                F.col("weight").cast("double")
                if use_significance
                else F.col("weight")
            )
            conn_frames.append(
                pairs.select(
                    F.lit("connection").alias("kind"),
                    F.lit(fi).alias("field"),
                    "term",
                    F.lit(fj).alias("field2"),
                    "term2",
                    w.alias("weight"),
                )
            )
    out = vertex_frames[0]
    for f in vertex_frames[1:] + conn_frames:
        out = out.unionByName(f)
    return out
