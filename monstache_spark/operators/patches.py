"""Change-history patches (SURVEY.md §2.3 M9 — "json-merge-patches").

The reference, for patch-namespaces, GETs the current doc from ES,
computes an RFC-7386 merge patch old→new, and appends ``{ts, p, v}``
to a ``json-merge-patches`` array on the doc (addPatch
monstache.go:3084-3158) — one synchronous ES round-trip per update.

Spark-first divergence (documented): with the full op stream
available, the patch sequence is a set-level window computation —
``lag()`` over each key's version-ordered history yields old→new in
one pass, no per-row sink round-trips. And instead of a JSON string
we emit a TYPED patch struct (changed columns, nulls for unchanged):
engine-friendly, oracle-checkable, and convertible to RFC-7386 JSON
at the edge if a consumer needs the wire format."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_patch_history(
    ops: DataFrame,
    payload_cols: tuple[str, ...] = ("value", "k"),
    key_cols: tuple[str, ...] = ("ns", "id"),
) -> DataFrame:
    """Per key, version-ordered patch rows: patch_v (1-based), and for
    each payload column its new value when changed from the previous
    version else null. The first version (the insert) reports all
    fields, like the reference seeding v1 with the full doc
    (monstache.go:3139-3149). Deletes close the history with a
    tombstone patch row."""
    w = Window.partitionBy(*key_cols).orderBy(F.col("version").asc())
    out = ops.withColumn("patch_v", F.row_number().over(w).cast("long"))
    for c in payload_cols:
        prev = F.lag(c).over(w)
        changed = (F.col("patch_v") == 1) | ~prev.eqNullSafe(F.col(c))
        out = out.withColumn(f"patch_{c}", F.when(changed & (F.col("op") != "d"), F.col(c)))
    return out.select(
        *key_cols,
        "patch_v",
        "version",
        (F.col("op") == "d").alias("is_tombstone"),
        *[F.col(f"patch_{c}") for c in payload_cols],
    )
