"""Change-history patches (SURVEY.md §2.3 M9 — "json-merge-patches").

The reference, for patch-namespaces, GETs the current doc from ES,
computes an RFC-7386 merge patch old→new, and appends ``{ts, p, v}``
to a ``json-merge-patches`` array on the doc (addPatch
monstache.go:3084-3158) — one synchronous ES round-trip per update.

Spark-first divergence (documented): with the full op stream
available, the patch sequence is a set-level window computation —
``lag()`` over each key's version-ordered history yields old→new in
one pass, no per-row sink round-trips. Two representations:

* ``merge_patch_history`` — TYPED patch struct over envelope columns
  (changed columns, nulls for unchanged): engine-friendly and fully
  codegen'd, for schemas the engine already knows.
* ``json_merge_patches`` — REAL RFC-7386 merge patches over dynamic
  JSON documents (the reference's actual wire format): recursive
  object diff via an Arrow-batched pandas UDF, since a recursive diff
  of arbitrary JSON is genuinely outside Spark's built-in expression
  surface. The v=1 patch is the whole document, exactly like the
  reference seeding the history (monstache.go:3139-3149).
"""

from __future__ import annotations

import json

import pandas as pd
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


def rfc7386_diff(old, new):
    """RFC 7386 merge patch such that apply(old, patch) == new.

    Same contract as jsonpatch.CreateMergePatch, the library the
    reference calls (monstache.go:3129): non-object replacement is the
    new value verbatim; removed keys map to null; nested objects
    recurse. (Docs whose values are literal JSON nulls are therefore
    not round-trippable — an RFC 7386 limitation, not an engine one.)
    """
    if not isinstance(old, dict) or not isinstance(new, dict):
        return new
    patch = {}
    for k, v in new.items():
        if k not in old:
            patch[k] = v
        elif old[k] != v:
            patch[k] = (
                rfc7386_diff(old[k], v)
                if isinstance(old[k], dict) and isinstance(v, dict)
                else v
            )
    for k in old:
        if k not in new:
            patch[k] = None
    return patch


def rfc7386_apply(target, patch):
    """RFC 7386 application (the spec's pseudocode, verbatim logic)."""
    if not isinstance(patch, dict):
        return patch
    out = dict(target) if isinstance(target, dict) else {}
    for k, v in patch.items():
        if v is None:
            out.pop(k, None)
        else:
            out[k] = rfc7386_apply(out.get(k), v)
    return out


def _canonical(obj) -> str:
    # sorted keys + compact separators: one byte representation per
    # value, so any engine (or oracle) reproduces it exactly
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def _merge_patch_udf():
    """old-doc JSON (null for the first version) + new-doc JSON →
    canonical RFC-7386 patch JSON. Arrow-batched; the only Python in
    the plan, because recursive JSON diffing has no Column form.
    Built lazily — pandas_udf registration needs an active session."""
    from pyspark.sql.types import StringType

    def batch(old: pd.Series, new: pd.Series) -> pd.Series:
        def one(o, n):
            if n is None:
                return None
            new_doc = json.loads(n)
            if o is None:
                return _canonical(new_doc)  # v1 seeds the full doc
            return _canonical(rfc7386_diff(json.loads(o), new_doc))

        return pd.Series([one(o, n) for o, n in zip(old, new)])

    return F.pandas_udf(batch, StringType())


def json_merge_patches(
    docs: DataFrame,
    doc_col: str = "doc",
    key_cols: tuple[str, ...] = ("id",),
    order_cols: tuple[str, ...] = ("version",),
    ts_col: str | None = None,
) -> DataFrame:
    """The reference's patch-namespaces mode over dynamic JSON docs:
    per key, version-ordered ``{ts, p, v}`` patch rows where ``p`` is
    the RFC-7386 merge patch from the previous doc version (v=1 = the
    full doc, addPatch monstache.go:3139-3149).

    Plan shape: one window (lag + row_number) on the key — a single
    shuffle, identical to the typed history op — then the Arrow-batched
    diff UDF over (prev, cur) string pairs. Nothing touches the driver;
    patch volume ~= doc volume."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    staged = docs.select(
        *key_cols,
        *([F.col(ts_col).alias("ts")] if ts_col else []),
        F.row_number().over(w).cast("long").alias("v"),
        F.lag(doc_col).over(w).alias("_old"),
        F.col(doc_col).alias("_new"),
    )
    return staged.select(
        *key_cols,
        *(["ts"] if ts_col else []),
        "v",
        _merge_patch_udf()(F.col("_old"), F.col("_new")).alias("p"),
    )
