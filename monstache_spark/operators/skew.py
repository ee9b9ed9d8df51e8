"""Skew mitigation: salting for hot keys (plus AQE as the first line).

The reference never meets skew — its "joins" are per-row remote Finds
(monstache.go:1276). At 100 TB a relate join against a collection where
one FK value dominates (the classic hot-tenant key) turns one Spark
partition into the straggler. The engine's layers of defense:

1. `spark.sql.adaptive.skewJoin.enabled` (on in session.py) — AQE
   splits oversized shuffle partitions at runtime. Prefer this.
2. Explicit salting below, for when the skew is known and AQE's
   per-partition split is not enough (e.g. one key > executor memory),
   or for aggregations whose single hot group bottlenecks the final
   combine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SALT_COL = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    left_salt_from: str | None = None,
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted and the
    right side replicated ``n_salts`` times.

    Each left row gets one of ``n_salts`` sub-keys, splitting a hot
    join key across ``n_salts`` reducers; every right row is cloned
    once per salt so all pairs still meet exactly once. Right-side
    replication costs n_salts× its shuffle volume — use for big⋈small
    or big⋈medium with a hot key; for big⋈big prefer AQE skew-join.

    ``left_salt_from``: column whose hash picks the salt
    (deterministic, replay-stable); default uses a uniform random salt
    which is fine for joins (any assignment is correct).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        # unmatched RIGHT rows exist once per salt clone — a right/full
        # outer would emit them n_salts times
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    if left_salt_from is not None:
        salt = F.pmod(F.xxhash64(F.col(left_salt_from)), F.lit(n_salts))
    else:
        salt = F.floor(F.rand(seed=0) * n_salts).cast("bigint")
    l_salted = left.withColumn(SALT_COL, salt)
    r_salted = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    out = l_salted.join(r_salted, [on, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for a skewed group key: partial
    sum/count per (key, salt) — spreading one hot group over
    ``n_salts`` reducers — then a final combine per key.

    Only needed for aggregates whose single final-combine row is the
    bottleneck AND whose map-side partial combine is defeated (e.g.
    high-cardinality input partitions where each task still sees the
    hot key millions of times); plain hash aggregation already
    partial-combines map-side for decomposable aggregates.
    """
    salt = F.floor(F.rand(seed=0) * n_salts).cast("bigint")
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(*keys, SALT_COL)
        .agg(F.sum(value).alias("_psum"), F.count("*").alias("_pcnt"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("n_rows")
    )


def range_bucketed_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    rank_col: str = "rank",
    n_buckets: int = 64,
    quantile_error: float = 0.001,
) -> DataFrame:
    """Dense global ``row_number`` over ``(key DESC, id ASC)`` without
    a single-partition window.

    ``Window.orderBy(...)`` with no partition key moves every row to
    one task — the classic scale-killer Spark itself warns about
    (``WindowExec: No Partition Defined``). This computes the same
    total-order rank in three bounded steps:

    1. ``approxQuantile`` of ``key_col`` picks ``n_buckets-1`` range
       bounds (one driver-side pass; bounds become plan literals, so
       the rest of the plan is deterministic regardless of how the
       sketch merged).
    2. Each row's bucket = number of bounds strictly greater than its
       key (descending buckets; equal keys always share a bucket, so
       the ``id`` tie-break stays inside one window partition).
    3. ``row_number`` within each bucket (parallel window, one hash
       exchange on the bucket id) plus the cumulative count of all
       higher buckets (an O(n_buckets) driver-side literal — the same
       control-plane budget as the drop/bucket lists elsewhere).

    The two extra driver actions (quantiles, bucket counts) each scan
    ``df``; at 100 TB persist/checkpoint ``df`` first so the scan
    happens once. Skew caveat: a single key value held by a huge
    fraction of rows collapses into one bucket — acceptable for
    continuous score keys (Gumbel-perturbed weights, quality scores),
    not for categorical keys.
    """
    bounds = df.stat.approxQuantile(
        key_col, [i / n_buckets for i in range(1, n_buckets)], quantile_error
    )
    bounds = sorted(set(bounds))
    key = F.col(key_col)
    if bounds:
        bucket = F.aggregate(
            F.lit(bounds),
            F.lit(0),
            lambda acc, b: acc + F.when(key < b, F.lit(1)).otherwise(F.lit(0)),
        ).alias("_rb_bucket")
    else:  # empty or single-valued frame: one bucket
        bucket = F.lit(0).alias("_rb_bucket")
    bucketed = df.withColumn("_rb_bucket", bucket)
    counts = {
        r["_rb_bucket"]: r["n"]
        for r in bucketed.groupBy("_rb_bucket").agg(F.count("*").alias("n")).collect()
    }
    offsets, cum = [], 0
    for b in range(len(bounds) + 1):
        offsets.append(cum)
        cum += counts.get(b, 0)
    off = F.element_at(
        F.lit(offsets).cast("array<long>"), F.col("_rb_bucket") + 1
    )
    w = Window.partitionBy("_rb_bucket").orderBy(
        F.col(key_col).desc(), F.col(id_col).asc()
    )
    return (
        bucketed.withColumn(rank_col, (F.row_number().over(w) + off).cast("long"))
        .drop("_rb_bucket")
    )
