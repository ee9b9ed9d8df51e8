"""Version-guarded merge sink (SURVEY.md §2.6 K1-K6).

The reference's sink is an Elasticsearch BulkProcessor doing
upsert-by-id with EXTERNAL versions so at-least-once replays and
cross-key disorder are harmless (monstache.go:3160-3245, version
monstache.go:4053-4063, 409-conflict-ignore monstache.go:566-571).

Spark-first: the sink is a keyed state TABLE (queryable — required for
J3 delete-lookups and K3 delete protection), maintained by an
idempotent MERGE per micro-batch:

    MERGE INTO state USING batch ON (ns, id)
      WHEN MATCHED AND src.version >= tgt.version AND src.op='d' THEN DELETE
      WHEN MATCHED AND src.version >= tgt.version THEN UPDATE
      WHEN NOT MATCHED AND src.op != 'd' THEN INSERT

Without Delta/Iceberg jars in this image, the MERGE is emulated with
the standard anti-join + union rewrite over parquet, atomically swapped
via directory versioning. On a real lakehouse this maps 1:1 onto
``MERGE INTO`` (and the version guard rides along unchanged).

Drop propagation (K6, doDrop monstache.go:3056-3075): ``drop``/
``dropDatabase`` ops delete all state rows of the matching
namespace(s) — a metadata-only predicate delete here, a partition drop
on a partitioned state table at scale.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monstache_spark.envelope import OP_DELETE, OP_DROP, OP_DROP_DB
from monstache_spark.operators.filters import ns_database
from monstache_spark.operators.materialize import last_state


def protected_deletes(state: DataFrame, deletes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """K3 delete protection (doDelete monstache.go:4065-4147): when a
    delete must be located by id across routed indexes, the reference
    searches the delete-index-pattern and REFUSES the delete unless
    exactly one document matches (monstache.go:4113-4139).

    Set-level twin: join the tombstones against the state table by id
    only; ids matching exactly one state row are applied, others
    (0 or >1 matches) are refused. Returns (applied, refused)."""
    matches = (
        deletes.select(F.col("id"), F.col("version").alias("v_del"))
        .join(state.select("ns", "id"), "id", "left")
        .groupBy("id", "v_del")
        .agg(F.count("ns").alias("n_hits"), F.min("ns").alias("target_ns"))
    )
    applied = matches.filter(F.col("n_hits") == 1).select(
        F.col("target_ns").alias("ns"), "id", F.col("v_del").alias("version")
    )
    refused = matches.filter(F.col("n_hits") != 1).select("id", F.col("n_hits"))
    return applied, refused


class StateTable:
    """Parquet-backed keyed state table with version-guarded merges.

    Directory-versioned commits: each merge writes ``v{n+1}`` then
    flips a CURRENT pointer file — readers never see partial writes
    (the poor man's transaction log; Delta/Iceberg replace this
    wholesale at scale).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _current_file(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _current_version(self) -> int:
        try:
            with open(self._current_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def read(self) -> DataFrame | None:
        v = self._current_version()
        if v == 0:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def _commit(self, df: DataFrame) -> None:
        v = self._current_version()
        new_dir = os.path.join(self.path, f"v{v + 1}")
        df.write.mode("overwrite").parquet(new_dir)
        with open(self._current_file(), "w") as f:
            f.write(str(v + 1))
        old_dir = os.path.join(self.path, f"v{v}")
        if v and os.path.isdir(old_dir):
            shutil.rmtree(old_dir, ignore_errors=True)

    def merge_batch(self, ops: DataFrame) -> None:
        """Apply one micro-batch of envelope ops."""
        # K6 drop propagation first (the reference flushes bulk then drops)
        drops = ops.filter(F.col("op").isin(OP_DROP, OP_DROP_DB))
        data_ops = ops.filter(~F.col("op").isin(OP_DROP, OP_DROP_DB))
        compacted = last_state(data_ops.filter(F.col("op") != OP_DELETE)).withColumn(
            "_tomb", F.lit(False)
        )
        # deletes must survive compaction as tombstones to beat older upserts
        tombs = (
            data_ops.filter(F.col("op") == OP_DELETE)
            .groupBy("ns", "id")
            .agg(F.max("version").alias("version"))
            .withColumn("_tomb", F.lit(True))
        )
        current = self.read()
        if current is None:
            merged = self._apply(None, compacted, tombs)
        else:
            merged = self._apply(current, compacted, tombs)

        # drop ops are rare control-plane events; collecting the distinct
        # (op, ns) list to the driver is O(#drops), not O(data)
        for r in drops.select("op", "ns").distinct().collect():
            if r["op"] == OP_DROP_DB:
                merged = merged.filter(ns_database(F.col("ns")) != r["ns"].split(".", 1)[0])
            else:
                merged = merged.filter(F.col("ns") != r["ns"])
        self._commit(merged)

    def _apply(self, current: DataFrame | None, upserts: DataFrame, tombs: DataFrame) -> DataFrame:
        """anti-join + union MERGE emulation with the version guard."""
        up = upserts.drop("_tomb")
        if current is None:
            base = up
        else:
            # keep current rows that are NOT overridden by a >= version upsert
            newer = up.select("ns", "id", F.col("version").alias("v_new"))
            keep = (
                current.join(newer, ["ns", "id"], "left")
                .filter(F.col("v_new").isNull() | (F.col("version") > F.col("v_new")))
                .drop("v_new")
            )
            # upserts that actually win (not older than current row)
            cur_v = current.select("ns", "id", F.col("version").alias("v_cur"))
            winning = (
                up.join(cur_v, ["ns", "id"], "left")
                .filter(F.col("v_cur").isNull() | (F.col("version") >= F.col("v_cur")))
                .drop("v_cur")
            )
            base = keep.unionByName(winning)
        # apply tombstones: delete wins when its version >= row version
        t = tombs.select("ns", "id", F.col("version").alias("v_del"))
        return (
            base.join(t, ["ns", "id"], "left")
            .filter(F.col("v_del").isNull() | (F.col("version") > F.col("v_del")))
            .drop("v_del")
        )
