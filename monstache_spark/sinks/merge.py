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
``dropDatabase`` ops delete state rows of the matching namespace(s)
whose version is <= the drop's — version-aware, so a micro-batch
``[drop ns v=25, insert ns/id v=30]`` keeps the post-drop re-create
regardless of batch boundaries (the same convention as
``operators.materialize.apply_drops``). A metadata-only predicate
delete here, a partition drop on a partitioned state table at scale.

Delete tombstones PERSIST in the committed state (``_tomb=true`` rows,
hidden from ``read()``): a stale insert arriving in a LATER batch
(version < delete version) stays dead — the analogue of Elasticsearch
external versioning + ``index.gc_deletes`` that makes the reference's
at-least-once replay safe (monstache.go:4077-4080). Bound their growth
with ``tombstone_retention`` (version units) or an explicit
``prune_tombstones()``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monstache_spark.envelope import OP_DELETE, OP_DROP, OP_DROP_DB
from monstache_spark.operators.filters import ns_database
from monstache_spark.operators.materialize import last_state

# marker column for persisted delete tombstones (hidden from read())
TOMB_COL = "_tomb"


def _tomb_rows(tombs: DataFrame, like: DataFrame) -> DataFrame:
    """Expand (ns, id, version) tombstones to ``like``'s schema with
    typed-null payload columns and ``_tomb=true``."""
    cols = []
    for f in like.schema.fields:
        if f.name in ("ns", "id", "version"):
            cols.append(F.col(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return tombs.select(*cols).withColumn(TOMB_COL, F.lit(True))


def _stage_batch(upserts: DataFrame, tombs: DataFrame) -> DataFrame:
    """Compact one batch to a single row per key with the WITHIN-batch
    tie rules applied (delete beats upsert at the same version):
    surviving upserts carry ``_tomb = False``, surviving deletes become
    tombstone rows. Shared by every state backend — the cross-batch
    guard differs per backend (anti-join here, MERGE predicate in the
    Delta variant), the batch staging must not."""
    tv = tombs.select("ns", "id", F.col("version").alias("v_del"))
    up_live = (
        upserts.join(tv, ["ns", "id"], "left")
        .filter(F.col("v_del").isNull() | (F.col("version") > F.col("v_del")))
        .drop("v_del")
        .withColumn(TOMB_COL, F.lit(False))
    )
    uv = upserts.groupBy("ns", "id").agg(F.max("version").alias("v_up"))
    tomb_live = (
        tombs.join(uv, ["ns", "id"], "left")
        .filter(F.col("v_up").isNull() | (F.col("version") >= F.col("v_up")))
        .drop("v_up")
    )
    return up_live.unionByName(_tomb_rows(tomb_live, upserts))


def _merge_apply(
    current: DataFrame | None, upserts: DataFrame, tombs: DataFrame
) -> DataFrame:
    """anti-join + union MERGE emulation with the version guard.

    Tie convention (documented, test-pinned, batch-boundary-invariant):
    a delete beats an upsert at the same version, whether they meet
    inside one batch OR across batches — so ``[delete v, insert v]``
    stays dead no matter where the batch boundary falls. This matches
    ES external versioning, where an index at version <= a stored
    tombstone's version is rejected (monstache.go:4053-4063,
    gc_deletes monstache.go:4077-4080). Between two non-delete rows
    the batch row beats the stored row at the same version (ES accepts
    version >= stored for upserts). Tombstones persist into the
    committed state so stale inserts in LATER batches stay dead."""
    new = _stage_batch(upserts, tombs)
    if current is None:
        return new
    if TOMB_COL not in current.columns:  # table written before tombstone support
        current = current.withColumn(TOMB_COL, F.lit(False))
    # At a version tie the stored row wins iff it is a tombstone (delete
    # beats equal-version upsert across batches too); `keep` and `win`
    # are exact complements, so every matched key lands exactly once.
    nv = new.select("ns", "id", F.col("version").alias("v_new"))
    keep = (
        current.join(nv, ["ns", "id"], "left")
        .filter(
            F.col("v_new").isNull()
            | (F.col("version") > F.col("v_new"))
            | ((F.col("version") == F.col("v_new")) & F.col(TOMB_COL))
        )
        .drop("v_new")
    )
    cv = current.select(
        "ns", "id", F.col("version").alias("v_cur"), F.col(TOMB_COL).alias("_cur_tomb")
    )
    win = (
        new.join(cv, ["ns", "id"], "left")
        .filter(
            F.col("v_cur").isNull()
            | (F.col("version") > F.col("v_cur"))
            | ((F.col("version") == F.col("v_cur")) & ~F.col("_cur_tomb"))
        )
        .drop("v_cur", "_cur_tomb")
    )
    return keep.unionByName(win)


def _erase_dropped(state: DataFrame, drop_rows: list[tuple]) -> DataFrame:
    """Version-aware K6 erase over materialized rows: a drop at version
    v removes rows of its namespace(s) with version <= v — only
    strictly-newer post-drop re-creates survive, regardless of
    micro-batch boundaries (same convention as
    operators.materialize.apply_drops; the reference deletes the whole
    index on drop, and a tying op can only precede the drop in the
    oplog)."""
    for op, ns, v in drop_rows:
        if op == OP_DROP_DB:
            hit = ns_database(F.col("ns")) == ns.split(".", 1)[0]
        else:
            hit = F.col("ns") == ns
        state = state.filter(~(hit & (F.col("version") <= F.lit(v))))
    return state


def _prune_old_tombstones(
    state: DataFrame, batch_ops: DataFrame, retention: int
) -> DataFrame:
    """Retention sweep: drop tombstones more than ``retention`` version
    units behind the batch high-water mark. The HWM rides along as a
    broadcast cross join so the whole merge stays one lazy plan."""
    hwm = batch_ops.agg(F.max("version").alias("_hwm"))
    return (
        state.crossJoin(F.broadcast(hwm))
        .filter(
            ~(
                F.col(TOMB_COL)
                & F.col("_hwm").isNotNull()
                & (F.col("version") < F.col("_hwm") - F.lit(retention))
            )
        )
        .drop("_hwm")
    )


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

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        tombstone_retention: int | None = None,
        payload_cols: tuple[str, ...] | None = None,
    ):
        self.spark = spark
        self.path = path
        # keep delete tombstones only while `batch_max_version - version
        # <= retention` (version units — BSON-ts-like int64s here). None
        # = keep forever; prune explicitly via prune_tombstones().
        self.tombstone_retention = tombstone_retention
        # payload carried per key into the materialized row; None = the
        # testdata envelope default (operators.materialize._STATE_COLS).
        # Dynamic-doc pipelines pass e.g. ("op","ts","ts_ord","doc") —
        # note a STRING payload (doc) puts a string in the max_by
        # aggregation buffer, degrading that compaction to
        # SortAggregate; inherent when the payload is the document
        # itself (the reference ships the doc per op too).
        self.payload_cols = payload_cols
        os.makedirs(path, exist_ok=True)

    def _current_file(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _current_version(self) -> int:
        try:
            with open(self._current_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def read(self, include_tombstones: bool = False) -> DataFrame | None:
        v = self._current_version()
        if v == 0:
            return None
        df = self.spark.read.parquet(os.path.join(self.path, f"v{v}"))
        if TOMB_COL not in df.columns:  # table written before tombstone support
            return df
        if include_tombstones:
            return df
        return df.filter(~F.col(TOMB_COL)).drop(TOMB_COL)

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
        # drop ops are rare control-plane events; collecting the distinct
        # (op, ns, max version) list to the driver is O(#drops), not O(data)
        drops = ops.filter(F.col("op").isin(OP_DROP, OP_DROP_DB))
        data_ops = ops.filter(~F.col("op").isin(OP_DROP, OP_DROP_DB))
        drop_rows = [
            tuple(r)
            for r in drops.groupBy("op", "ns").agg(F.max("version").alias("v")).collect()
        ]
        if self.payload_cols is None:
            compacted = last_state(data_ops.filter(F.col("op") != OP_DELETE))
        else:
            compacted = last_state(
                data_ops.filter(F.col("op") != OP_DELETE), payload_cols=self.payload_cols
            )
        # deletes must survive compaction as tombstones to beat older upserts
        tombs = (
            data_ops.filter(F.col("op") == OP_DELETE)
            .groupBy("ns", "id")
            .agg(F.max("version").alias("version"))
        )
        merged = _merge_apply(self.read(include_tombstones=True), compacted, tombs)
        merged = _erase_dropped(merged, drop_rows)
        if self.tombstone_retention is not None:
            merged = _prune_old_tombstones(merged, data_ops, self.tombstone_retention)
        self._commit(merged)

    def prune_tombstones(self, before_version: int) -> None:
        """Drop persisted tombstones older than ``before_version`` —
        the explicit gc_deletes sweep (safe once no source can replay
        ops older than that version)."""
        cur = self.read(include_tombstones=True)
        if cur is None or TOMB_COL not in cur.columns:
            return  # empty, or written before tombstone support: nothing to prune
        self._commit(
            cur.filter(~(F.col(TOMB_COL) & (F.col("version") < F.lit(before_version))))
        )
