"""Version-guarded last-state materialization (the sink semantics of
SURVEY.md §2.6 K1-K5 expressed as a set operation).

The reference never materializes state in-process — Elasticsearch does
it, one bulk request per op, with external versions so stale replays
lose (tsVersion monstache.go:4053-4063, conflict-ignore
monstache.go:566-571, delete versioning monstache.go:4077-4080). The
set-level equivalent, given a batch/window of ops, is: per (ns, id),
keep the op with the greatest version; if that op is a delete the key
is absent from the materialized table.

Scale notes: ``groupBy(ns, id)`` + ``max_by`` aggregates map-side
(partial aggregation) before the single shuffle on the key — strictly
cheaper than a window/row_number formulation, which must shuffle ALL
rows then sort each partition. At 100 TB the reduction happens before
the exchange, so shuffle volume is ~|distinct keys|, not |ops|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monstache_spark.envelope import OP_DELETE

# Payload columns carried into the materialized row.
_STATE_COLS = ("op", "ts", "ts_ord", "value", "k")


_OP_CODE = {"i": 0, "u": 1, "d": 2, "drop": 3, "dropDatabase": 4}


def last_state(ops: DataFrame, payload_cols: tuple[str, ...] = _STATE_COLS) -> DataFrame:
    """Compact an op batch to final per-key state (deletes applied).

    ``max_by(col, version)`` is deterministic here because the envelope
    guarantees version uniqueness per event (envelope.py).

    The ``op`` payload is aggregated as a byte code, not a string:
    HashAggregate requires every aggregation-buffer field to be a
    mutable (fixed-width) type — one string in the buffer and the whole
    aggregate silently degrades to SortAggregate, which SORTS the full
    stream map-side before the partial agg. With all-primitive buffers
    this is a real hash aggregate: map-side partial combine, one
    exchange of ~|distinct keys|, no sort anywhere. (Grouping keys may
    be strings either way — only the buffer must be fixed-width.)"""
    op_code = F.lit(None).cast("tinyint")
    for name, code in reversed(_OP_CODE.items()):
        op_code = F.when(F.col("op") == name, F.lit(code).cast("tinyint")).otherwise(op_code)

    aggs = []
    for c in payload_cols:
        src = op_code if c == "op" else F.col(c)
        aggs.append(F.max_by(src, F.col("version")).alias(f"last_{c}"))
    aggs.append(F.max("version").alias("version"))
    compacted = ops.groupBy("ns", "id").agg(*aggs)
    if "op" in payload_cols:
        compacted = compacted.filter(F.col("last_op") != _OP_CODE[OP_DELETE]).drop("last_op")
    return compacted


def apply_drops(
    ops: DataFrame,
    drops: DataFrame | None = None,
    databases: bool = True,
    collections: bool = True,
) -> DataFrame:
    """K6 drop propagation as a set operation (doDrop
    monstache.go:3056-3075): a ``drop`` op erases every event of its
    namespace whose version is <= the drop's version — only STRICTLY
    NEWER ops survive. The reference deletes the whole target index on
    drop, and under its version scheme (tsVersion monstache.go:
    4053-4063) an op tying the drop can only precede it in the oplog,
    so ties are erased. ``dropDatabase`` erases every namespace of its
    db (ns carries just the db name). Returns the surviving non-drop
    ops.

    ``databases`` / ``collections`` mirror the reference's independent
    ``dropped-databases`` / ``dropped-collections`` toggles
    (configOptions monstache.go:318-426) — each drop type can be
    disabled separately.

    The drop list is control-plane-tiny, so both joins broadcast — no
    shuffle of the data stream at any scale. Pass ``drops`` explicitly
    when the caller already has the control-plane ops separated:
    deriving them from ``ops`` costs two extra full scans of the
    stream (one per broadcast build side)."""
    from monstache_spark.envelope import OP_DROP, OP_DROP_DB
    from monstache_spark.operators.filters import ns_database

    if drops is None:
        drops = ops.filter(F.col("op").isin(OP_DROP, OP_DROP_DB))
    data = ops.filter(~F.col("op").isin(OP_DROP, OP_DROP_DB))
    out = data
    if collections:
        coll = (
            drops.filter(F.col("op") == OP_DROP)
            .groupBy(F.col("ns").alias("_drop_ns"))
            .agg(F.max("version").alias("_drop_v"))
        )
        out = (
            out.join(F.broadcast(coll), out["ns"] == coll["_drop_ns"], "left")
            .filter(F.col("_drop_v").isNull() | (F.col("version") > F.col("_drop_v")))
            .drop("_drop_ns", "_drop_v")
        )
    if databases:
        db = (
            drops.filter(F.col("op") == OP_DROP_DB)
            .groupBy(ns_database(F.col("ns")).alias("_drop_db"))
            .agg(F.max("version").alias("_dbdrop_v"))
        )
        out = (
            out.join(F.broadcast(db), ns_database(out["ns"]) == db["_drop_db"], "left")
            .filter(F.col("_dbdrop_v").isNull() | (F.col("version") > F.col("_dbdrop_v")))
            .drop("_drop_db", "_dbdrop_v")
        )
    return out


def merge_upsert(state: DataFrame, batch: DataFrame) -> DataFrame:
    """MERGE a compacted op batch into an existing state table
    (emulated Delta MERGE per the reference's upsert semantics K1/K2 +
    delete K3, guarded WHEN MATCHED AND src.version >= tgt.version).

    Pure DataFrame formulation: union old state with new batch rows and
    re-run the version-guarded compaction. Keys only present in
    ``state`` pass through untouched; at scale this is the
    anti-join + union + window "CDC/SCD2 emulation" — with Delta/Iceberg
    on the classpath it becomes a real MERGE INTO.
    """
    as_ops = batch
    old_as_ops = state.select(
        F.lit("u").alias("op"),
        "ns",
        "id",
        F.col("last_ts").alias("ts"),
        F.col("last_ts_ord").alias("ts_ord"),
        F.lit("state").alias("source"),
        F.col("last_value").alias("value"),
        F.col("last_k").alias("k"),
        "version",
    )
    combined = old_as_ops.unionByName(as_ops.select(*old_as_ops.columns))
    return last_state(combined)
