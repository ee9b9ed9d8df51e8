"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only cross-batch state is the external-version guard
and the bulk counters it logs per interval (doIndexStats,
monstache.go:3510-3527). Spark's arbitrary-stateful surface
generalizes that: per-key state maintained across micro-batches with
Arrow-batched pandas processing.

``running_op_counts`` is the engine's stats surface as a stateful
operator: per-namespace insert/update/delete totals that survive
across micro-batches (state lives in the state store, checkpointed
with the query). At 100 TB of stream the state is tiny — one row per
namespace — but the same shape scales to per-key session state: state
is hash-partitioned by the grouping key and each partition's pandas
function sees only its keys.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "ns string, n_i long, n_u long, n_d long, n_total long"
STATE_SCHEMA = "n_i long, n_u long, n_d long"


def _update_counts(key, pdfs, state):
    import pandas as pd

    n_i, n_u, n_d = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        counts = pdf["op"].value_counts()
        n_i += int(counts.get("i", 0))
        n_u += int(counts.get("u", 0))
        n_d += int(counts.get("d", 0))
    state.update((n_i, n_u, n_d))
    yield pd.DataFrame(
        {
            "ns": [key[0]],
            "n_i": [n_i],
            "n_u": [n_u],
            "n_d": [n_d],
            "n_total": [n_i + n_u + n_d],
        }
    )


def running_op_counts(ops_stream: DataFrame) -> DataFrame:
    """Per-namespace running op counters with explicit keyed state.
    Emits the updated totals for every namespace seen in a batch."""
    return ops_stream.groupBy("ns").applyInPandasWithState(
        _update_counts,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_op_counts_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str | None = None,
    out_dir: str | None = None,
    state_store: str | None = None,
) -> DataFrame:
    """Drive the stateful counter over the events file as a stream
    (availableNow); returns final totals per namespace (last emitted
    row per key, in case the source split into multiple batches).
    With ``checkpoint_dir``, a later call resumes: counters continue
    from the checkpointed state store over only the new files."""
    from pyspark.sql import functions as F

    from monstache_spark.envelope import events_to_envelope
    from monstache_spark.sources.testdata import ensure_session_confs, normalize_nanos

    ensure_session_confs(spark)
    schema = spark.read.parquet(events_path).schema
    base_dir, fname = os.path.split(events_path)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", fname)
        .parquet(base_dir)
    )
    ops = events_to_envelope(normalize_nanos(stream))
    out = running_op_counts(ops)
    # foreachBatch parquet sink: update-mode re-emissions land as
    # appended rows written executor-side (no driver-side collect, the
    # memory sink's hazard); the state partitioning inside is sized to
    # the key cardinality by the runner
    from monstache_spark.streaming.windows import run_stream_to_parquet

    emitted = run_stream_to_parquet(
        out, spark, "update", out_dir, checkpoint_dir, state_store
    )
    # totals only grow; max per key == last update
    return emitted.groupBy("ns").agg(
        F.max("n_i").alias("n_i"),
        F.max("n_u").alias("n_u"),
        F.max("n_d").alias("n_d"),
        F.max("n_total").alias("n_total"),
    )
