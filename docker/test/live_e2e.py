"""Live change-stream → Elasticsearch sync job (off-sandbox only).

The cluster-deployment composition the sandbox can't dial: a real
``format("mongodb")`` change-stream read bound by
``connectors.mongo_stream_options``, events re-serialized into the SAME
raw extended-JSON line shape the recorded fixtures use and pushed
through the SAME tested path (``parse_raw_change_events`` →
``change_events_to_envelope`` → ``streaming.pipeline.transform``), then
written to Elasticsearch with ``connectors.es_sink_options`` /
``es_delete_options`` (versioned upserts + versioned deletes, the
reference's bulk contract, monstache.go:3160-3245, 4065-4090).

Run via docker/test/run-tests.sh — spark-submit pulls the
mongo-spark-connector and elasticsearch-spark packages (see
docker-compose.test.yml).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/app")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from monstache_spark.config import load_config
from monstache_spark.connectors import (
    change_events_to_envelope,
    es_delete_options,
    es_sink_options,
    mongo_stream_options,
    parse_raw_change_events,
)
from monstache_spark.streaming.pipeline import PipelineConfig, transform

# Declaring every change-event field as StringType makes the mongo
# connector emit extended JSON per field — which re-assembles into the
# exact line shape parse_raw_change_events is tested against.
RAW_EVENT_SCHEMA = StructType(
    [
        StructField("_id", StringType()),
        StructField("operationType", StringType()),
        StructField("clusterTime", StringType()),
        StructField("ns", StringType()),
        StructField("documentKey", StringType()),
        StructField("fullDocument", StringType()),
        StructField("updateDescription", StringType()),
    ]
)


def _reassemble_raw(df):
    """Connector fields (each an ext-JSON string) → one raw event line,
    so the live path and the recorded-fixture path share one parser."""

    def field(name: str, quoted: bool = False):
        v = F.col(name)
        if quoted:
            v = F.concat(F.lit('"'), v, F.lit('"'))
        return F.coalesce(v, F.lit("null"))

    return df.select(
        F.concat(
            F.lit('{"_id":'), field("_id"),
            F.lit(',"operationType":'), field("operationType", quoted=True),
            F.lit(',"clusterTime":'), field("clusterTime"),
            F.lit(',"ns":'), field("ns"),
            F.lit(',"documentKey":'), field("documentKey"),
            F.lit(',"fullDocument":'), field("fullDocument"),
            F.lit(',"updateDescription":'), field("updateDescription"),
            F.lit("}"),
        ).alias("value")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default="/tmp/monstache_spark_e2e/checkpoint")
    args = ap.parse_args()
    cfg = load_config(args.config)

    spark = (
        SparkSession.builder.appName("monstache_spark_live_e2e")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    streams = []
    for opts in mongo_stream_options(cfg):
        reader = spark.readStream.format("mongodb").schema(RAW_EVENT_SCHEMA)
        for k, v in opts.items():
            reader = reader.option(k, v)
        streams.append(reader.load())
    src = streams[0]
    for s in streams[1:]:
        src = src.unionByName(s)

    env = change_events_to_envelope(parse_raw_change_events(_reassemble_raw(src)))
    ops = transform(env, PipelineConfig())

    up_opts = es_sink_options(cfg)
    del_opts = es_delete_options(cfg)

    def sink(batch_df, _epoch: int) -> None:
        # index name = lowercased namespace (defaultIndexMapping,
        # monstache.go:795-800); doc body is the raw JSON (es.input.json)
        batch = batch_df.withColumn("_index", F.lower(F.col("ns"))).cache()
        try:
            upserts = batch.filter(F.col("op").isin("i", "u")).select(
                "_index", "id", "version", F.col("doc")
            )
            (
                upserts.write.format("es")
                .options(**{**up_opts, "es.input.json": "false"})
                .mode("append")
                .save("{_index}")
            )
            deletes = batch.filter(F.col("op") == "d").select("_index", "id", "version")
            if deletes.take(1):
                (
                    deletes.write.format("es")
                    .options(**del_opts)
                    .mode("append")
                    .save("{_index}")
                )
        finally:
            batch.unpersist()

    q = (
        ops.writeStream.foreachBatch(sink)
        .option("checkpointLocation", args.checkpoint)
        .trigger(processingTime=f"{cfg.pipeline.trigger_seconds} seconds")
        .start()
    )
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
