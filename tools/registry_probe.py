"""Incremental-dedup registry scale probe: admission cost vs history.

Claim under test (FingerprintRegistry n_buckets > 0): with the
digest-prefix-bucketed layout, a batch's membership probe scans only
the batch's buckets — ``min(batch, n_buckets)/n_buckets`` of history —
so admission cost is governed by batch size while batches are smaller
than the bucket count. The flat layout re-scans ALL of history every
admission.

Round 10 adds the SECOND pruning level: compact() writes each bucket
fp-SORTED and known() pushes the batch's fingerprints as an In
predicate, so parquet row-group stats skip INSIDE touched buckets —
``history_rows_decoded`` (the scan leaf's numOutputRows after
row-group skipping) must drop BELOW the bucket fraction.

Method: seed both layouts (untimed bulk admits of synthetic md5
fingerprints) to three history sizes, compacting the bucketed layout
(64 KiB row groups — the skip granularity); at each size record
(a) the HISTORY ROWS the probe's pruned scan actually DECODES (the
executed scan leaf's numOutputRows — the deterministic scan-volume
evidence, post row-group skipping), (b) the bucket-fraction rows the
round-9 layout would have decoded, and (c) wall time of a full
small-batch admission (warmed; on local[32] constant job/commit
overhead dominates seconds, which is why (a) is the headline number).

    python tools/registry_probe.py [batch_docs=32] [seed_sizes=1000000,4000000,16000000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from monstache_spark.session import get_spark


def scan_decoded_rows(df) -> int:
    """Execute ``df`` and sum the scan leaves' numOutputRows — the
    rows the parquet reader actually DECODED after partition pruning
    and row-group skipping (pushed-filter row-group elimination
    happens below this metric; the post-scan Filter above it does
    not).  Executes the frame's OWN physical plan JVM-side
    (``executedPlan().execute().count()`` — a noop write or
    df.count() would plan a separate execution and leave these
    metrics untouched, and collect() would pull the whole unfiltered
    flat-registry history to the driver), so no row ever crosses into
    Python."""
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return int(total)


def run(batch_docs: int, seed_sizes: list[int]) -> dict:
    from monstache_spark.functions.text import fingerprint
    from monstache_spark.operators.dedup import FingerprintRegistry, incremental_dedup_batch

    spark = get_spark("registry_probe")
    base = "/tmp/monstache_spark_registry_probe"
    shutil.rmtree(base, ignore_errors=True)
    regs = {
        "flat": FingerprintRegistry(spark, f"{base}/flat"),
        "bucketed": FingerprintRegistry(spark, f"{base}/bucketed", n_buckets=1024),
    }
    probe_rows = [(i, f"probe doc {i} " + "y" * 64) for i in range(batch_docs)]
    # warm the session (codegen, committers) before any timing
    spark.range(10_000).write.mode("overwrite").format("noop").save()

    scan: dict[str, list[dict]] = {k: [] for k in regs}
    secs: dict[str, list[float]] = {k: [] for k in regs}
    seeded = 0
    for target in seed_sizes:
        n_new = target - seeded
        seed = spark.range(seeded, seeded + n_new).select(
            F.md5(F.concat(F.lit("seed:"), F.col("id").cast("string"))).alias("fp"),
            F.col("id").alias("doc_id"),
        )
        for reg in regs.values():
            reg.admit(seed)
        # fp-sorted compaction (small row groups = the skip grain)
        regs["bucketed"].compact(
            write_options={"parquet.block.size": str(64 * 1024)}
        )
        seeded = target
        batch_df = spark.createDataFrame(probe_rows, "doc_id long, text string")
        batch_fps = batch_df.select(fingerprint(F.col("text")).alias("fp"))
        for label, reg in regs.items():
            pruned = reg.known(touching=batch_fps)
            n_buckets = reg.n_buckets or 1
            touched = (
                batch_fps.select(reg._bucket(F.col("fp"))).distinct().count()
                if reg.n_buckets
                else 1
            )
            scan[label].append(
                {
                    "history": target,
                    "history_rows_decoded": scan_decoded_rows(pruned),
                    "bucket_fraction_rows": target * touched // n_buckets,
                }
            )
            t0 = time.time()
            incremental_dedup_batch(reg, batch_df).write.mode("overwrite").format(
                "noop"
            ).save()
            secs[label].append(round(time.time() - t0, 3))

    # batch-size axis at the final history: the bucketed scan volume
    # must track BATCH size (touched buckets), while flat always scans
    # everything
    batch_axis = []
    for b in (batch_docs, batch_docs * 4, batch_docs * 16):
        rows_b = [(i, f"axis doc {i} " + "z" * 64) for i in range(b)]
        fps_b = spark.createDataFrame(rows_b, "doc_id long, text string").select(
            fingerprint(F.col("text")).alias("fp")
        )
        entry = {"batch_docs": b}
        for label, reg in regs.items():
            entry[f"{label}_history_rows_decoded"] = scan_decoded_rows(
                reg.known(touching=fps_b)
            )
        batch_axis.append(entry)

    growth = {
        k: round(
            v[-1]["history_rows_decoded"] / max(v[0]["history_rows_decoded"], 1), 2
        )
        for k, v in scan.items()
    }
    return {
        "history_axis": scan,
        "history_growth_last_over_first": growth,
        "batch_axis_at_final_history": batch_axis,
        "admission_seconds": secs,
        "history_sizes": seed_sizes,
        "batch_docs": batch_docs,
        "n_buckets": 1024,
    }


if __name__ == "__main__":
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sizes = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1_000_000, 4_000_000, 16_000_000]
    )
    print(json.dumps(run(batch_docs, sizes)))
