"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line with per-query wall seconds.

Each query is forced through the full plan with a noop-format write
(no driver-side collection, no result pruning).  Every query runs
$SPARK_GRAFT_BENCH_RUNS times (default 2) and reports the BEST wall
time plus the run spread — single-run numbers inside a 125-query
session carry GC/run-order noise that reads as phantom regressions
(adjudicated in round 4: chunk_documents "4.7x" was 2.0 s standalone).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from monstache_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    # BENCH_PROTOCOL.md: SPARK_GRAFT_BENCH_ONLY selects a subset —
    # either a comma-separated name list or @path to a JSON name array
    # (tools/pinned_bench.json is the pinned drift-bracketing subset);
    # SPARK_GRAFT_BENCH_OUT overrides the BENCH.json artifact path so
    # protocol runs don't clobber the sealed full-registry artifact.
    only_spec = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    only: set[str] | None = None
    if only_spec:
        if only_spec.startswith("@"):
            with open(only_spec[1:]) as f:
                only = set(json.load(f))
        else:
            only = {s.strip() for s in only_spec.split(",") if s.strip()}
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    all_queries = entrymod.queries()
    if only is not None:
        unknown = only - set(all_queries)
        if unknown:
            # a typo'd pinned name would silently shrink the subset
            # and fake an improvement in the bracketed totals
            print(
                f"bench: unknown subset name(s): {sorted(unknown)}",
                file=sys.stderr,
            )
            sys.exit(1)
        if not os.environ.get("SPARK_GRAFT_BENCH_OUT"):
            # a subset run must never overwrite the sealed
            # full-registry BENCH.json with partial totals
            print(
                "bench: SPARK_GRAFT_BENCH_ONLY requires SPARK_GRAFT_BENCH_OUT"
                " (refusing to clobber BENCH.json with a partial run)",
                file=sys.stderr,
            )
            sys.exit(1)
    spark = get_spark("monstache_spark_bench")

    # Warm up the JVM/session once (codegen compiler, parquet footer
    # reads, noop committer) so per-query numbers measure the queries,
    # not first-touch session initialization.
    from monstache_spark.sources.testdata import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, sf_dir).schema
    load_table(spark, "events", sf_dir).limit(1000).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    total = 0.0
    for name, fn in all_queries.items():
        if only is not None and name not in only:
            continue
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.time() - t0)
            except Exception as e:  # noqa: BLE001 — a failed query must not kill the bench
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                runs = []
                break
        if runs:
            best = min(runs)
            timings[name] = round(best, 3)
            spreads[name] = round(max(runs) - best, 3)
            total += best
        else:
            timings[name] = float("nan")
            spreads[name] = float("nan")

    payload = {
        "metric": "total_wall_seconds_all_queries",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "runs_per_query": n_runs,
        "sf": sf,
    }
    line = json.dumps(payload, separators=(",", ":"))
    # The driver captures a bounded tail of stdout; r3's single long line
    # overran it (BENCH_r03.json parsed:null). Three-way hedge: persist the
    # full payload to BENCH.json on disk, print the full line first, and end
    # stdout with a short line (slowest queries only) that always fits a
    # bounded tail capture and parses on its own.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.json"
    )
    with open(out_path, "w") as f:
        f.write(line + "\n")
    print(line)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -(kv[1] if kv[1] == kv[1] else 0.0))[:15]
    )
    print(
        json.dumps(
            {
                "metric": "total_wall_seconds_all_queries",
                "value": round(total, 3),
                "unit": "sec",
                "queries": slowest,
                "spread": {k: spreads[k] for k in slowest},
                "queries_truncated_to_slowest": 15,
                "n_queries": len(timings),
                "runs_per_query": n_runs,
                "queries_full": "BENCH.json",
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
