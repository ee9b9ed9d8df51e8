"""Core-scaling probe over REGISTRY queries (VERDICT r14 task #6):
blow the sf corpus up N x deterministically, then run a named query
list through bench.py at two core counts and report the per-query
low-core/high-core time ratios.

    python tools/core_scale_probe.py [--mult N] [--runs K]
                                     [--cpus LO,HI] [--sf-dir DIR]
                                     [--out PREFIX] [name ...]

Why: the driver's scaling block (8 vs 32 cores at sf0.1) reads ~1 for
every query because fixed per-query session/planning constants
dominate 600 k-row data work — it cannot distinguish a serial operator
from a parallel one at that scale.  At N x the data work dominates and
the ratio becomes informative: a parallel operator reads toward
(HI/LO); a serial one stays ~1.

Corpus construction is deterministic (no rand(), stable ids):

* documents: ids offset 1_000_000 per copy and every word tagged with
  its copy number — copies are textually DISJOINT, so dedup/containment
  queries keep their within-copy structure instead of measuring a
  quadratic clone-pair artifact no real corpus has (the
  tools/scale_probe.py rationale, applied to the shared corpus).
* events: event ids offset 100_000_000 and user ids offset 10_000 per
  copy — growth adds keys instead of densifying every per-key window.
* embeddings: ids offset 10_000_000 and components deterministically
  perturbed per copy — exact vector clones would share every LSH/PQ
  bucket bit and degenerate ANN probes into clone-pair joins.
* remaining tables (TPC-H side) copied as-is: the probe's query list
  targets the corpus-shaped operators.

The blown-up dir is laid out exactly like an sf dir, so bench.py runs
against it unchanged (same noop-sink methodology); each core count is
a SUBPROCESS with its own $SPARK_GRAFT_CPUS, exactly how the driver
varies cores.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "ann_index_cdc",
    "quality_decile_map",
    "stream_eql_alerts",
    "incremental_near_dup",
    "near_dup_clusters",
    "stream_stream_join",
    "containment_pairs",
    "knn_join_pq",
    "training_pipeline",
    "dedup_corpus_pipeline",
]


def build_corpus(sf_dir: str, mult: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from monstache_spark.session import get_spark
    from monstache_spark.sources.testdata import TABLES

    spark = get_spark("core-scale-probe-build")
    copies = spark.range(mult).select(F.col("id").alias("_copy"))

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    for name in TABLES:
        src = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "documents":
            out = (
                src.crossJoin(copies)
                .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * 1_000_000)
                .withColumn(
                    "text",
                    F.expr(
                        "regexp_replace(text, '(\\\\S+)',"
                        " concat('$1#', CAST(_copy AS STRING)))"
                    ),
                )
                .drop("_copy")
            )
        elif name == "events":
            out = (
                src.crossJoin(copies)
                .withColumn(
                    "event_id", F.col("event_id") + F.col("_copy") * 100_000_000
                )
                .withColumn("user_id", F.col("user_id") + F.col("_copy") * 10_000)
                .drop("_copy")
            )
        elif name == "embeddings":
            out = (
                src.crossJoin(copies)
                .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * 10_000_000)
                .withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (
                            x
                            + ((F.col("_copy") * 31 + j) % 7 - 3).cast("float")
                            * F.lit(0.05)
                        ).cast("float"),
                    ),
                )
                .drop("_copy")
            )
        else:
            out = src
        write(out, name)
    spark.stop()


def run_bench(corpus_dir: str, names: list[str], cpus: int, runs: int, out: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR=corpus_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_ONLY=",".join(names),
        SPARK_GRAFT_BENCH_RUNS=str(runs),
        SPARK_GRAFT_BENCH_OUT=out,
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"bench at {cpus} cpus failed (exit {r.returncode})")
    with open(out) as f:
        return json.load(f)


def main() -> int:
    args = sys.argv[1:]
    mult, runs, sf_dir, out_prefix = 10, 2, "/root/testdata/sf0.1", None
    cpus_lo, cpus_hi = 8, 32
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--mult":
            mult = int(args[i + 1]); i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--cpus":
            cpus_lo, cpus_hi = (int(x) for x in args[i + 1].split(",")); i += 2
        elif a == "--sf-dir":
            sf_dir = args[i + 1]; i += 2
        elif a == "--out":
            out_prefix = args[i + 1]; i += 2
        else:
            names.append(a); i += 1
    if not names:
        names = list(DEFAULT_QUERIES)

    base = tempfile.mkdtemp(prefix=f"core_scale_{mult}x_")
    corpus = os.path.join(base, "corpus")
    os.makedirs(corpus, exist_ok=True)
    print(f"building {mult}x corpus under {corpus} ...", flush=True)
    build_corpus(sf_dir, mult, corpus)

    res = {}
    for cpus in (cpus_hi, cpus_lo):
        out = (
            f"{out_prefix}_c{cpus}.json"
            if out_prefix
            else os.path.join(base, f"bench_c{cpus}.json")
        )
        print(f"running {len(names)} queries at local[{cpus}] ...", flush=True)
        res[cpus] = run_bench(corpus, names, cpus, runs, out)
        print(f"  total {res[cpus]['value']} s -> {out}", flush=True)

    qs_hi, qs_lo = res[cpus_hi]["queries"], res[cpus_lo]["queries"]
    print(f"\n{'query':32s} {f'c{cpus_lo}':>8} {f'c{cpus_hi}':>8} {'ratio':>7}")
    for n in names:
        lo, hi = qs_lo.get(n), qs_hi.get(n)
        if lo is None or hi is None or hi != hi or lo != lo:
            print(f"{n:32s} {'nan':>8} {'nan':>8}")
            continue
        print(f"{n:32s} {lo:8.2f} {hi:8.2f} {lo / hi:7.2f}")
    print(
        f"\n(core ratio {cpus_hi / cpus_lo:.1f}; ratio ~1 = serial/overhead-bound,"
        f" toward {cpus_hi / cpus_lo:.1f} = compute-parallel)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
