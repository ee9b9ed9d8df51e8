"""Per-query profiling for the optimization rounds: for each named
query (or the N slowest from a bench artifact), time plan build,
first noop run (cold: includes codegen+plan), and best-of-k warm
runs, and dump the formatted physical plan.

    python tools/profile_queries.py [sf_dir] [--top N | name ...]
                                    [--plans-dir DIR] [--runs K]

Writes plans to DIR/<query>.txt (default: no plans) and prints one
line per query: build_s cold_s warm_s name.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from monstache_spark.session import get_spark


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    plans_dir = None
    runs = 2
    top_n = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans-dir":
            plans_dir = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--top":
            top_n = int(args[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1

    all_queries = entrymod.queries()
    if top_n is not None:
        bench = json.load(open(os.path.join(os.path.dirname(__file__), "..", "BENCH.json")))
        ranked = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        names = [k for k, _ in ranked[:top_n]]
    if not names:
        names = list(all_queries)

    spark = get_spark("monstache_profile")
    from monstache_spark.sources.testdata import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, sf_dir).schema
    load_table(spark, "events", sf_dir).limit(1000).write.mode("overwrite").format("noop").save()

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    print(f"{'build':>7} {'cold':>7} {'warm':>7}  name")
    for name in names:
        fn = all_queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_cold = time.time() - t0
        warm = []
        for _ in range(runs - 1):
            t0 = time.time()
            df2 = fn(spark, sf_dir)
            df2.write.mode("overwrite").format("noop").save()
            warm.append(time.time() - t0)
        t_warm = min(warm) if warm else float("nan")
        if plans_dir:
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(formatted_plan(df))
        print(f"{t_build:7.2f} {t_cold:7.2f} {t_warm:7.2f}  {name}", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
