"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from monstache_spark.session import get_spark
from monstache_spark.sources.testdata import TABLES


def normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("|".join(normalize_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return sorted_cols, len(lines), h, lines


def main():
    # default to sf0.01 — the driver gate's scale (sf0.001 is a
    # DIFFERENT 500-doc corpus, not a subset; green there does not
    # imply green at the gate)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # a typo'd / not-yet-registered name would otherwise be silently
    # skipped and the run would print a VACUOUS "all green"
    unknown = only - set(entrymod.queries())
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        # schema lint BEFORE execution: the driver's pandas
        # canonicalizer cannot hash complex-typed cells (round-8
        # verdict: es_termvectors' array<long> positions was the one
        # red row) — fail ANY query whose output schema carries
        # Array/Map/Struct so the class stays closed registry-wide,
        # without paying the query's full run first
        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            print(
                f"FAIL {name}: complex-typed output columns {complex_cols} "
                "(driver canonicalizer cannot hash list/dict cells — "
                "serialize with array_join/to_json in the gate query)"
            )
            failures.append(name)
            continue
        try:
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(srows)} rows, {spark_t:.1f}s) — no oracle")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc, sn, sh, slines = frame_signature(scols, srows)
        dc, dn, dh, dlines = frame_signature(dcols, drows)
        status = "OK  " if (sc == dc and sn == dn and sh == dh) else "FAIL"
        print(f"{status} {name}: spark {sn} rows / duckdb {dn} rows, cols {'=' if sc == dc else f'{sc} vs {dc}'}, hash {'=' if sh == dh else 'MISMATCH'} ({spark_t:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            sset, dset = set(slines), set(dlines)
            diff_s = sorted(sset - dset)[:3]
            diff_d = sorted(dset - sset)[:3]
            for line in diff_s:
                print(f"    spark-only: {line[:200]}")
            for line in diff_d:
                print(f"    duck-only:  {line[:200]}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
