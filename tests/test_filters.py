"""FIXTURES.md F8 filter scenarios (reference monstache.go:1435-1549)."""

from __future__ import annotations

from monstache_spark.operators import filters as Flt

NAMESPACES = ["test.a", "test.b", "skipme.c", "test.system.x", "fs.chunks", "config.x", "monstache.meta"]


def _ops(spark):
    rows = [("i", ns) for ns in NAMESPACES] + [("drop", "test.a"), ("dropDatabase", "skipme")]
    return spark.createDataFrame(rows, "op string, ns string")


def _ns(df):
    return sorted({(r["op"], r["ns"]) for r in df.collect()})


def test_system_guards(spark):
    out = _ns(Flt.system_guards(_ops(spark)))
    kept_ns = {ns for _, ns in out}
    assert "test.system.x" not in kept_ns
    assert "fs.chunks" not in kept_ns
    assert "config.x" not in kept_ns
    assert "monstache.meta" not in kept_ns
    assert {"test.a", "test.b", "skipme.c"} <= kept_ns


def test_include_exempts_drops(spark):
    out = _ns(Flt.include_namespaces(_ops(spark), r"^test\."))
    assert ("i", "skipme.c") not in out
    assert ("dropDatabase", "skipme") in out  # drops exempt from include
    assert ("i", "test.a") in out


def test_exclude_exempts_drops(spark):
    out = _ns(Flt.exclude_namespaces(_ops(spark), r"^test\."))
    assert ("i", "test.a") not in out
    assert ("drop", "test.a") in out


def test_drop_scoped_filters(spark):
    out = _ns(Flt.include_drop_namespaces(_ops(spark), r"^test\."))
    assert ("dropDatabase", "skipme") not in out
    assert ("drop", "test.a") in out
    assert ("i", "skipme.c") in out  # data ops untouched

    out2 = _ns(Flt.exclude_drop_namespaces(_ops(spark), r"^test\."))
    assert ("drop", "test.a") not in out2
    assert ("dropDatabase", "skipme") in out2


def test_worker_partition_is_a_partition(spark):
    df = spark.createDataFrame([(str(i),) for i in range(100)], "id string")
    parts = [set(r["id"] for r in Flt.worker_partition(df, w, 4).collect()) for w in range(4)]
    union = set().union(*parts)
    assert union == {str(i) for i in range(100)}
    assert sum(len(p) for p in parts) == 100  # disjoint cover
