"""The process-level streaming-fixture cache (__spark_entry__
._stream_fixture): the second call for the same (sf_dir, name) must
return the SAME directory without rewriting, different names/sf_dirs
must not collide, and the written batch files must preserve frame
order and content."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_stream_fixture_cache_and_content(spark, tmp_path):
    import __spark_entry__ as entry

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    frames = [df.filter(f"id % 3 = {i}") for i in range(3)]
    entry._STREAM_FIXTURE_CACHE.clear()
    src1 = entry._stream_fixture("sfA", "fixt", frames)
    files = sorted(f for f in os.listdir(src1) if f.endswith(".parquet"))
    assert files == ["b00.parquet", "b01.parquet", "b02.parquet"]
    mtimes = {f: os.path.getmtime(os.path.join(src1, f)) for f in files}
    # reuse: same dir, nothing rewritten
    src2 = entry._stream_fixture("sfA", "fixt", frames)
    assert src2 == src1
    assert {f: os.path.getmtime(os.path.join(src1, f)) for f in files} == mtimes
    # a different fixture name or sf_dir gets its own directory
    assert entry._stream_fixture("sfA", "other", frames[:2]) != src1
    assert entry._stream_fixture("sfB", "fixt", frames) != src1
    # content round-trips per batch, in order
    got = [
        {r["id"] for r in spark.read.parquet(os.path.join(src1, f)).collect()}
        for f in files
    ]
    assert got == [{0, 3, 6, 9}, {1, 4, 7}, {2, 5, 8}]
    entry._STREAM_FIXTURE_CACHE.clear()
