"""File enrichment (S7/K8), merge-patch history (M9), multimodal
plumbing, direct reads (S4/S5), delete protection (K3), ops (K9/K11)."""

from __future__ import annotations

import base64
import datetime as dt

import pytest
from pyspark.sql import functions as F

from monstache_spark.operators.files import add_file_content, extract_content
from monstache_spark.operators.multimodal import fake_features, frame_sample
from monstache_spark.operators.patches import merge_patch_history
from monstache_spark.sinks.merge import protected_deletes
from monstache_spark.sources.directreads import DirectReadManifest, direct_read, discover_namespaces
from monstache_spark.streaming.ops import BackoffPolicy


def test_file_content_b64_and_size_cap(spark):
    df = spark.createDataFrame([("a", b"hello"), ("b", b"x" * 100)], "id string, content binary")
    out = {r["id"]: (r["file"], r["file_size"]) for r in add_file_content(df, max_file_size=10).collect()}
    assert out["a"] == (base64.b64encode(b"hello").decode(), 5)
    assert out["b"] == (None, 100)  # oversized: content omitted, metadata kept


def test_extract_content_stub(spark):
    df = spark.createDataFrame([("a", b"hi there")], "id string, content binary")
    out = extract_content(df).collect()[0]
    assert out["extracted_text"] == "[8b] hi there"


def test_merge_patch_history_tracks_changes(spark):
    rows = [
        ("i", "t.a", "1", 1, 10.0, 5),
        ("u", "t.a", "1", 2, 10.0, 7),   # only k changes
        ("u", "t.a", "1", 3, 20.0, 7),   # only value changes
        ("d", "t.a", "1", 4, 0.0, 0),    # tombstone
    ]
    ops = spark.createDataFrame(rows, "op string, ns string, id string, version long, value double, k long")
    got = sorted(merge_patch_history(ops).collect(), key=lambda r: r["patch_v"])
    assert [r["patch_v"] for r in got] == [1, 2, 3, 4]
    assert (got[0]["patch_value"], got[0]["patch_k"]) == (10.0, 5)   # v1 seeds full doc
    assert (got[1]["patch_value"], got[1]["patch_k"]) == (None, 7)
    assert (got[2]["patch_value"], got[2]["patch_k"]) == (20.0, None)
    assert got[3]["is_tombstone"] and got[3]["patch_value"] is None


def test_multimodal_features_deterministic(spark):
    df = spark.createDataFrame([(1, b"abc"), (2, None)], "asset_id long, media binary")
    got = {r["asset_id"]: r for r in fake_features(df).collect()}
    assert got[1]["n_bytes"] == 3
    assert got[1]["byte_sum"] == sum(b"abc")
    assert got[1]["head_u64"] == (int.from_bytes(b"abc".ljust(8, b"\0"), "big") >> 1)
    assert got[2]["n_bytes"] == 0 and got[2]["byte_mean"] == 0.0


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame([(1, bytes(range(200)))], "asset_id long, media binary")
    frames = frame_sample(df, every_n_bytes=64).collect()
    assert [r["frame_no"] for r in frames] == [0, 1, 2, 3]
    assert [r["frame_byte"] for r in frames] == [bytes([0]), bytes([64]), bytes([128]), bytes([192])]


def test_discover_namespaces_filters(tmp_path):
    for name in ["a.parquet", "b.parquet", "x_system.notes"]:
        (tmp_path / name).write_text("")
    ns = discover_namespaces(str(tmp_path))
    assert ns == ["testdata.a", "testdata.b"]
    assert discover_namespaces(str(tmp_path), include_regex=r"\.a$") == ["testdata.a"]
    assert discover_namespaces(str(tmp_path), exclude_regex=r"\.a$") == ["testdata.b"]


def test_direct_read_manifest_skips_done(spark, tmp_path):
    manifest = DirectReadManifest(str(tmp_path / "manifest.json"))
    frames = direct_read(spark, "/root/testdata/sf0.001", namespaces=["testdata.region", "testdata.nation"], manifest=manifest)
    assert set(frames) == {"testdata.region", "testdata.nation"}
    manifest.mark_done(["testdata.region"])
    frames2 = direct_read(spark, "/root/testdata/sf0.001", namespaces=["testdata.region", "testdata.nation"], manifest=manifest)
    assert set(frames2) == {"testdata.nation"}


def test_protected_deletes(spark):
    state = spark.createDataFrame(
        [("idx.a", "1", 5), ("idx.a", "2", 5), ("idx.b", "2", 6)],
        "ns string, id string, version long",
    )
    dels = spark.createDataFrame(
        [("1", 9), ("2", 9), ("3", 9)], "id string, version long"
    )
    applied, refused = protected_deletes(state, dels)
    assert [(r["ns"], r["id"]) for r in applied.collect()] == [("idx.a", "1")]
    got_refused = {r["id"]: r["n_hits"] for r in refused.collect()}
    assert got_refused == {"2": 2, "3": 0}  # ambiguous and missing both refused


def test_backoff_policy_retries_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("boom")
        return "ok"

    p = BackoffPolicy(base_seconds=0.01, cap_seconds=0.02, max_retries=5)
    assert p.run(flaky) == "ok"
    assert len(calls) == 3 and p.attempts == [0.01, 0.02]


def test_backoff_policy_ignorable_conflict():
    p = BackoffPolicy(base_seconds=0.01, max_retries=1)

    def conflict():
        raise RuntimeError("409 conflict")

    assert p.run(conflict, is_ignorable=lambda e: "409" in str(e)) is None
    assert p.attempts == []


def test_backoff_policy_fail_fast():
    p = BackoffPolicy(base_seconds=0.01, max_retries=5, fail_fast=True)
    with pytest.raises(RuntimeError):
        p.run(lambda: (_ for _ in ()).throw(RuntimeError("x")))


def test_fetch_file_content_from_disk(spark, tmp_path):
    """Real fetch stage: bytes pulled by path through the thread-pooled
    mapInPandas pass; oversize keeps size but omits content
    (monstache.go:1423-1427); missing file yields null content+size."""
    import base64 as b64mod

    from monstache_spark.operators.files import fetch_file_content

    small = tmp_path / "small.bin"
    small.write_bytes(b"hello world")
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * 100)
    rows = [
        (1, str(small)),
        (2, str(big)),
        (3, str(tmp_path / "missing.bin")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, path string")
    out = {
        r["doc_id"]: (r["file"], r["file_size"])
        for r in fetch_file_content(df, max_file_size=50, concurrency=4).collect()
    }
    assert out[1] == (b64mod.b64encode(b"hello world").decode(), 11)
    assert out[2] == (None, 100)  # gated: metadata survives, content omitted
    assert out[3] == (None, None)


def test_extractor_hook_dispatch_both_ways(monkeypatch):
    """resolve_extractor picks the stub in this image (no tika) and the
    real client when a tika module is importable."""
    import sys
    import types

    from monstache_spark.operators import files as files_mod

    name, fn = files_mod.resolve_extractor()
    assert name == "stub"
    assert fn(b"abc") == "[3b] abc"

    fake_parser = types.SimpleNamespace(
        from_buffer=lambda b: {"content": f"tika:{len(b)}"}
    )
    fake_tika = types.ModuleType("tika")
    fake_tika.parser = fake_parser
    monkeypatch.setitem(sys.modules, "tika", fake_tika)
    monkeypatch.setitem(sys.modules, "tika.parser", fake_parser)
    name, fn = files_mod.resolve_extractor()
    assert name == "tika"
    assert fn(b"abcd") == "tika:4"
    assert fn(None) is None


def test_extract_content_injected_extractor(spark):
    """The mapInPandas stage accepts an injected extractor — the seam a
    deployment uses for a custom parser."""
    from monstache_spark.operators.files import extract_content

    df = spark.createDataFrame([(1, bytearray(b"hello"))], "doc_id long, content binary")
    out = extract_content(df, extractor=lambda b: f"custom:{len(b)}").collect()
    assert out[0]["extracted_text"] == "custom:5"


def test_media_decoder_hook_dispatch_both_ways(monkeypatch):
    """Image/audio decode: contract stub without PIL/soundfile, real
    decode when the modules are importable."""
    import sys
    import types

    import pytest

    from monstache_spark.operators import multimodal as mm

    name, fn = mm.resolve_image_decoder()
    assert name == "stub"
    with pytest.raises(NotImplementedError):
        fn(b"\x89PNG")
    name, _fn = mm.resolve_audio_decoder()
    assert name == "stub"
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF")

    class _FakeImage:
        def __init__(self, b):
            self.size = (1, len(b))
        def load(self):
            return self

    fake_image_mod = types.SimpleNamespace(open=lambda bio: _FakeImage(bio.read()))
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    name, fn = mm.resolve_image_decoder()
    assert name == "pil"
    assert fn(b"\x89PNG").size == (1, 4)

    fake_sf = types.ModuleType("soundfile")
    fake_sf.read = lambda bio: ([0.0, 0.1], 16000)
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)
    name, fn = mm.resolve_audio_decoder()
    assert name == "soundfile"
    assert mm.decode_audio(b"RIFF") == ([0.0, 0.1], 16000)
