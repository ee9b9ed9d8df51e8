"""File / attachment enrichment (SURVEY.md §2.1 S7, §2.6 K8).

The reference downloads GridFS file content for file-namespaces,
base64s it, and caps by ``max-file-size`` (addFileContent
monstache.go:1405-1433, gate monstache.go:3077-3082); oversized files
keep their metadata but omit the content field. Content extraction is
delegated to the ES ``attachment`` ingest pipeline (ensureFileMapping
monstache.go:775-793).

Spark-first: two fetch shapes. ``add_file_content`` enriches a binary
column already in-frame; ``fetch_file_content`` is the REAL fetch
stage — a ``mapInPandas`` pass that pulls bytes by path with a bounded
per-partition thread pool (the analogue of the 10-downloader pool,
monstache.go:98), gated by ``max-file-size``. Extraction runs IN the
engine instead of being delegated: a pandas-UDF stage (stubbed
deterministically here — no Tika in this image)."""

from __future__ import annotations

import base64
import os
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_file_content(
    df: DataFrame,
    content_col: str = "content",
    max_file_size: int | None = None,
    out_col: str = "file",
) -> DataFrame:
    """base64 the binary content; omit (null) when over max-file-size
    (monstache.go:1423-1427)."""
    content = F.col(content_col)
    b64 = F.base64(content)
    if max_file_size is not None:
        b64 = F.when(F.length(content) <= max_file_size, b64)
    return df.withColumn(out_col, b64).withColumn("file_size", F.length(content).cast("long"))


def fetch_file_content(
    df: DataFrame,
    path_col: str = "path",
    max_file_size: int | None = None,
    out_col: str = "file",
    size_col: str = "file_size",
    concurrency: int = 10,
) -> DataFrame:
    """S7 as a REAL fetch stage: rows name files by path (the stand-in
    for GridFS object ids / object-store keys); each Arrow batch
    fetches its files with a bounded thread pool — the analogue of the
    reference's 10-downloader pool (fileDownloaders monstache.go:98,
    addFileContent monstache.go:1405-1433) — then base64s the bytes
    into ``out_col``.

    Semantics pinned to the reference's gate (monstache.go:1423-1427):
    a file larger than ``max_file_size`` keeps its size metadata but
    omits the content; an unreadable/missing file yields null content
    AND null size. Fetch parallelism is partitions × ``concurrency``
    — the stage scales horizontally with the corpus, no driver I/O.
    A narrow input (single small parquet file locally) is spread to
    the shuffle width first so that product holds — otherwise ONE
    Python worker fetches and base64s everything (guide §2.5/§4); the
    spread is a no-op on a production-width input.
    """
    import pandas as pd

    from monstache_spark.session import spread_scan

    df = spread_scan(df)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} string, {size_col} long"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from concurrent.futures import ThreadPoolExecutor

        def fetch(p):
            try:
                size = os.path.getsize(p)
            except OSError:
                return None, None
            if max_file_size is not None and size > max_file_size:
                return None, size  # metadata survives, content omitted
            try:
                with open(p, "rb") as f:
                    data = f.read()
            except OSError:
                return None, None
            return base64.b64encode(data).decode("ascii"), size

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for pdf in batches:
                results = list(pool.map(fetch, pdf[path_col]))
                pdf[out_col] = [r[0] for r in results]
                pdf[size_col] = pd.array([r[1] for r in results], dtype="Int64")
                yield pdf

    return df.mapInPandas(run, schema)


def resolve_extractor() -> tuple[str, "callable"]:
    """Optional-dependency extraction hook (K8, ensureFileMapping +
    attachment pipeline, monstache.go:775-793, 3239-3241): use Apache
    Tika if the ``tika`` client is importable in THIS interpreter,
    otherwise the deterministic stub. Returns ``(name, fn)`` so tests
    and operators can observe which path dispatched. A real deployment
    gets content extraction for free by shipping tika on the executor
    image — no code change."""
    try:
        from tika import parser as _tika_parser  # optional dep, absent here

        def _tika_extract(content: bytes | None) -> str | None:
            if content is None:
                return None
            parsed = _tika_parser.from_buffer(bytes(content))
            return (parsed or {}).get("content")

        return "tika", _tika_extract
    except ImportError:
        return "stub", _stub_extract


def extract_content(
    df: DataFrame,
    content_col: str = "content",
    text_col: str = "extracted_text",
    extractor=None,
) -> DataFrame:
    """K8 attachment extraction stage. The extractor resolves on the
    EXECUTOR (inside the Arrow batch loop) via :func:`resolve_extractor`
    unless one is injected: the worker environment, not the driver,
    decides whether real Tika is available. The stub keeps the oracle
    deterministic in environments without Tika."""
    import pandas as pd

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {text_col} string"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        fn = extractor if extractor is not None else resolve_extractor()[1]
        for pdf in batches:
            pdf[text_col] = pdf[content_col].map(fn)
            yield pdf

    return df.mapInPandas(run, schema)


def _stub_extract(content: bytes | None) -> str | None:
    """Deterministic fake parser: utf-8 decode with byte-count header.

    A real extractor (PDF/DOCX/image OCR) plugs in here unchanged —
    the Spark-side plumbing (Arrow batches, schema, partition
    parallelism) is the part under test."""
    if content is None:
        return None
    return f"[{len(content)}b] " + content.decode("utf-8", errors="replace")
