"""File / attachment enrichment (SURVEY.md §2.1 S7, §2.6 K8).

The reference downloads GridFS file content for file-namespaces,
base64s it, and caps by ``max-file-size`` (addFileContent
monstache.go:1405-1433, gate monstache.go:3077-3082); oversized files
keep their metadata but omit the content field. Content extraction is
delegated to the ES ``attachment`` ingest pipeline (ensureFileMapping
monstache.go:775-793).

Spark-first: the fetch is an enrichment stage over a binary column
(here the column already holds the bytes; a real deployment would
fetch object-store blobs in ``mapInPandas`` with partition-parallel
concurrency — the analogue of the 10-downloader pool,
monstache.go:98). Extraction runs IN the engine instead of being
delegated: a pandas-UDF stage (stubbed deterministically here — no
Tika in this image)."""

from __future__ import annotations

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


def extract_content(df: DataFrame, content_col: str = "content", text_col: str = "extracted_text") -> DataFrame:
    """K8 attachment extraction stage — mapInPandas plumbing with a
    deterministic stub extractor (real Tika/textract is not in this
    image; swap ``_stub_extract`` for a real parser in deployment)."""
    import pandas as pd

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {text_col} string"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf[text_col] = pdf[content_col].map(_stub_extract)
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
