"""Multimodal columns — images/audio/video as opaque binary + typed
metadata (training-data pipeline extension; no counterpart in the
reference, which delegates attachments to ES ingest: SURVEY.md K8).

Design for 100 TB: media bytes ride in a ``binary`` column with a
sibling metadata struct; all per-asset compute (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched ``mapInPandas``
stages so bytes never round-trip through the driver and partitions
process independently. The decode step itself is STUBBED (no
PIL/ffmpeg in this image): ``decode_image``/``decode_audio`` raise
NotImplementedError by contract, and ``fake_features`` provides a
deterministic byte-level featurizer so the plumbing (schema, batch
shape, partitioning) is fully exercised and tested."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def resolve_image_decoder() -> tuple[str, "callable"]:
    """Optional-dependency hook: PIL if importable in this interpreter,
    else the contract stub (raises). Returns (name, fn) so callers and
    tests observe the dispatch. Resolve inside mapInPandas closures so
    the EXECUTOR environment decides."""
    try:
        from PIL import Image  # optional dep, absent in this image

        def _pil_decode(content: bytes):
            from io import BytesIO

            im = Image.open(BytesIO(content))
            im.load()
            return im

        return "pil", _pil_decode
    except ImportError:
        return "stub", _stub_decode_image


def resolve_audio_decoder() -> tuple[str, "callable"]:
    """Optional-dependency hook: soundfile if importable, else the
    contract stub (raises)."""
    try:
        import soundfile  # optional dep, absent in this image

        def _sf_decode(content: bytes):
            from io import BytesIO

            data, rate = soundfile.read(BytesIO(content))
            return data, rate

        return "soundfile", _sf_decode
    except ImportError:
        return "stub", _stub_decode_audio


def _stub_decode_image(content: bytes):  # pragma: no cover - stub by contract
    raise NotImplementedError("image decode requires PIL/opencv — not in this image")


def _stub_decode_audio(content: bytes):  # pragma: no cover - stub by contract
    raise NotImplementedError("audio decode requires ffmpeg/soundfile — not in this image")


def decode_image(content: bytes):
    """Real image decode when PIL is present; NotImplementedError
    otherwise (contract stub — the plumbing around it is tested with
    fake_features)."""
    return resolve_image_decoder()[1](content)


def decode_audio(content: bytes):
    return resolve_audio_decoder()[1](content)


FEATURE_FIELDS = "asset_id long, n_bytes long, head_u64 long, byte_sum long, byte_mean double"


def fake_features(df: DataFrame, media_col: str = "media", id_col: str = "asset_id") -> DataFrame:
    """Deterministic byte-level 'feature extraction' over Arrow batches.

    Stands in for decode+embed: same dataflow shape (binary in, fixed
    feature row out), trivially verifiable. Swap the body for a real
    model and the pipeline around it is unchanged."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf[media_col]):
                b = bytes(blob) if blob is not None else b""
                rows.append(
                    {
                        "asset_id": aid,
                        "n_bytes": len(b),
                        "head_u64": int.from_bytes(b[:8].ljust(8, b"\0"), "big", signed=False) >> 1,
                        "byte_sum": sum(b),
                        "byte_mean": (sum(b) / len(b)) if b else 0.0,
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "n_bytes", "head_u64", "byte_sum", "byte_mean"])

    return df.mapInPandas(run, FEATURE_FIELDS)


def frame_sample(df: DataFrame, media_col: str = "media", every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: one output row per sampled offset —
    the explode shape a real video frame sampler produces. Sampled
    bytes stand in for frames."""
    n = F.length(F.col(media_col))
    offsets = F.sequence(F.lit(0), F.greatest(((n - 1) / every_n_bytes).cast("int"), F.lit(0)))
    return df.withColumn("frame_no", F.explode(offsets)).withColumn(
        "frame_byte",
        F.expr(f"substring({media_col}, frame_no * {every_n_bytes} + 1, 1)"),
    )
