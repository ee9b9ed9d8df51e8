"""BSON→JSON normalization as JVM-side Column expressions
(SURVEY.md §2.3 M6/M7, §2.8).

The reference normalizes documents at serialization boundaries
(monstachemap/encoding.go): ObjectID → hex, UUID binary → dashed hex,
other binary → base64, Decimal128 NaN/±Inf → null, datetimes → ISO-8601
with a [0, 9999] year check, NaN/±Inf floats pruned with warnings
(fixPruneInvalidJSON monstache.go:878-950). Ids stringify with
integral-float collapse (opIDToString monstache.go:815-840).

All of it is expressible with built-in functions — no UDFs, fully
codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ISO JSON date format used by the reference (encoding.go:13)
ISO_JSON_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def uuid_dashed(bin_col: Column) -> Column:
    """16-byte binary → canonical dashed-hex UUID ``8-4-4-4-12``
    (encoding.go:58-76). Lowercase hex, like the reference's %x."""
    h = F.lower(F.hex(bin_col))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def binary_b64(bin_col: Column) -> Column:
    """Non-UUID binary → base64 (encoding.go:77-80)."""
    return F.base64(bin_col)


def prune_invalid_float(col: Column) -> Column:
    """M7: NaN / ±Inf → null (fixPruneInvalidJSON monstache.go:896-907;
    Decimal128 variant encoding.go:47-56)."""
    return F.when(F.isnan(col) | (F.abs(col) == F.lit(float("inf"))), F.lit(None)).otherwise(col)


def prune_invalid_date(col: Column) -> Column:
    """M7: timestamps with year outside [0, 9999] → null
    (encoding.go:28-30, monstache.go:887-894)."""
    return F.when(F.year(col).between(0, 9999), col)


def iso_json_date(col: Column) -> Column:
    """Datetime → the reference's JSON wire format (encoding.go:13)."""
    return F.date_format(col, ISO_JSON_FORMAT)


def id_string(col: Column) -> Column:
    """Id stringification with integral-float collapse: 42.0 → "42"
    (monstache.go:822-835, test monstache_test.go:239-259)."""
    dt = col if not hasattr(col, "_jc") else col
    as_double = dt.cast("double")
    return (
        F.when(
            as_double.isNotNull() & (as_double == F.floor(as_double)) & ~F.isnan(as_double),
            as_double.cast("long").cast("string"),
        )
        .otherwise(dt.cast("string"))
    )
