"""Vector math over ``array<float>`` embedding columns — JVM-side.

``F.zip_with`` + ``F.aggregate`` keep the dot product inside codegen;
casting to double BEFORE multiplying makes the arithmetic bit-identical
to the DuckDB oracle's ``list_dot_product`` on DOUBLE[] (both are
left-to-right double accumulation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_pre(a: Column, b: Column) -> Column:
    """Dot product of ALREADY-double arrays.

    Higher-order functions are CodegenFallback (interpreted), so a
    per-pair ``dot`` pays TWO interpreted cast transforms before the
    fold.  Pair joins should cast once per ROW (``as_double_array``
    in the pre-join projection, materialized through the exchange)
    and fold with this per PAIR.  The accumulation order is identical
    to :func:`dot` — ``((0.0+p1)+p2)+…`` left-to-right over the same
    per-element double products — so scores are bit-identical.
    """
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_pre(a: Column) -> Column:
    """Norm of an ALREADY-double array (see :func:`dot_pre`)."""
    return F.sqrt(dot_pre(a, a))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded for oracle-stable comparison: double summation is
    order-dependent, so both engines compute left-to-right and round."""
    return F.round(cosine(a, b), digits)
