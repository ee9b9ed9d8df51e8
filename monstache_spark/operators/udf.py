"""Per-namespace transform surface — the engine's answer to the
reference's JS/Go UDFs (SURVEY.md §2.3 M1/M2, §2.2 F5/F6/F8, §2.9).

The reference runs row-at-a-time JavaScript under a global mutex
(mapDataJavascript monstache.go:1000-1037, filterWithScript
monstache.go:1498-1529) — a deliberate single-thread bottleneck. Here
the same per-namespace semantics are data-parallel:

- Fast path (preferred): mappers/filters are **Column expressions**
  registered per namespace, compiled into ONE ``when/otherwise``
  projection over the whole stream — fully codegen'd, no Python in the
  hot path.
- Slow path (escape hatch): an arbitrary Python function over Arrow
  batches via ``mapInPandas`` — the analogue of the Go plugin API
  (monstachemap/plugin.go:19-44), ~10-100x faster than row-at-a-time.

Mapper contract parity:
- a mapper may rewrite payload columns (doc replacement, M1/M2)
- a mapper may mark rows dropped -> tombstone (falsy return ⇒ delete,
  monstache.go:1056-1060) via the ``drop_when`` predicate
- a mapper may mark rows skipped (MapperPluginOutput.Skip,
  monstachemap/plugin.go:35) via ``skip_when`` — row vanishes without
  a delete
- filters apply to insert/update ops only (monstache.go:1477-1529);
  deletes and drops always pass
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from monstache_spark.envelope import OP_DELETE, OP_INSERT, OP_UPDATE


@dataclass
class NamespaceMapper:
    """Declarative per-namespace mapper (fast path)."""

    namespace: str                                  # exact ns, or "" = global (runs for all)
    columns: dict[str, Callable[[], Column]] = field(default_factory=dict)
    skip_when: Callable[[], Column] | None = None   # row vanishes (F8)
    drop_when: Callable[[], Column] | None = None   # row becomes a tombstone (M1 falsy)


def apply_mappers(df: DataFrame, mappers: Iterable[NamespaceMapper], ns_col: str = "ns") -> DataFrame:
    """Compile all namespace mappers into one projection.

    Global mappers ("" namespace) run before namespace-scoped ones,
    like the reference's global-then-namespace env ordering
    (monstache.go:1023-1036).
    """
    ordered = sorted(mappers, key=lambda m: m.namespace != "")  # global first
    out = df
    for m in ordered:
        in_ns = F.lit(True) if m.namespace == "" else (F.col(ns_col) == m.namespace)
        for col_name, expr_fn in m.columns.items():
            base = F.col(col_name) if col_name in out.columns else F.lit(None)
            out = out.withColumn(col_name, F.when(in_ns, expr_fn()).otherwise(base))
        if m.drop_when is not None:
            out = out.withColumn(
                "op", F.when(in_ns & m.drop_when(), F.lit(OP_DELETE)).otherwise(F.col("op"))
            )
        if m.skip_when is not None:
            out = out.filter(~(in_ns & m.skip_when()))
    return out


@dataclass
class NamespaceFilter:
    """Declarative per-namespace predicate (F5/F6 fast path)."""

    namespace: str
    predicate: Callable[[], Column]


def apply_filters(df: DataFrame, filters: Iterable[NamespaceFilter], ns_col: str = "ns", op_col: str = "op") -> DataFrame:
    """Predicates gate inserts/updates only; deletes + drops pass
    (the reference applies row filters to data ops: monstache.go:1477,
    1498-1529; delete/drop propagation must never be filtered away)."""
    out = df
    data_op = F.col(op_col).isin(OP_INSERT, OP_UPDATE)
    for flt in filters:
        in_ns = F.lit(True) if flt.namespace == "" else (F.col(ns_col) == flt.namespace)
        out = out.filter(~(data_op & in_ns) | flt.predicate())
    return out


def pandas_mapper(df: DataFrame, fn, schema) -> DataFrame:
    """Slow-path escape hatch: arbitrary Python over Arrow batches.

    ``fn(iter[pd.DataFrame]) -> iter[pd.DataFrame]`` — the engine's
    equivalent of the Go plugin Map hook, but data-parallel per
    partition instead of mutex-serialized.
    """
    return df.mapInPandas(fn, schema)
