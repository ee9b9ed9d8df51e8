"""Namespace / predicate filters (SURVEY.md §2.2, F1-F9).

The reference chains four hard system guards in front of every user
filter (notMonstache/notSystem/notChunks/notConfig,
monstache.go:1435-1452, regexes monstache.go:86-87) and then applies
include / exclude regexes with drop-ops exempted from the include rule
(filterWithRegex monstache.go:1454-1462, filterInverseWithRegex
monstache.go:1531-1539, drop variants monstache.go:1464-1472 and
1541-1549).

All of these are single Column predicates — Catalyst folds the chain
into one codegen'd filter and pushes what it can into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from monstache_spark.envelope import OP_DROP, OP_DROP_DB

# system-namespace regexes, cf. monstache.go:86-87
SYSTEM_NS_RE = r"system\..+$"
CHUNKS_NS_RE = r"\.chunks$"
CONFIG_DB = "config"
ENGINE_DB = "monstache"  # the reference's own config db is always excluded


def ns_database(col: Column) -> Column:
    """db part of a ``db.collection`` namespace (monstache.go:797-799)."""
    return F.substring_index(col, ".", 1)


def system_guards(df: DataFrame, ns_col: str = "ns") -> DataFrame:
    """F1: always-on guards — engine db, system collections, GridFS
    chunks, the sharded-cluster config db."""
    ns = F.col(ns_col)
    return df.filter(
        (ns_database(ns) != ENGINE_DB)
        & (ns_database(ns) != CONFIG_DB)
        & ~ns.rlike(SYSTEM_NS_RE)
        & ~ns.rlike(CHUNKS_NS_RE)
    )


def _is_drop(op_col: str) -> Column:
    return F.col(op_col).isin(OP_DROP, OP_DROP_DB)


def include_namespaces(df: DataFrame, pattern: str, ns_col: str = "ns", op_col: str = "op") -> DataFrame:
    """F2: keep ops whose namespace matches; drop ops are exempt
    (they are filtered by the drop-specific rules instead)."""
    return df.filter(_is_drop(op_col) | F.col(ns_col).rlike(pattern))


def exclude_namespaces(df: DataFrame, pattern: str, ns_col: str = "ns", op_col: str = "op") -> DataFrame:
    """F3: inverse of F2."""
    return df.filter(_is_drop(op_col) | ~F.col(ns_col).rlike(pattern))


def include_drop_namespaces(df: DataFrame, pattern: str, ns_col: str = "ns", op_col: str = "op") -> DataFrame:
    """F4: include regex scoped to drop ops only."""
    return df.filter(~_is_drop(op_col) | F.col(ns_col).rlike(pattern))


def exclude_drop_namespaces(df: DataFrame, pattern: str, ns_col: str = "ns", op_col: str = "op") -> DataFrame:
    """F4: exclude regex scoped to drop ops only."""
    return df.filter(~_is_drop(op_col) | ~F.col(ns_col).rlike(pattern))


def worker_partition(
    df: DataFrame,
    worker: int,
    workers: int,
    id_col: str = "id",
    hash_expr=None,
) -> DataFrame:
    """F7 semantic twin: consistent-hash partition filter
    (monstache.go:4761-4769). Spark owns partitioning, so this exists
    only for multi-pipeline sharding parity. ``hash_expr`` swaps the
    hash family (default xxhash64, the cheapest JVM-side choice; pass
    the md5-derived shingle_hash for cross-engine reproducibility)."""
    h = hash_expr(F.col(id_col)) if hash_expr is not None else F.xxhash64(F.col(id_col))
    return df.filter(F.pmod(h, F.lit(workers)) == F.lit(worker))
