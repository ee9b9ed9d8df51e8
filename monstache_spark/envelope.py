"""The CDC op envelope — the engine's fundamental stream type.

Mirrors the reference's op model (gtm.Op: monstache.go:50, fields used at
monstache.go:815-840, 1009, 1043-1044, 1364-1367): a stream of
(op-type, namespace, key, event-time, ordinal, provenance, document)
tuples. SURVEY.md §1.1 defines the schema; FIXTURES.md F2 the fixture
contract.

External versioning (the idempotence backbone): the reference computes a
monotonic per-op version from the oplog timestamp,
``version = (ts.T << 32) | ts.I`` then bumps updates by +1 and deletes by
+2 so that replays / out-of-order deliveries resolve deterministically
(tsVersion, monstache.go:4053-4063; delete bump monstache.go:4077-4080).
We reproduce that exactly, with one harness-level refinement: the ordinal
is multiplied by 4 before adding the bump so that distinct events can
never collide on version (the reference tolerates collisions because ES
resolves ties idempotently; a deterministic engine should not).

The driver's ``events`` parquet is the op stream. The deterministic
mapping events → envelope:

- ``op``:  signup → ``i`` (insert), error → ``d`` (delete),
  click/view/purchase → ``u`` (update)
- ``ns``:  5 namespaces hashed from ``user_id`` so every op for one key
  stays in one namespace (covers system-guard + include/exclude fixtures
  of FIXTURES.md F8)
- ``id``:  stringified ``user_id`` (id stringification rules:
  monstache.go:815-840)
- ``ts`` / ``ts_ord``: event time + ordinal (``event_id``)
- ``doc``: typed payload columns (``value``, ``k`` extracted from the
  JSON ``props``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Namespace universe: exercises every system-guard class the reference
# hard-filters (monstache.go:1435-1452) plus an excludable app namespace.
NAMESPACES = (
    "test.users",
    "test.accounts",
    "skipme.audit",
    "test.system.profiles",
    "fs.files.chunks",
)

OP_INSERT = "i"
OP_UPDATE = "u"
OP_DELETE = "d"
OP_DROP = "drop"
OP_DROP_DB = "dropDatabase"

# version bumps, monstache.go:4053-4063: u:+1, d:+2
_OP_BUMP = {OP_INSERT: 0, OP_UPDATE: 1, OP_DELETE: 2}


def version_expr(ts_col: str = "ts", ord_col: str = "ts_ord", op_col: str = "op"):
    """External version: (epoch_seconds * 2^32) + ordinal*4 + op bump.

    Pure integer arithmetic on JVM-side columns — stays inside
    whole-stage codegen.
    """
    bump = (
        F.when(F.col(op_col) == OP_UPDATE, F.lit(1))
        .when(F.col(op_col) == OP_DELETE, F.lit(2))
        .otherwise(F.lit(0))
    )
    return (
        F.col(ts_col).cast("long") * F.lit(4294967296).cast("long")
        + F.col(ord_col).cast("long") * 4
        + bump
    )


# The same computation as ANSI SQL for the DuckDB oracle.
VERSION_SQL = (
    "(CAST(floor(epoch({ts})) AS BIGINT) * 4294967296 + {ord} * 4 + "
    "CASE {op} WHEN 'u' THEN 1 WHEN 'd' THEN 2 ELSE 0 END)"
)

# events -> envelope as SQL (shared by every oracle query that starts
# from the envelope).  Must stay semantically identical to
# events_to_envelope below.
ENVELOPE_SQL = """
SELECT
  CASE event_type WHEN 'signup' THEN 'i' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
  CASE CAST(user_id % 5 AS INTEGER)
    WHEN 0 THEN 'test.users'
    WHEN 1 THEN 'test.accounts'
    WHEN 2 THEN 'skipme.audit'
    WHEN 3 THEN 'test.system.profiles'
    ELSE 'fs.files.chunks'
  END AS ns,
  CAST(user_id AS VARCHAR) AS id,
  ts,
  event_id AS ts_ord,
  'oplog' AS source,
  value,
  CAST(regexp_extract(props, '-?[0-9]+') AS BIGINT) AS k,
  (CAST(floor(epoch(ts)) AS BIGINT) * 4294967296 + event_id * 4 +
   CASE event_type WHEN 'error' THEN 2 WHEN 'signup' THEN 0 ELSE 1 END) AS version
FROM events
"""


def events_to_envelope(events: DataFrame) -> DataFrame:
    """Deterministic events → CDC-envelope mapping (see module docstring).

    All JVM-side Column expressions; no UDFs. ``user_id % 5`` keys the
    namespace so all ops of one key share a namespace.
    """
    op = (
        F.when(F.col("event_type") == "signup", F.lit(OP_INSERT))
        .when(F.col("event_type") == "error", F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE))
    )
    ns = (
        F.when(F.col("user_id") % 5 == 0, NAMESPACES[0])
        .when(F.col("user_id") % 5 == 1, NAMESPACES[1])
        .when(F.col("user_id") % 5 == 2, NAMESPACES[2])
        .when(F.col("user_id") % 5 == 3, NAMESPACES[3])
        .otherwise(NAMESPACES[4])
    )
    env = events.select(
        op.alias("op"),
        ns.alias("ns"),
        F.col("user_id").cast("string").alias("id"),
        F.col("ts"),
        F.col("event_id").alias("ts_ord"),
        F.lit("oplog").alias("source"),
        F.col("value"),
        F.regexp_extract(F.col("props"), r"-?[0-9]+", 0).cast("long").alias("k"),
    )
    return env.withColumn("version", version_expr())


def id_guard(df: DataFrame) -> DataFrame:
    """F9: reject empty ids and ids > 512 bytes (monstache.go:3167-3171).

    Control-plane drop ops are exempt: the reference's guard sits in
    doIndexing, a path drops never take (doDrop handles them) — without
    the exemption a drop with no document key would be erased BEFORE
    drop propagation could apply it."""
    ok = F.length(F.col("id")).between(1, 512)
    if "op" in df.columns:
        ok = F.col("op").isin(OP_DROP, OP_DROP_DB) | ok
    return df.filter(ok)
