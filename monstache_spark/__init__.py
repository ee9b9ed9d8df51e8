"""monstache_spark — a PySpark-native CDC/analytics engine.

A from-scratch re-expression of the capabilities of rwynn/monstache
(continuous CDC dataflow: change-stream in, per-namespace transform DAG,
versioned bulk upsert out) as an idiomatic Spark engine:

- DataFrame/Catalyst for all set-level operations (filters, relate joins,
  normalization, routing) — see ``operators/``.
- Structured Streaming micro-batches + checkpointing replace the
  reference's event loop, channels, and hand-rolled resume machinery —
  see ``streaming/``.
- A version-guarded merge sink (the reference's external-versioning
  idempotence, monstache.go:4053-4063) — see ``sinks/``.
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale — see ``operators/dedup.py``,
  ``operators/similarity.py``, ``functions/text.py``.

Everything is declarative DataFrame code: Catalyst handles pushdown,
pruning, join strategy, AQE, and codegen. No RDDs, no driver-side loops.
"""

__version__ = "0.1.0"

from monstache_spark.session import get_spark  # noqa: F401
