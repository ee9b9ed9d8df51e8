"""Incrementally-maintained IVF-PQ index under CDC.

The reference engine's whole purpose is keeping a SEARCH-SIDE artifact
(the Elasticsearch index) continuously in sync with versioned
upserts/deletes — external versions make stale replays lose
(monstache.go:4053-4063), deletes tombstone (monstache.go:4077-4080),
and the artifact follows the stream rather than being rebuilt.  An ANN
index is the vector-search analogue of that artifact: a
monstache-style deployment that syncs an embedding column needs the
index to follow the CDC stream under the SAME version guard as the
document sink, not a batch-only rebuild (``write_ivfpq_index`` is the
bootstrap, this module is the steady state).

Design — the FAISS IVF ``add()`` contract:

* the coarse quantizer (centroids) and the PQ codebooks train ONCE at
  :meth:`IvfPqIndexTable.bootstrap` and FREEZE as index metadata;
* every CDC batch only ASSIGNS (nearest frozen centroid, exact
  rounded-cosine argmax) and ENCODES (per-subspace argmin codeword)
  its upserts — so index state after ANY op sequence is bit-identical
  to a from-scratch encode of the surviving rows against the same
  quantizers.  That restatement equality is what the driver gate
  hashes, and it also makes the merge ARRIVAL-ORDER-INDEPENDENT: the
  version guard converges to the same state under any batch split.

State layout: one row per live id — ``(ns, id, version, embedding,
cell, codes)`` with the ``m`` PQ codes PACKED into one BIGINT
(``m ≤ 8``, ``k_sub ≤ 256``: 8 bits per subspace), so no array or
string ever enters an aggregation buffer (HashAggregate everywhere;
the packed argmin inside :func:`pq_encode` already obeys the same
rule).  Batch compaction is the all-hash join-back shape: max version
per key (primitive buffer), then an equi-join retrieves the winning
row's vector — the vector itself never rides a ``max_by`` buffer.
Commit/versioning/tombstones are the document sink's own
(:mod:`monstache_spark.sinks.merge`): directory-versioned commits with
a CURRENT pointer, stale replays lose, a delete beats an equal-version
upsert, tombstones persist so late stale inserts stay dead.

Scale notes (100 TB): centroids and codebooks are broadcast metadata;
per-batch assign/encode touches micro-batch-sized rows only; the
cross-batch merge is two broadcast-able equi-joins on the key (state
size × batch-key count, no aggregation over state).  Nothing
corpus-sized reaches the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monstache_spark.envelope import OP_DELETE
from monstache_spark.sinks.merge import StateTable, _merge_apply
from monstache_spark.operators.similarity import ivf_assign, pq_codebooks, pq_encode


class IvfPqIndexTable:
    """Version-guarded, incrementally-maintained IVF-PQ index."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        dim: int,
        n_centroids: int = 16,
        m: int = 8,
        k_sub: int = 16,
        vec_col: str = "embedding",
    ):
        if m > 8 or k_sub > 256:
            raise ValueError("packed codes require m <= 8 and k_sub <= 256")
        self.spark = spark
        self.path = path
        self.dim = dim
        self.n_centroids = n_centroids
        self.m = m
        self.k_sub = k_sub
        self.vec_col = vec_col
        os.makedirs(path, exist_ok=True)
        self._state = StateTable(
            spark,
            os.path.join(path, "cells_state"),
            payload_cols=(vec_col, "cell", "codes"),
        )
        # frozen-quantizer cache: centroids/codebooks never change
        # after bootstrap (the FAISS add() contract), so hold them
        # persisted instead of re-reading parquet on every micro-batch
        # — they are control-plane-sized (n_centroids / m*k_sub rows)
        self._cen_cache: DataFrame | None = None
        self._cb_cache: DataFrame | None = None

    # -- frozen quantizers ------------------------------------------------
    def bootstrap(self, training: DataFrame, id_col: str = "vec_id") -> None:
        """Train and FREEZE the quantizers from ``training``:
        centroids = the ``n_centroids`` lowest-id vectors, codebooks =
        subvectors of the ``k_sub`` lowest ids — the deterministic
        oracle-reproducible convention shared with
        :func:`pq_codebooks` / ``ivf_topk`` (a learned k-means variant
        would write the same two frames).  Indexes NOTHING: data
        enters through :meth:`merge_batch` like any CDC batch, so the
        initial backfill and the steady state share one code path."""
        training.filter(F.col(id_col) < self.n_centroids).select(
            F.col(id_col).alias("cid"), F.col(self.vec_col).alias("c_vec")
        ).write.mode("overwrite").parquet(os.path.join(self.path, "centroids"))
        pq_codebooks(
            training, self.dim, self.m, self.k_sub, self.vec_col, id_col
        ).write.mode("overwrite").parquet(os.path.join(self.path, "codebooks"))
        # re-bootstrap invalidates the frozen-quantizer cache
        for c in (self._cen_cache, self._cb_cache):
            if c is not None:
                c.unpersist()
        self._cen_cache = None
        self._cb_cache = None

    def _centroids(self) -> DataFrame:
        if self._cen_cache is None:
            self._cen_cache = self.spark.read.parquet(
                os.path.join(self.path, "centroids")
            ).persist()
        return self._cen_cache

    def _codebooks(self) -> DataFrame:
        if self._cb_cache is None:
            self._cb_cache = self.spark.read.parquet(
                os.path.join(self.path, "codebooks")
            ).persist()
        return self._cb_cache

    # -- per-batch encode --------------------------------------------------
    def encode(self, rows: DataFrame, id_col: str = "id") -> DataFrame:
        """``rows`` (…, id, vector) + frozen quantizers → the same rows
        with ``cell`` (nearest-centroid argmax, rounded-cosine
        contract) and ``codes`` (packed BIGINT of the ``m`` subspace
        argmins).  Used for every batch AND for from-scratch
        restatements in tests — one code path, no drift."""
        cen = self._centroids().select(
            F.col("cid").alias(id_col), F.col("c_vec").alias(self.vec_col)
        )
        cells = ivf_assign(
            rows.select(id_col, self.vec_col), cen, self.vec_col, id_col,
            rank_limit=1,
        ).select(id_col, F.col("cid").alias("cell"))
        packed = (
            pq_encode(
                rows.select(id_col, self.vec_col),
                self._codebooks(),
                self.dim,
                self.m,
                self.vec_col,
                id_col,
            )
            .groupBy(id_col)
            .agg(
                # 8 bits per subspace packed into ONE BIGINT buffer
                # (PySpark's shiftleft wrapper wants a literal bit
                # count — the SQL function takes the column)
                F.sum(
                    F.expr("shiftleft(CAST(code AS BIGINT), CAST(m AS INT) * 8)")
                ).alias("codes")
            )
        )
        return rows.join(cells, id_col).join(packed, id_col)

    # -- CDC merge ----------------------------------------------------------
    def merge_batch(self, ops: DataFrame) -> None:
        """Apply one micro-batch of envelope ops ``(op, ns, id,
        version, <vec_col>)`` under the document sink's version guard.

        Compaction is all-hash: ``max(version)`` per key (primitive
        buffer only), join back on ``(ns, id, version)`` for the
        winning vector (versions are unique per event — envelope
        contract), then assign+encode the winners against the frozen
        quantizers.  Deletes compact to ``(ns, id, max version)``
        tombstones.  The cross-batch rules are
        :func:`sinks.merge._merge_apply` verbatim."""
        ups = ops.filter(F.col("op") != OP_DELETE)
        winners = ups.groupBy("ns", "id").agg(F.max("version").alias("version"))
        up_rows = ups.join(winners, ["ns", "id", "version"]).select(
            "ns", "id", "version", self.vec_col
        )
        enriched = self.encode(up_rows, id_col="id").select(
            "ns", "id", "version", self.vec_col, "cell", "codes"
        )
        tombs = (
            ops.filter(F.col("op") == OP_DELETE)
            .groupBy("ns", "id")
            .agg(F.max("version").alias("version"))
        )
        merged = _merge_apply(
            self._state.read(include_tombstones=True), enriched, tombs
        )
        self._state._commit(merged)

    # -- read side -----------------------------------------------------------
    def read(self) -> DataFrame | None:
        """Live index rows ``(ns, id, version, <vec_col>, cell,
        codes)`` — tombstones hidden, ready for the probed-cell /
        ADC read path (the ``cells`` frame of the batch index
        layout, with codes pre-packed)."""
        return self._state.read()
