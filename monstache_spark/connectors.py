"""Connector binding layer (S1/S2/K1): EngineConfig → option dicts for
the MongoDB Spark Connector source and the elasticsearch-hadoop sink.

The reference's entire job is Mongo→Elasticsearch: gtm options are
assembled in ``buildGtmOptions`` (monstache.go:4852-4898 — change
stream namespaces, resume timestamp, aggregation-pipeline pushdown,
direct-read namespaces/splits) and every bulk request carries id,
index, routing, pipeline and an EXTERNAL version (``doIndexing``
monstache.go:3160-3245, ``doDelete`` + ``tsVersion``
monstache.go:4053-4090).

This module is the Spark-first equivalent: pure, unit-testable
functions that translate a parsed monstache TOML (``EngineConfig``)
into the option dictionaries those two public connectors document —

* MongoDB Spark Connector v10+ (``format("mongodb")``): short-form
  option keys (``connection.uri``, ``database``, ``collection``,
  ``change.stream.*``, ``aggregation.pipeline``, ``partitioner.*``);
* elasticsearch-hadoop / elasticsearch-spark (``format("es")``):
  ``es.nodes``, ``es.mapping.id``, ``es.write.operation``,
  ``es.mapping.version`` + ``es.mapping.version.type=external``,
  ``es.mapping.routing``, ``es.batch.size.*``, ``es.ingest.pipeline``.

Nothing here opens a connection — the sandbox has no Mongo/ES — but a
real deployment does exactly:

    for opts in mongo_stream_options(cfg):
        src = spark.readStream.format("mongodb").options(**opts).load()
    ...
    df.write.format("es").options(**es_sink_options(cfg)).save(...)

and the engine's envelope/transform chain runs unchanged in between
(streams for multiple namespaces union into one envelope, the same
N-source union shape as the sharded reader, streaming/pipeline.py).
"""

from __future__ import annotations

import json
from urllib.parse import urlparse

from pyspark.sql import functions as F

from monstache_spark.config import EngineConfig

# connector option key prefixes are part of the two connectors' public
# surfaces; kept here as constants so tests and callers share one spelling
MONGO_FORMAT = "mongodb"
ES_FORMAT = "es"


def _extra(cfg: EngineConfig, key: str, default=None):
    return cfg.extras.get(key, default)


def change_stream_namespaces(cfg: EngineConfig) -> list[str]:
    """Resolve the change-stream namespace list with the reference's
    defaulting rules (monstache.go:2805-2809): with the oplog disabled
    and no explicit list, watch the whole deployment (``[""]``); with
    the oplog enabled the list is whatever the config names.

    ``""`` = deployment-wide watch, ``"db"`` = database watch,
    ``"db.coll"`` = collection watch — the same three scopes the
    MongoDB change-stream API exposes.
    """
    ns = list(_extra(cfg, "change-stream-namespaces", []) or [])
    enable_oplog = bool(_extra(cfg, "enable-oplog", False))
    if not enable_oplog and not ns:
        return [""]
    return ns


def _bson_ts_seconds(resume_from_ts) -> int | None:
    """resume-from-timestamp (BSON int64 seconds<<32, or ISO string
    already normalized by config.load_config) → epoch seconds."""
    if resume_from_ts is None:
        return None
    if isinstance(resume_from_ts, int):
        return resume_from_ts >> 32 if resume_from_ts > 1 << 32 else resume_from_ts
    import datetime

    return int(
        datetime.datetime.fromisoformat(str(resume_from_ts))
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
    )


def namespace_match_pipeline(cfg: EngineConfig) -> list[dict] | None:
    """Server-side $match pushdown for the change stream (S8): the
    include/exclude namespace regexes become one aggregation stage the
    server evaluates, so filtered ops never cross the network. The
    reference achieves this with a user-supplied pipeline function
    (buildPipe monstache.go:4336-4390); here the engine derives the
    stage from the config's own regexes — same effect, declarative.

    Change-stream events carry ``ns: {db, coll}``; the regex applies to
    the joined ``db.coll`` form, matched via ``$expr`` + ``$concat``.
    """
    clauses: list[dict] = []
    full_ns = {"$concat": ["$ns.db", ".", "$ns.coll"]}
    if cfg.pipeline.namespace_regex:
        clauses.append(
            {"$expr": {"$regexMatch": {"input": full_ns, "regex": cfg.pipeline.namespace_regex}}}
        )
    if cfg.pipeline.namespace_exclude_regex:
        clauses.append(
            {
                "$expr": {
                    "$not": [
                        {
                            "$regexMatch": {
                                "input": full_ns,
                                "regex": cfg.pipeline.namespace_exclude_regex,
                            }
                        }
                    ]
                }
            }
        )
    if not clauses:
        return None
    match = clauses[0] if len(clauses) == 1 else {"$and": clauses}
    return [{"$match": match}]


def mongo_stream_options(cfg: EngineConfig) -> list[dict[str, str]]:
    """One option dict per change-stream namespace for
    ``spark.readStream.format("mongodb")`` (S1/S2). Multiple
    namespaces → multiple streams union'd into one envelope (the
    engine's standard N-source union, streaming/pipeline.py) — the
    reference multiplexes them inside one gtm listener instead
    (buildGtmOptions monstache.go:4852-4898), but the resulting op
    stream is the same.
    """
    uri = _extra(cfg, "mongo-url", "mongodb://localhost:27017")
    base: dict[str, str] = {
        "connection.uri": uri,
        # full-document lookups so updates carry the post-image — the
        # engine's envelope wants whole docs, like the reference's
        # change-stream mode (gtm ChangeStreamNs + updateLookup)
        "change.stream.lookup.full.document": "updateLookup",
        "change.stream.publish.full.document.only": "false",
    }
    pipe = namespace_match_pipeline(cfg)
    if pipe is not None:
        base["aggregation.pipeline"] = json.dumps(pipe)
    secs = _bson_ts_seconds(cfg.pipeline.resume_from_ts)
    if secs is not None:
        # resume-from-timestamp (monstache.go:4679-4685): start the
        # change stream at an explicit operation time instead of "now"
        base["change.stream.startup.mode"] = "timestamp"
        base["change.stream.startup.mode.timestamp.start.at.operation.time"] = str(secs)
    out = []
    for ns in change_stream_namespaces(cfg):
        opts = dict(base)
        if ns:
            db, _, coll = ns.partition(".")
            opts["database"] = db
            if coll:
                opts["collection"] = coll
        out.append(opts)
    return out


def mongo_direct_read_options(cfg: EngineConfig) -> list[dict[str, str]]:
    """One batch-read option dict per direct-read namespace (S3).
    ``direct-read-split-max`` (collection splitting,
    monstache.go:4886) maps onto the connector's paginating
    partitioner bound — the same "split one collection into N parallel
    cursors" intent, expressed as a partitioner instead of splitVector
    calls.
    """
    uri = _extra(cfg, "mongo-url", "mongodb://localhost:27017")
    out = []
    for ns in cfg.direct_read_namespaces:
        db, _, coll = ns.partition(".")
        opts: dict[str, str] = {
            "connection.uri": uri,
            "database": db,
            "collection": coll,
        }
        if cfg.direct_read_split_max > 0:
            opts["partitioner"] = (
                "com.mongodb.spark.sql.connector.read.partitioner."
                "PaginateIntoPartitionsPartitioner"
            )
            opts["partitioner.options.max.number.of.partitions"] = str(
                cfg.direct_read_split_max
            )
        out.append(opts)
    return out


def _es_nodes(urls: list[str]) -> tuple[str, str | None, bool]:
    """elasticsearch-urls → (es.nodes host list, es.port, any-ssl)."""
    hosts, ports, ssl = [], set(), False
    for u in urls:
        p = urlparse(u)
        hosts.append(p.hostname or u)
        ports.add(p.port or (443 if p.scheme == "https" else 9200))
        ssl = ssl or p.scheme == "https"
    port = str(ports.pop()) if len(ports) == 1 else None
    return ",".join(hosts), port, ssl


def es_sink_options(cfg: EngineConfig, routed: bool = False) -> dict[str, str]:
    """The Elasticsearch bulk-sink option dict (K1/K2) for
    ``df.write.format("es")`` / ``writeStream.format("es")``.

    Binds the engine's output columns to the same bulk-request fields
    the reference sets per op (doIndexing monstache.go:3160-3245):

    * ``es.mapping.id`` ← the envelope ``id`` column (req.Id);
    * external versioning ← the envelope ``version`` column
      (req.Version + VersionType("external"), tsVersion
      monstache.go:4053-4063) — EXCEPT in index-as-update mode, which
      the reference also exempts from versioning (doc-as-upsert,
      monstache.go:3183-3207);
    * ``es.write.operation`` upsert/index mirroring IndexAsUpdate;
    * ``es.mapping.routing`` ← the ``_routing`` meta column when the
      caller routes (parseIndexMeta routing, operators/routing.py);
    * batch shaping ← elasticsearch-max-docs / -max-bytes
      (BulkProcessor flush thresholds, monstache.go:2780-2795);
    * ``es.ingest.pipeline`` ← the meta pipeline when one is set.

    The index name itself is NOT an option: the engine's ``_index``
    routing column is passed to ``.save()`` / the ``es.resource``
    pattern ``{_index}`` so one frame fans out across indexes, like
    the reference's per-op req.Index.
    """
    urls = list(_extra(cfg, "elasticsearch-urls", []) or ["http://localhost:9200"])
    nodes, port, ssl = _es_nodes(urls)
    opts: dict[str, str] = {
        "es.nodes": nodes,
        "es.nodes.wan.only": "true",
        "es.mapping.id": "id",
    }
    if port:
        opts["es.port"] = port
    if ssl:
        opts["es.net.ssl"] = "true"
    index_as_update = bool(_extra(cfg, "index-as-update", False))
    if index_as_update:
        opts["es.write.operation"] = "upsert"
    else:
        opts["es.write.operation"] = "index"
        opts["es.mapping.version"] = "version"
        opts["es.mapping.version.type"] = "external"
    if routed:
        opts["es.mapping.routing"] = "_routing"
    max_docs = int(_extra(cfg, "elasticsearch-max-docs", 0) or 0)
    if max_docs > 0:
        opts["es.batch.size.entries"] = str(max_docs)
    max_bytes = int(_extra(cfg, "elasticsearch-max-bytes", 0) or 0)
    if max_bytes > 0:
        opts["es.batch.size.bytes"] = str(max_bytes)
    pipeline = _extra(cfg, "elasticsearch-pipeline") or None
    if pipeline:
        opts["es.ingest.pipeline"] = str(pipeline)
    user = _extra(cfg, "elasticsearch-user") or None
    if user:
        opts["es.net.http.auth.user"] = str(user)
    password = _extra(cfg, "elasticsearch-password") or None
    if password:
        opts["es.net.http.auth.pass"] = str(password)
    pem = _extra(cfg, "elasticsearch-pem-file") or None
    if pem:
        opts["es.net.ssl.cert.allow.self.signed"] = "true"
        opts["es.net.ssl"] = "true"
    # elasticsearch-retry is a bool in the reference (retry failed bulk
    # requests, monstache.go:378); off → fail the batch immediately
    opts["es.batch.write.retry.count"] = (
        "3" if bool(_extra(cfg, "elasticsearch-retry", False)) else "0"
    )
    return opts


def change_events_to_envelope(events, doc_col: str = "fullDocument"):
    """Translate the MongoDB change-stream event shape (the schema the
    connector's stream emits: ``operationType``, ``ns {db, coll}``,
    ``documentKey``, ``clusterTime {t, i}``, ``fullDocument``) into the
    engine's CDC envelope — the glue between ``mongo_stream_options``
    and every downstream operator.

    Mirrors the reference's op construction from change events
    (gtm consumes the same five fields; op-type mapping and id
    stringification per monstache.go:815-840, 1043-1044):

    * insert → ``i``; update/replace → ``u`` (updateLookup gives the
      post-image either way); delete → ``d``; drop/dropDatabase pass
      through as control-plane ops; anything else (invalidate, rename)
      is dropped here and handled by the supervisor.
    * ``version`` = ``(clusterTime.t << 32) | clusterTime.i`` plus the
      +1/+2 update/delete bump — EXACTLY tsVersion
      (monstache.go:4053-4063), not the harness refinement, because a
      real cluster time already makes (t, i) unique per op.
    * the document rides as the JSON string in ``doc_col`` (dynamic-doc
      mode); type it downstream with ``from_json`` + a user schema.

    All JVM-side Column expressions — the translation fuses into the
    same codegen stage as the guard/filter chain behind it.
    """
    op = (
        F.when(F.col("operationType") == "insert", F.lit("i"))
        .when(F.col("operationType").isin("update", "replace"), F.lit("u"))
        .when(F.col("operationType") == "delete", F.lit("d"))
        .when(F.col("operationType") == "drop", F.lit("drop"))
        .when(F.col("operationType") == "dropDatabase", F.lit("dropDatabase"))
    )
    ns = F.when(
        F.col("ns.coll").isNotNull(),
        F.concat_ws(".", F.col("ns.db"), F.col("ns.coll")),
    ).otherwise(F.col("ns.db"))
    t = F.col("clusterTime.t").cast("long")
    i = F.col("clusterTime.i").cast("long")
    bump = (
        F.when(F.col("operationType").isin("update", "replace"), F.lit(1))
        .when(F.col("operationType") == "delete", F.lit(2))
        .otherwise(F.lit(0))
    )
    out = events.filter(op.isNotNull()).select(
        op.alias("op"),
        ns.alias("ns"),
        F.get_json_object(F.col("documentKey"), "$._id").alias("id"),
        F.timestamp_seconds(t).alias("ts"),
        i.alias("ts_ord"),
        F.lit("oplog").alias("source"),
        F.col(doc_col).alias("doc"),
        (t * F.lit(4294967296).cast("long") + i + bump).alias("version"),
    )
    return out


def parse_raw_change_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse RECORDED change-stream events — raw MongoDB extended-JSON
    lines exactly as ``collection.watch()`` emits them (one event per
    row in ``value_col``; see tests/fixtures/change_stream_events.jsonl
    and docker/test/record_fixtures.py) — into the canonical event
    frame ``change_events_to_envelope`` consumes.

    Extended-JSON normalization mirrors the reference's id handling
    (opIDToString, monstache.go:815-840):

    * ``{"$oid": h}`` document keys collapse to the hex string;
    * ``{"$numberLong"/"$numberInt": n}`` collapse to the digits;
    * ``{"$numberDouble": x}`` with integral x collapses to the
      integer repr (floats that are integral print as ints,
      monstache.go:823-835);
    * unquoted integral JSON doubles (``4.0``) collapse the same way —
      quoted "4.0" stays a string (detected from the raw
      ``documentKey`` bytes, where the quotes still exist);
    * the resume token (``_id._data``, saveTokens
      monstache.go:1658-1687) rides along as ``resume_token``.

    Everything is get_json_object/coalesce Column work — the parse
    fuses into one codegen stage with the envelope translation and
    filter chain behind it.
    """
    v = F.col(value_col)

    def g(path: str):
        return F.get_json_object(v, path)

    dk_raw = g("$.documentKey")
    quoted_id = dk_raw.rlike(r'"_id"\s*:\s*"')
    dbl = g("$.documentKey._id['$numberDouble']")
    dbl_d = dbl.cast("double")
    dbl_str = F.when(
        dbl_d.isNotNull() & (dbl_d == F.floor(dbl_d)), dbl_d.cast("long").cast("string")
    ).otherwise(dbl)
    plain = g("$.documentKey._id")
    plain_d = plain.cast("double")
    plain_str = F.when(
        ~quoted_id & plain_d.isNotNull() & (plain_d == F.floor(plain_d)) & plain.contains("."),
        plain_d.cast("long").cast("string"),
    ).otherwise(plain)
    id_str = F.coalesce(
        g("$.documentKey._id['$oid']"),
        g("$.documentKey._id['$numberLong']"),
        g("$.documentKey._id['$numberInt']"),
        dbl_str,
        plain_str,
    )
    return raw.select(
        g("$._id._data").alias("resume_token"),
        g("$.operationType").alias("operationType"),
        F.struct(g("$.ns.db").alias("db"), g("$.ns.coll").alias("coll")).alias("ns"),
        F.when(id_str.isNotNull(), F.to_json(F.struct(id_str.alias("_id")))).alias(
            "documentKey"
        ),
        F.struct(
            g("$.clusterTime['$timestamp'].t").cast("long").alias("t"),
            g("$.clusterTime['$timestamp'].i").cast("long").alias("i"),
        ).alias("clusterTime"),
        g("$.fullDocument").alias("fullDocument"),
        g("$.updateDescription").alias("updateDescription"),
    )


def resume_after_token(events: DataFrame, token: str | None) -> DataFrame:
    """Resume a recorded/replayed event frame strictly AFTER ``token``
    — the replay analogue of passing a saved resume token back to
    ``watch()`` (resumeAfter; token save/restore per saveTokens /
    readResumeTokens, monstache.go:1658-1687, 2204-2231). MongoDB
    resume tokens are KeyString-encoded, so byte (here: hex-string)
    order equals cluster-time order and a plain > comparison is the
    correct replay filter. ``None`` replays everything (cold start)."""
    if token is None:
        return events
    return events.filter(F.col("resume_token") > F.lit(token))


def es_delete_options(cfg: EngineConfig) -> dict[str, str]:
    """Delete-path options: the reference issues versioned bulk
    deletes (doDelete monstache.go:4065-4090, external version =
    tsVersion+2) unless index-as-update; stateless deletes can be
    scoped by ``delete-index-pattern`` (monstache.go:1848,4113-4139).
    elasticsearch-hadoop expresses deletes as
    ``es.write.operation=delete`` keyed the same way.
    """
    opts = es_sink_options(cfg)
    opts["es.write.operation"] = "delete"
    pattern = _extra(cfg, "delete-index-pattern") or None
    if pattern:
        opts["es.resource"] = str(pattern)
    return opts
