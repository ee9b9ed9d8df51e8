"""Config → logical-plan builder: the whole §3.1 lifecycle as ONE
declarative DataFrame composition.

The reference assembles its pipeline at config-load time into
goroutine pools connected by channels (routeOp monstache.go:3479-3488,
worker stages monstache.go:4471-4498, 5103-5131). Here the same config
surface compiles into a single Catalyst plan per output: filters →
drops → per-namespace mappers/filters → relate fan-out → routing →
outputs (state merge, time machine, patch history). Stage boundaries
become plan nodes inside one job instead of threads; Catalyst fuses
the whole map/filter chain into one codegen stage, and the only
shuffles are the ones the semantics require (relate joins, the state
merge key shuffle).

This module is the "per-namespace config routing" custom piece of
SURVEY.md §7.3 — plain DataFrame code, zero custom Catalyst rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monstache_spark.envelope import id_guard
from monstache_spark.operators import filters as Flt
from monstache_spark.operators.materialize import apply_drops, last_state
from monstache_spark.operators.relate import Relation, relate_chain
from monstache_spark.operators.routing import map_index
from monstache_spark.operators.timemachine import time_machine_rows
from monstache_spark.operators.udf import (
    NamespaceFilter,
    NamespaceMapper,
    apply_filters,
    apply_mappers,
)


@dataclass
class EnginePlan:
    """The config surface that shapes the DAG (TOML-name parity where
    the reference has one)."""

    namespace_regex: str | None = None            # F2  namespace-regex
    namespace_exclude_regex: str | None = None    # F3  namespace-exclude-regex
    dropped_databases: bool = True                # K6  dropped-databases
    dropped_collections: bool = True              # K6  dropped-collections
    mappers: list[NamespaceMapper] = field(default_factory=list)     # M1/M2 script/plugin
    filters: list[NamespaceFilter] = field(default_factory=list)     # F5/F6 filter
    relations: list[Relation] = field(default_factory=list)          # J1 relate
    index_overrides: dict[str, str] = field(default_factory=dict)    # M4 index-mapping
    time_machine: bool = False                    # K7 time-machine-namespaces
    history_overrides: dict[str, str] = field(default_factory=dict)
    time_machine_index_prefix: str = "log"        # time-machine-index-prefix
    # M5 index-oplog-time + field-name/format keys (configOptions
    # monstache.go:2888-2890): stamp each indexed body with the op's
    # oplog timestamp and a formatted date string
    index_oplog_time: bool = False                # index-oplog-time
    oplog_ts_field: str = "oplog_ts"              # oplog-ts-field-name
    oplog_date_field: str = "oplog_date"          # oplog-date-field-name
    oplog_date_format: str = "yyyy/MM/dd HH:mm:ss"  # oplog-date-field-format
    # F4 drop-scoped regexes (filterDropWithRegex monstache.go:1464-1472,
    # inverse monstache.go:1541-1549)
    drop_include_regex: str | None = None         # namespace-drop-regex
    drop_exclude_regex: str | None = None         # namespace-drop-exclude-regex
    # F7 worker sharding (consistent-hash filter monstache.go:4761-4769)
    workers: list[str] = field(default_factory=list)  # workers
    worker: str | None = None                     # worker
    # M9 patch history (addPatch monstache.go:3084-3158): namespaces
    # whose ops get a "patches" output
    enable_patches: bool = False                  # enable-patches
    patch_namespaces: list[str] = field(default_factory=list)  # patch-namespaces
    # S7 file enrichment: namespaces routed through the fetch stage
    # (addFileContent monstache.go:1405-1433) and its size gate
    file_namespaces: list[str] = field(default_factory=list)   # file-namespaces
    max_file_size: int = 0                        # max-file-size
    # M7: null out NaN/Inf payloads that cannot serialize to JSON
    # (fixPruneInvalidJSON monstache.go:878-950)
    prune_invalid_json: bool = False              # prune-invalid-json


def build_outputs(
    ops: DataFrame,
    plan: EnginePlan,
    collections: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Compile the plan against an envelope stream/batch. Returns the
    named output frames; nothing is executed until a sink pulls them
    (the same frames serve foreachBatch bodies and batch backfills)."""
    out = Flt.system_guards(ops)
    if plan.namespace_regex:
        out = Flt.include_namespaces(out, plan.namespace_regex)
    if plan.namespace_exclude_regex:
        out = Flt.exclude_namespaces(out, plan.namespace_exclude_regex)
    if plan.drop_include_regex:
        out = Flt.include_drop_namespaces(out, plan.drop_include_regex)
    if plan.drop_exclude_regex:
        out = Flt.exclude_drop_namespaces(out, plan.drop_exclude_regex)
    if plan.worker and plan.workers:
        # one engine instance keeps only its consistent-hash share of
        # DATA ops (the reference's worker filter lives in the data-op
        # filter array, monstache.go:4757-4769); drops are exempt so
        # every worker still propagates them to its share of keys
        w_idx, n_w = plan.workers.index(plan.worker), len(plan.workers)
        from pyspark.sql import functions as _F

        is_drop = _F.col("op").isin("drop", "dropDatabase")
        shard = Flt.worker_partition(out.filter(~is_drop), w_idx, n_w)
        out = shard.unionByName(out.filter(is_drop))
    out = id_guard(out)
    if plan.dropped_databases or plan.dropped_collections:
        out = apply_drops(
            out, databases=plan.dropped_databases, collections=plan.dropped_collections
        )
    out = apply_mappers(out, plan.mappers)
    out = apply_filters(out, plan.filters)
    if plan.prune_invalid_json:
        # M7 on the typed surface: NaN/±Inf can't serialize to JSON —
        # null them (fixPruneInvalidJSON monstache.go:878-950); the
        # nested/dynamic doc twin is functions.bson.normalize_doc
        for f in out.schema.fields:
            if f.dataType.simpleString() in ("double", "float"):
                c = F.col(f.name)
                out = out.withColumn(
                    f.name, F.when(F.isnan(c) | c.isin(float("inf"), float("-inf")), None).otherwise(c)
                )
    if plan.index_oplog_time:
        # prepareDataForIndexing stamps right before the bulk request
        # (monstache.go:2888-2890); here the stamp is a projection the
        # whole downstream chain (relate, routing, state) sees
        from monstache_spark.operators.routing import prepare_for_indexing

        out = prepare_for_indexing(
            out,
            ts_field=plan.oplog_ts_field,
            date_field=plan.oplog_date_field,
            date_format=plan.oplog_date_format,
        )

    outputs: dict[str, DataFrame] = {}
    if plan.relations and collections:
        # relations fire for ops in THEIR source namespace (processRelated
        # is keyed by op namespace, monstache.go:3419-3430) — one chain
        # per distinct source ns, in config order, so a config relating
        # two different source namespaces fires both.
        src_namespaces = list(dict.fromkeys(r.namespace for r in plan.relations))
        for ns in src_namespaces:
            start = out.filter(F.col("ns") == ns)
            hops = relate_chain(collections, start, plan.relations, start_ns=ns)
            prefix = "relate" if len(src_namespaces) == 1 else f"relate_{ns}"
            for i, hop in enumerate(hops):
                outputs[f"{prefix}_hop{i + 1}"] = hop

    routed = map_index(out, plan.index_overrides)
    outputs["ops"] = routed
    outputs["state"] = last_state(routed.drop("_index"))
    if plan.time_machine:
        outputs["time_machine"] = time_machine_rows(
            out, plan.history_overrides, prefix=plan.time_machine_index_prefix
        )
    if plan.enable_patches and plan.patch_namespaces:
        # M9: patch-namespaces get a version-ordered patch-history
        # output (addPatch monstache.go:3084-3158)
        from monstache_spark.operators.patches import merge_patch_history

        outputs["patches"] = merge_patch_history(
            out.filter(F.col("ns").isin(list(plan.patch_namespaces)))
        )
    if plan.file_namespaces:
        # S7: ops in file namespaces route to the fetch/enrichment stage
        # (operators.files.fetch_file_content / add_file_content bind a
        # path/content column and apply plan.max_file_size); emitting
        # the scoped frame mirrors the reference's separate fileC
        # channel (monstache.go:4471-4484)
        outputs["file_ops"] = out.filter(F.col("ns").isin(list(plan.file_namespaces)))
    return outputs
