"""CLI: run the engine from a monstache-style TOML config.

    python -m monstache_spark --config engine.toml [--events PATH]
                              [--sf-dir DIR] [--batch] [--show N]

Reads the config (reference key names accepted — see config.py), runs
direct reads for any configured namespaces, then streams the events
source into the state table, and prints a summary. The deployment-
layer keys (mongo-url, elasticsearch-urls, …) are reported but not
dialed — sources here are the parquet harness; a cluster deployment
swaps the source/sink connectors, not the plan.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="monstache_spark")
    ap.add_argument("--config", required=True, help="TOML config (monstache key names)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--events", default=None, help="events parquet (default <sf-dir>/events.parquet)")
    ap.add_argument("--batch", action="store_true", help="batch mode (no streaming trigger)")
    ap.add_argument("--show", type=int, default=5, help="rows of state to print")
    ap.add_argument(
        "--print-connectors",
        action="store_true",
        help="print the Mongo source / ES sink option dicts this config binds "
        "to (connectors.py) and exit — the cluster-deployment contract",
    )
    args = ap.parse_args(argv)

    from monstache_spark.config import load_config
    from monstache_spark.session import get_spark
    from monstache_spark.sources.testdata import load_table
    from monstache_spark.streaming.pipeline import run_batch, run_stream

    cfg = load_config(args.config)
    if args.print_connectors:
        import json

        from monstache_spark import connectors as C

        print(
            json.dumps(
                {
                    "mongo_streams": C.mongo_stream_options(cfg),
                    "mongo_direct_reads": C.mongo_direct_read_options(cfg),
                    "es_sink": C.es_sink_options(cfg),
                    "es_deletes": C.es_delete_options(cfg),
                },
                indent=2,
                sort_keys=True,
            )
        )
        return 0
    if cfg.extras:
        print(f"deployment-layer keys (connector concern, not plan): {sorted(cfg.extras)}")

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("monstache_spark_cli")
    events_path = args.events or os.path.join(args.sf_dir, "events.parquet")

    if cfg.direct_read_namespaces or cfg.direct_read_include_regex:
        from monstache_spark.sources.directreads import DirectReadManifest, direct_read

        manifest = (
            DirectReadManifest(os.path.join(cfg.pipeline.state_dir, "directreads.json"))
            if cfg.direct_read_stateful
            else None
        )
        frames = direct_read(
            spark,
            args.sf_dir,
            namespaces=cfg.direct_read_namespaces or None,
            include_regex=cfg.direct_read_include_regex,
            exclude_regex=cfg.direct_read_exclude_regex,
            manifest=manifest,
            split=cfg.direct_read_split_max or None,
        )
        for ns, df in sorted(frames.items()):
            print(f"direct read {ns}: {df.count()} rows")
        if manifest is not None:
            manifest.mark_done(list(frames))

    if args.batch:
        state = run_batch(spark, load_table(spark, "events", args.sf_dir), cfg.pipeline)
    else:
        state = run_stream(spark, events_path, cfg.pipeline)
    out = state.read()
    n = out.count() if out is not None else 0
    print(f"state rows: {n}")
    if out is not None and args.show:
        for r in out.limit(args.show).collect():
            print(dict(r.asDict()))
    if not preexisting:  # don't tear down a caller-owned session
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
