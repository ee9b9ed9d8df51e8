"""Record live change-stream events as replayable fixtures.

Connects to a running replica set (the compose stack works:
``docker compose -f docker-compose.test.yml up mongo-0``), watches the
configured namespaces, and appends each event to the fixture file as
one canonical extended-JSON line — the exact input contract of
``connectors.parse_raw_change_events`` and
tests/fixtures/change_stream_events.jsonl.

    python record_fixtures.py --uri "mongodb://localhost:27017/?replicaSet=rs0" \
        --out ../../tests/fixtures/recorded.jsonl --seconds 60
"""

from __future__ import annotations

import argparse

from bson.json_util import CANONICAL_JSON_OPTIONS, dumps
from pymongo import MongoClient


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--uri", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seconds", type=int, default=60)
    args = ap.parse_args()

    client = MongoClient(args.uri)
    with client.watch(full_document="updateLookup",
                      max_await_time_ms=args.seconds * 1000) as stream, \
         open(args.out, "a") as out:
        for event in stream:
            out.write(dumps(event, json_options=CANONICAL_JSON_OPTIONS) + "\n")
            out.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
