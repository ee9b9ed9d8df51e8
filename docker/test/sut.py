"""System-under-test driver: the write→sync→poll loop of the
reference's Go suite (monstache_test.go:24-42) in miniature.

Writes documents to MongoDB, waits for the engine to sync them into
Elasticsearch, verifies content/updates/deletes, exits non-zero on any
divergence (run-tests.sh propagates the code)."""

from __future__ import annotations

import os
import sys
import time

import requests
from pymongo import MongoClient

MONGO = os.environ.get("MONGO_DB_URL", "mongodb://localhost:27017/?replicaSet=rs0")
ES = os.environ.get("ELASTIC_SEARCH_URL", "http://localhost:9200")
DELAY = int(os.environ.get("SYNC_DELAY_SECONDS", "30"))
INDEX = "test.test"


def poll(pred, timeout=DELAY, interval=1.0, what=""):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            if pred():
                return True
        except requests.RequestException:
            pass
        time.sleep(interval)
    print(f"TIMEOUT waiting for: {what}", file=sys.stderr)
    return False


def es_get(doc_id):
    r = requests.get(f"{ES}/{INDEX}/_doc/{doc_id}")
    return r.json() if r.status_code == 200 else None


def main() -> int:
    client = MongoClient(MONGO)
    coll = client.test.test
    coll.drop()

    # insert → appears
    coll.insert_one({"_id": "e2e-1", "name": "ann", "score": 5})
    if not poll(lambda: (es_get("e2e-1") or {}).get("_source", {}).get("name") == "ann",
                what="insert sync"):
        return 1

    # update (post-image via updateLookup) → new content wins
    coll.update_one({"_id": "e2e-1"}, {"$set": {"score": 6}})
    if not poll(lambda: (es_get("e2e-1") or {}).get("_source", {}).get("score") == 6,
                what="update sync"):
        return 1

    # delete → gone (versioned delete beats any stale replay)
    coll.delete_one({"_id": "e2e-1"})
    if not poll(lambda: es_get("e2e-1") is None, what="delete sync"):
        return 1

    print("live e2e: all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
