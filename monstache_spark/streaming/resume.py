"""Earliest-across-shards resume election (S6/§2.7).

On a cold start against a sharded cluster the reference must pick ONE
timestamp to begin reading every shard's oplog from, and it must be the
EARLIEST candidate so no shard's operations are skipped — with saved
monstache checkpoints outranking raw oplog heads
(`pkg/oplog/timestamp_resolver.go:34-109`):

* a candidate from a saved checkpoint (source "monstache") beats any
  candidate from an oplog head (source "oplog"), whatever the values;
* among candidates of the winning source, the smallest (t, i) wins;
* once every connection has reported, the election is FINAL — late or
  repeated offers get the already-elected timestamp.

Spark mapping: each shard source of the N-source union
(streaming/pipeline.py) contributes its checkpoint manifest ts (if any;
source "monstache") or its current oplog head (source "oplog"); the
elected timestamp becomes ``PipelineConfig.resume_from_ts`` /
``change.stream.startup.mode.timestamp`` for every source, so all
shards start from a common, no-gaps point. The election itself is
control-plane: N tuples, no Spark job.
"""

from __future__ import annotations

from dataclasses import dataclass

TS_SOURCE_MONSTACHE = "monstache"  # a saved engine checkpoint
TS_SOURCE_OPLOG = "oplog"  # a shard's current oplog head


@dataclass(frozen=True)
class BsonTs:
    """BSON timestamp ordered like primitive.CompareTimestamp: by
    seconds, then ordinal."""

    t: int
    i: int

    def key(self) -> tuple[int, int]:
        return (self.t, self.i)


class EarliestTimestampResolver:
    """Mirror of TimestampResolverEarliest
    (`pkg/oplog/timestamp_resolver.go:34-109`) minus the goroutine
    plumbing: offers are synchronous; ``offer`` returns the elected
    timestamp once all connections have reported, else None.
    """

    def __init__(self, connections_total: int):
        if connections_total < 1:
            raise ValueError("connections_total must be >= 1")
        self.connections_total = connections_total
        self.connections_queried = 0
        self._earliest: BsonTs | None = None
        self._earliest_source: str | None = None

    def _update(self, ts: BsonTs, source: str) -> None:
        # timestamp_resolver.go:92-109: oplog candidates never displace
        # a monstache incumbent; a monstache candidate always displaces
        # an oplog incumbent; otherwise smaller (t, i) wins
        if self._earliest_source == TS_SOURCE_MONSTACHE and source == TS_SOURCE_OPLOG:
            return
        if (
            self._earliest is None
            or (self._earliest_source == TS_SOURCE_OPLOG and source == TS_SOURCE_MONSTACHE)
            or ts.key() < self._earliest.key()
        ):
            self._earliest = ts
            self._earliest_source = source

    def offer(self, ts: BsonTs | tuple[int, int], source: str) -> BsonTs | None:
        """Report one connection's candidate. Returns the elected
        timestamp once the election is complete (this call or a prior
        one), else None. Offers after completion do not change the
        result (timestamp_resolver.go:57-68)."""
        if source not in (TS_SOURCE_MONSTACHE, TS_SOURCE_OPLOG):
            raise ValueError(f"unknown ts source: {source!r}")
        if not isinstance(ts, BsonTs):
            ts = BsonTs(*ts)
        if self.connections_queried >= self.connections_total:
            return self._earliest
        self.connections_queried += 1
        self._update(ts, source)
        if self.connections_queried == self.connections_total:
            return self._earliest
        return None

    @property
    def resolved(self) -> BsonTs | None:
        """The elected timestamp, or None while shards are missing."""
        if self.connections_queried >= self.connections_total:
            return self._earliest
        return None


def elect_resume_timestamp(candidates: list[tuple[tuple[int, int], str]]) -> BsonTs:
    """One-shot election over all shard candidates:
    ``[((t, i), source), ...]`` → elected BsonTs. The batch-shaped
    convenience over :class:`EarliestTimestampResolver` for callers
    that already hold every shard's manifest/oplog head."""
    r = EarliestTimestampResolver(len(candidates))
    out = None
    for ts, source in candidates:
        out = r.offer(ts, source)
    assert out is not None
    return out


def resume_timestamp_literal(ts: BsonTs) -> str:
    """Render the elected timestamp as the ``resume_from_ts`` string
    PipelineConfig consumes (UTC seconds; the ordinal rides in version
    ordering, not the coarse filter)."""
    from datetime import datetime, timezone

    return datetime.fromtimestamp(ts.t, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
