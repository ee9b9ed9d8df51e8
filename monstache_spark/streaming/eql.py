"""Streaming EQL sequence detection (applyInPandasWithState).

The batch operator (``operators/eql.eql_sequence``) answers "which
sequences exist"; security/observability deployments want the alert
WHEN THE CHAIN COMPLETES on the live stream — the monstache-style
continuous shape.  This module runs the SAME head-greedy contract
(each step extends with the earliest qualifying event strictly after
the previous, ties by id; maxspan bounds first→last) as a custom
stateful operator: per-key state holds the IN-FLIGHT chains, each
arriving event advances every pending chain whose predecessor it
qualifies for (under in-order processing the current event IS each
pending chain's earliest successor — which is what makes the stream
restatement-EQUAL to the batch operator), completed chains emit as
alert rows, and chains whose ``t1 + maxspan`` has passed the key's
processed frontier are pruned (they can never complete).

ORDERING CONTRACT: events must arrive in (ts, id) order per key —
micro-batches split along time, the CDC/append-log shape.  An
out-of-order source needs a watermark-buffered reorder in front (or
the batch operator over a sliding window); a late event here would
need already-emitted alerts retracted, which no append-mode stream
can do.  The gate feeds time-split batches and hash-matches the batch
oracle — restatement equality across the stream/batch boundary.

State is string-encoded chains per step (``array<string>``, each
``"us:id|us:id"``) — flat, Arrow-friendly, bounded by in-flight
chains per key within one maxspan window (the per-key working set a
state machine necessarily carries; ES's own EQL engine holds the
same).  Python is the sanctioned escape hatch here:
``applyInPandasWithState`` is THE Spark surface for custom stateful
operators, and the per-batch work is Arrow-batched per key group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from monstache_spark.operators.search import compile_bool_query

_PACK = 1_000_000_000


def _sequence_fn(n_steps: int, maxspan_us: int | None):
    import pandas as pd

    import numpy as np

    def fn(key, pdfs, state):
        pending = [[] for _ in range(n_steps + 1)]  # 1-based by step
        if state.exists:
            stored = state.get
            for i in range(1, n_steps):
                for enc in stored[i - 1] or []:
                    chain = [
                        (int(p.split(":")[0]), int(p.split(":")[1]))
                        for p in enc.split("|")
                    ]
                    pending[i].append(chain)
        # numpy sort + tolist instead of pd.concat + sort_values +
        # itertuples: the fn runs once per (key, micro-batch) — at
        # thousands of key groups the per-call pandas overhead was
        # comparable to the actual state-machine work (guide §4.2 —
        # vectorize the boundary).  (_us, _id, _step) is a total
        # order ((_us, _id) unique per event, _step in the key for
        # multi-step events), so any stable/unstable sort agrees
        # with the old sort_values.
        frames = list(pdfs)
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        us_a = pdf["_us"].to_numpy()
        id_a = pdf["_id"].to_numpy()
        st_a = pdf["_step"].to_numpy()
        order = np.lexsort((st_a, id_a, us_a))
        rows = zip(
            us_a[order].tolist(), id_a[order].tolist(), st_a[order].tolist()
        )
        out = []
        frontier = 0
        for us, eid, step in rows:
            frontier = max(frontier, us)
            pack = us * _PACK + eid
            if step > 1:
                advanced, rest = [], []
                for chain in pending[step - 1]:
                    last_us, last_id = chain[-1]
                    ok = last_us * _PACK + last_id < pack
                    if ok and maxspan_us is not None:
                        ok = us - chain[0][0] <= maxspan_us
                    (advanced if ok else rest).append(chain)
                pending[step - 1] = rest
                for chain in advanced:
                    nxt = chain + [(us, eid)]
                    if step == n_steps:
                        out.append(nxt)
                    else:
                        pending[step].append(nxt)
            if step == 1:
                if n_steps == 1:
                    out.append([(us, eid)])
                else:
                    pending[1].append([(us, eid)])
        if maxspan_us is not None:
            for i in range(1, n_steps):
                pending[i] = [
                    c for c in pending[i]
                    if c[0][0] + maxspan_us >= frontier
                ]
        if any(pending[i] for i in range(1, n_steps)):
            state.update(
                tuple(
                    [
                        "|".join(f"{us}:{eid}" for us, eid in c)
                        for c in pending[i]
                    ]
                    for i in range(1, n_steps)
                )
            )
        elif state.exists:
            # every chain completed or expired: drop the key's state
            # entirely so the store stays O(keys with in-flight
            # chains), not O(keys ever seen)
            state.remove()
        if not out:
            yield pd.DataFrame(
                columns=["k"]
                + [x for i in range(1, n_steps + 1) for x in (f"t{i}", f"id{i}")]
                + ["span_s"]
            )
            return
        data: dict = {"k": [key[0]] * len(out)}
        for i in range(1, n_steps + 1):
            # tz-aware UTC: unix_micros produced UTC epoch micros; a
            # NAIVE pandas timestamp would be reinterpreted in the
            # session timezone on the Arrow boundary, shifting every
            # alert when the session is not UTC
            data[f"t{i}"] = [
                pd.Timestamp(c[i - 1][0], unit="us", tz="UTC") for c in out
            ]
            data[f"id{i}"] = [c[i - 1][1] for c in out]
        data["span_s"] = [
            round((c[-1][0] - c[0][0]) / 1_000_000.0, 6) for c in out
        ]
        yield pd.DataFrame(data)

    return fn


def eql_sequence_stream(
    events_stream: DataFrame,
    steps: list[dict],
    by: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    maxspan_s: float | None = None,
    analyzer=None,
) -> DataFrame:
    """Wire the detector onto a stream: each step's bool-DSL filter
    tags its events (an event matching several steps rides once per
    step, exactly like the batch operator's independent step frames),
    the union groups by the ``by`` key, and the state machine runs per
    key.  Returns the completed-sequence alert stream
    ``(by, t1, id1, …, tN, idN, span_s)`` in append mode.
    """
    if len(steps) < 2:
        raise ValueError("a sequence needs at least 2 steps")
    # ONE scan per micro-batch: each event explodes into one row per
    # step it matches (NULL-compacted array of matched step tags) —
    # the union-of-filters form scanned the batch once PER STEP for
    # the same multiset of (k, _us, _id, _step) rows (guide §2.4;
    # the state fn re-sorts, so emission order is immaterial)
    tags = F.array_compact(
        F.array(
            *[
                F.when(compile_bool_query(step, analyzer=analyzer), F.lit(i))
                for i, step in enumerate(steps, start=1)
            ]
        )
    )
    tagged = events_stream.select(
        F.col(by).cast("string").alias("k"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(id_col).cast("long").alias("_id"),
        F.explode(tags).alias("_step"),
    )
    n = len(steps)
    out_schema = (
        "k string, "
        + ", ".join(f"t{i} timestamp, id{i} long" for i in range(1, n + 1))
        + ", span_s double"
    )
    state_schema = ", ".join(
        f"p{i} array<string>" for i in range(1, n)
    )
    maxspan_us = int(maxspan_s * 1_000_000) if maxspan_s is not None else None
    return tagged.groupBy("k").applyInPandasWithState(
        _sequence_fn(n, maxspan_us),
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
