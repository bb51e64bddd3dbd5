"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState — the "session window" the reference lacks
entirely (Maestro's Kafka path is stateless per-message routing,
IndexingMessagesStreamListener.java:52-90; SURVEY.md §2.11 forward-
looking family).

A session is a maximal run of a user's events where consecutive events
are ≤ gap_s apart — identical semantics to the batch sessionizer
(__spark_entry__ events_sessionize / its DuckDB lag-cumsum oracle), but
computed INCREMENTALLY over an unbounded stream:

  * state per user: (session_start_ms, last_event_ms, n_events, total)
    — O(1) per user, independent of stream length; the event-time
    TIMEOUT (watermark passing last_event + gap) both emits trailing
    sessions and evicts their state, so the state store is bounded by
    the number of users active within one watermark horizon.
  * a session CLOSED by a newer event (gap exceeded inside or across
    micro-batches) emits immediately in that batch; a session closed by
    silence emits when the watermark passes its gap deadline. Either
    way each session is emitted exactly once (append mode).
  * late events beyond the watermark are dropped by the watermark
    operator before they reach the state function (standard Structured
    Streaming contract); events late WITHIN the watermark are re-sorted
    inside each micro-batch by (ts, event_id), so ordering is exact per
    batch and monotone across batches for an in-order source.

Scale shape: one hash shuffle per micro-batch on user_id (the state-
store partitioning), Arrow-batched pandas per group — no per-row
Python. At 1000 executors the state store shards with the shuffle
partitions; skewed users cost one group's rows per batch, not a
replay of history.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, "
                  "session_value double")
_STATE_SCHEMA = "start_ms long, last_ms long, n long, total double"
_COLS = ["user_id", "session_start", "session_end", "n_events",
         "session_value"]


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.array([], dtype="int64"),
        "session_start": pd.array([], dtype="datetime64[ns]"),
        "session_end": pd.array([], dtype="datetime64[ns]"),
        "n_events": pd.array([], dtype="int64"),
        "session_value": pd.array([], dtype="float64"),
    })


def _rows_to_pdf(closed: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(closed, columns=_COLS)
    out["session_start"] = pd.to_datetime(out["session_start"], unit="ms")
    out["session_end"] = pd.to_datetime(out["session_end"], unit="ms")
    out["session_value"] = out["session_value"].round(4)
    return out


def sessionize_stream(events: DataFrame, gap_s: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """events: streaming frame with (event_id long, ts timestamp,
    user_id long, value double, ...). Returns the append-mode stream of
    CLOSED sessions (user_id, session_start, session_end, n_events,
    session_value)."""
    gap_ms = gap_s * 1000

    def fn(key, pdfs, state: GroupState):
        user = int(key[0])
        closed: list[tuple] = []
        if state.hasTimedOut:
            s0, l0, n0, tot = state.get
            closed.append((user, s0, l0, n0, tot))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            if len(rows):
                rows = rows.sort_values(["ts", "event_id"])
                ms = (rows["ts"].astype("int64") // 1_000_000).to_numpy()
                vals = rows["value"].to_numpy()
                if state.exists:
                    s0, l0, n0, tot = state.get
                else:
                    s0, l0, n0, tot = 0, 0, 0, 0.0
                for m, v in zip(ms, vals):
                    m = int(m)
                    if n0 and m - l0 > gap_ms:
                        closed.append((user, s0, l0, n0, tot))
                        n0, tot = 0, 0.0
                    if n0 == 0:
                        s0 = m
                    l0 = m
                    n0 += 1
                    tot += float(v)
                state.update((int(s0), int(l0), int(n0), float(tot)))
                # the gap deadline is the session's event-time timeout;
                # it must sit strictly above the current watermark or
                # registration throws (a deadline already passed fires
                # on the very next no-data batch either way)
                deadline = max(l0 + gap_ms,
                               state.getCurrentWatermarkMs() + 1)
                state.setTimeoutTimestamp(deadline)
        yield _rows_to_pdf(closed) if closed else _empty_out()

    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.EventTimeTimeout))


def run_session_stream(spark, events_dir: str, checkpoint_dir: str,
                       query_name: str = "sessions", gap_s: int = 1800,
                       watermark: str = "2 hours",
                       max_files_per_trigger: int = 1):
    """Drain available event files into an in-memory sink of closed
    sessions. max_files_per_trigger=1 keeps one file per micro-batch so
    cross-batch state transitions (gap closures and watermark timeouts
    spanning batches) actually exercise."""
    from maestro_spark.streaming.windows import EVENT_SCHEMA
    src = (spark.readStream.schema(EVENT_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .format("parquet").load(events_dir))
    q = (sessionize_stream(src, gap_s, watermark)
         .writeStream.format("memory").queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
