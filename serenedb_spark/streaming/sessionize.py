"""Sessionization — batch + streaming shapes.

The reference has no stream processing (SURVEY §2.12); this is the
Spark-native extension slot. Two implementations of the same semantics
(30-min inactivity gap):

  * ``session_window_counts`` — the BUILT-IN ``F.session_window`` gap
    aggregation. Works identically over a batch DataFrame and a
    watermarked stream; this is the declarative path Catalyst can
    optimize, and the one the correctness gate checks against a lag-based
    SQL oracle (same-session ⇔ gap < threshold; a gap equal to the
    threshold starts a new session, matching Spark's [start, last+gap)
    window contract).

  * ``sessionize_stream_stateful`` — ``applyInPandasWithState`` with an
    event-time timeout: the custom-stateful-operator plumbing (state
    schema, timeout handling, Arrow batch shape) for session logic the
    built-in can't express (e.g. per-user dynamic gaps, session caps).
    State per key is one open session — bounded memory at any corpus
    size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP_MINUTES = 30


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session count + event count via the built-in gap window.
    On a streaming input, add .withWatermark('ts', ...) upstream and the
    same expression runs incrementally."""
    per_session = (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"),
             F.sum("n").cast("long").alias("n_events"))
        .orderBy("user_id")
    )


#: lag-based SQL stating the identical semantics (shared Spark/DuckDB text;
#: gap >= threshold starts a new session — session_window's contract)
SESSIONIZE_ORACLE_SQL = """
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
  count(*) AS n_events
FROM (
  SELECT user_id,
    CASE WHEN ts - lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) >= INTERVAL 30 MINUTE OR lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
) t
GROUP BY user_id
ORDER BY user_id
"""


def sessionize_stream_stateful(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
):
    """Custom stateful sessionizer over a STREAM: one open session per
    user held in state; a micro-batch extends it or closes it and emits.
    Emitted rows: (user_id, session_start, session_end, n_events) for
    CLOSED sessions (timeout = event-time watermark passing the gap).

    This is the applyInPandasWithState shape — per-group pandas batches +
    explicit state — kept deliberately small so it's a template for
    operators the built-in session_window can't express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp,"
        " n_events long"
    )
    state_schema = "start long, last long, n long"

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((user_id, start, last, n))
            state.remove()
        else:
            start, last, n = state.get if state.exists else (None, None, 0)
            # pdf_iter chunks carry no ordering guarantee — gather the
            # batch's timestamps for this key, THEN sweep in time order
            all_ts: list[int] = []
            for pdf in pdf_iter:
                all_ts.extend(
                    int(t) for t in
                    pd.to_datetime(pdf["ts"]).astype("int64") // 1000  # µs
                )
            for t in sorted(all_ts):
                if last is not None and t - last >= gap_us:
                    closed.append((user_id, start, last, n))
                    start, last, n = None, None, 0
                start = t if start is None else start
                last, n = t, n + 1
            if n:
                state.update((int(start), int(last), int(n)))
                state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60000)
        if not closed:
            return iter([])
        df = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end",
                             "n_events"]
        )
        for c in ("session_start", "session_end"):
            df[c] = pd.to_datetime(df[c], unit="us")
        return iter([df])

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )
