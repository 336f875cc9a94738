"""Custom stateful streaming operator (SURVEY.md §2.10/§2.11):
gap-based sessionization with explicit per-key state via
``applyInPandasWithState``.

``F.session_window`` (streaming/ingest.py) covers the built-in case; this
operator is the template for semantics the built-ins can't express —
state is an explicit (start, last_seen, count) record per key, events
extend or close it, and only *closed* sessions are emitted (a session
closes when a later event arrives past the gap; the trailing open session
per key stays in state until more data or timeout).

Scale shape: state lives partitioned by key in the state store; each
micro-batch shuffles only its own events on key. Python is per-group over
Arrow batches — the same boundary the embedding stage uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

GAP_DEFAULT_MIN = 30.0


def stateful_sessions_stream(
    stream_df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = GAP_DEFAULT_MIN,
) -> DataFrame:
    """Emit closed sessions ``(key, session_start, session_end, n_events,
    duration_sec)`` from a keyed event stream.

    State per key: (start_ns, last_ns, n). An event within ``gap_minutes``
    of ``last`` extends the session; a later event closes it and starts a
    new one. Batch-equivalent semantics: operators.sessionize — every
    closed session here equals a batch session; the per-key trailing
    session is withheld (still open) and is stitched across micro-batch
    boundaries by the state.

    Ordering contract: events must arrive in non-decreasing event time
    per key ACROSS micro-batches (within a batch they are sorted here).
    That holds for time-ordered sources (file source oldest-first, Kafka
    per-key partitions); for out-of-order sources, pre-bucket by event
    time or use ``F.session_window`` + watermark (streaming/ingest.py),
    which trades custom state for built-in late-data handling.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = int(gap_minutes * 60 * 1_000_000_000)

    out_schema = (
        f"{key} long, session_start timestamp, session_end timestamp, "
        "n_events long, duration_sec double"
    )
    state_schema = "start_ns long, last_ns long, n long"

    def fn(key_tuple, pdf_iter, state: "GroupState"):
        (kval,) = key_tuple
        start_ns, last_ns, n = state.get if state.exists else (None, None, 0)

        parts = [pdf[ts_col] for pdf in pdf_iter]
        if not parts:
            return
        ts = pd.concat(parts).sort_values().astype("int64")  # ns since epoch

        closed: list[tuple[int, int, int]] = []
        for t in ts:
            t = int(t)
            if start_ns is None:
                start_ns, last_ns, n = t, t, 1
            elif t - last_ns > gap_ns:
                closed.append((start_ns, last_ns, n))
                start_ns, last_ns, n = t, t, 1
            else:
                last_ns, n = t, n + 1
        if start_ns is not None:  # all-empty batch: don't write null state
            state.update((start_ns, last_ns, n))

        if closed:
            yield pd.DataFrame(
                {
                    key: [kval] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed]),
                    "session_end": pd.to_datetime([c[1] for c in closed]),
                    "n_events": [c[2] for c in closed],
                    "duration_sec": [(c[1] - c[0]) / 1e9 for c in closed],
                }
            )

    from pyspark.sql import functions as F

    return (
        # cast: NTZ→TIMESTAMP re-tag (UTC session) so Arrow hands the UDF
        # the same ns-since-epoch values for either input flavor
        stream_df.select(key, F.col(ts_col).cast("timestamp").alias(ts_col))
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
