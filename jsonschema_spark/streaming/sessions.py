"""Streaming gap-based sessionization — the Structured Streaming twin of
``operators/temporal.py::sessionize``, built on Spark's NATIVE
``session_window`` aggregation: the state store does the incremental
session merging, the watermark closes sessions (a session can only be
emitted once no event could still extend it), and append mode emits each
closed session exactly once. State is bounded by the sessions still open
inside the watermark horizon — never by stream history.

Semantics vs the batch twin (pinned by tests/test_streaming_sessions.py):

- session membership and start are identical away from the exact-gap
  boundary; the native window treats an event at EXACTLY ``gap`` after
  the previous one as a new session (strict ``<`` merge), the batch twin
  merges it (``<=``) — pick gaps accordingly.
- the native window's ``end`` is ``last_event + gap`` (the time the
  session became unextendable), so ``end_us - gap·10⁶`` is the batch
  twin's last-event ``end_us``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark: str = "1 hour",
    agg_value: Column | None = None,
    decimals: int = 6,
) -> DataFrame:
    """(key, start_us, end_us, n_events, value_sum) per closed session —
    ``start_us`` is the first event, ``end_us`` the native
    ``last_event + gap`` close time, both exact epoch microseconds.
    Append-mode safe: attach to ``writeStream.outputMode("append")``;
    a session row appears once its close time falls behind the
    watermark. ``agg_value`` is an optional per-event metric summed per
    session.

    Scale shape: the session-window aggregate is one keyed shuffle
    (key + merging windows) handled by the streaming state store;
    per-trigger work is the micro-batch, state is open-sessions-only.
    A pathologically hot key serializes its merge the same way the
    batch window does — pre-split the key by a coarse time bucket when
    gap << bucket width.
    """
    ts = F.col(ts_col).cast("timestamp")
    return (
        stream_df.withColumn(ts_col, ts)
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(
                F.col(ts_col), f"{int(gap_seconds)} seconds"
            ).alias("_w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(
                    agg_value if agg_value is not None else F.lit(0.0)
                ),
                decimals,
            ).alias("value_sum"),
        )
        .select(
            key_col,
            F.unix_micros(F.col("_w.start")).alias("start_us"),
            F.unix_micros(F.col("_w.end")).alias("end_us"),
            "n_events",
            "value_sum",
        )
    )
