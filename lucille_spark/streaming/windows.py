"""Event-time windowed aggregation with watermarks + custom stateful
streaming operators.

The reference's streaming story is per-document (Kafka in -> pipeline ->
indexer; core/Worker.java); event-time analytics over the stream is where
Structured Streaming's native machinery takes over (SURVEY.md §2.8):

- :func:`windowed_counts` — tumbling/sliding windows with a watermark:
  events later than the watermark are DROPPED, finalized windows are
  emitted exactly once in append mode. At 100 TB this is the shape for
  time-bucketed corpus statistics over a live ingest feed.
- :func:`session_windows` — gap-based session windows
  (``F.session_window``), the streaming twin of the batch
  ``events_sessionize`` gate entry.
- :func:`running_totals` — a custom stateful operator via
  ``applyInPandasWithState``: per-key running totals that survive across
  microbatches in the state store (the escape hatch for semantics the
  built-in windows can't express).

All three run on batch DataFrames too (windows/sessions ignore the
watermark there), which is how the deterministic tests pin semantics.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(df: DataFrame, ts_col: str, keys: Sequence[str],
                    window_duration: str, slide: Optional[str] = None,
                    watermark: str = "10 minutes",
                    agg_exprs: Optional[list] = None) -> DataFrame:
    """Watermarked per-window (+key) aggregation. Default agg is
    count(*) AS n_events; pass ``agg_exprs`` for more. In append output
    mode a window is emitted once the watermark passes its end, and rows
    arriving later than ``watermark`` behind the max seen event time are
    dropped by the state store."""
    w = F.window(F.col(ts_col), window_duration,
                 slide or window_duration)
    g = (df.withWatermark(ts_col, watermark)
         .groupBy(w.alias("win"), *[F.col(k) for k in keys]))
    out = g.agg(*(agg_exprs or [F.count("*").alias("n_events")]))
    return out.select(F.col("win.start").alias("window_start"),
                      F.col("win.end").alias("window_end"),
                      *keys,
                      *[c for c in out.columns if c not in ("win", *keys)])


def session_windows(df: DataFrame, ts_col: str, keys: Sequence[str],
                    gap: str, watermark: str = "10 minutes") -> DataFrame:
    """Gap-based session windows (events within ``gap`` of each other fuse
    into one session) — the streaming counterpart of the batch
    sessionize operator (gate `events_sessionize`)."""
    return (df.withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"),
                     *[F.col(k) for k in keys])
            .agg(F.count("*").alias("n_events"),
                 F.min(ts_col).alias("first_event"),
                 F.max(ts_col).alias("last_event"))
            .select(F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"),
                    *keys, "n_events", "first_event", "last_event"))


def running_totals(df: DataFrame, key_col: str) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    event totals accumulated across microbatches in the state store. Emits
    (key, total, batch_events) per key per microbatch in update mode —
    the pattern for any bespoke stateful semantics (dedupe-by-key,
    rate limiting, incremental counters) the built-in windows can't say."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs: Iterable[pd.DataFrame], state):
        total = state.get[0] if state.exists else 0
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total += n
        state.update((total,))
        yield pd.DataFrame([{"key": key[0], "total": total,
                             "batch_events": n}])

    return (df.groupBy(key_col)
            .applyInPandasWithState(
                fn,
                outputStructType="key string, total long, batch_events long",
                stateStructType="total long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
