"""Streaming deduplication for an always-on crawl ingest.

Beyond-the-reference layer (the reference has no streaming surface,
SURVEY.md §2.10): a training-data pipeline must drop re-crawled
duplicates ON THE STREAM, before paying encode + storage for them.
Two operators, both with bounded state:

- :func:`dedup_within_watermark` — the built-in path.  Exact key dedup
  with ``dropDuplicatesWithinWatermark``: state for a key is dropped
  once the watermark passes it, so state size is O(keys per watermark
  window), not O(all keys ever) — the property that lets this run
  forever at crawl scale.
- :func:`dup_counts_stateful` — a CUSTOM stateful operator via
  ``applyInPandasWithState`` (the escape hatch for semantics the
  built-ins can't express): per content key it maintains a seen-count
  across micro-batches and emits an updated (key, n_seen, n_dups) row
  whenever the key re-appears, with an event-time timeout that removes
  idle state after the TTL — duplicate *telemetry*, not just removal.

Dedup keys are content hashes (``F.sha2(text, 256)``), computed
map-side so only 64-byte digests — never the corpus — reach the
stateful exchange, matching the batch dedup operators in
``sparc.ops.dedup``.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F


def with_content_key(
    df: DataFrame, text_col: str = "text", key_col: str = "content_key"
) -> DataFrame:
    """Map-side content digest (JVM sha2, no UDF)."""
    return df.withColumn(key_col, F.sha2(F.col(text_col).cast("binary"), 256))


def dedup_within_watermark(
    stream: DataFrame,
    *,
    key_cols: list[str] | None = None,
    ts_col: str = "warc_ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """First occurrence of each key within the watermark window wins.

    State is dropped when the watermark passes a key's event time —
    re-crawls inside the window are removed, state stays bounded."""
    keys = key_cols or ["content_key"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def dup_counts_stateful(
    stream: DataFrame,
    *,
    key_col: str = "content_key",
    ts_col: str = "warc_ts",
    watermark: str = "30 minutes",
    state_ttl_ms: int = 60 * 60 * 1000,
) -> DataFrame:
    """Per-key duplicate telemetry across micro-batches.

    ``applyInPandasWithState`` keyed by the content digest: state is a
    single running count; each batch that touches a key emits
    (key, n_seen, n_dups).  An event-time timeout ``state_ttl_ms`` past
    the current watermark expires idle keys, so state is bounded by the
    distinct keys active within the TTL."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState) -> Iterator:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n_new = 0
        max_ts_ms = 0
        for pdf in pdfs:
            n_new += len(pdf)
            if len(pdf):
                max_ts_ms = max(
                    max_ts_ms, int(pdf[ts_col].max().value // 1_000_000)
                )
        (seen,) = state.get if state.exists else (0,)
        total = seen + n_new
        state.update((total,))
        # anchor the TTL at the batch's own event time, not the current
        # watermark: in the FIRST batch the watermark is still 0, and a
        # 0-anchored timeout would expire the instant it advances
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), max_ts_ms) + state_ttl_ms
        )
        yield pd.DataFrame(
            {
                "content_key": [key[0]],
                "n_seen": [total],
                "n_dups": [max(total - 1, 0)],
            }
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).alias("content_key"))
        .applyInPandasWithState(
            update,
            "content_key string, n_seen long, n_dups long",
            "n_seen long",
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
