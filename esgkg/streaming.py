"""Structured Streaming ingest facade (SURVEY.md §2.10).

The reference is pure batch; the target's ``pages`` table is append-only, so
a streaming ingest is re-expressible as ``foreachBatch`` over the exact same
DataFrame functions used in batch — this module provides that facade:

    rate/file source → pages rows → foreachBatch(extract + triples → append)

Each micro-batch runs the shared kernel UDFs and appends to the catalog
tables, giving exactly-once-per-batch semantics via the checkpoint dir. At
cluster scale the source would be Kafka/files-on-S3; the transformation code
is identical (that is the point of the facade).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import session as _session
from .io import ParquetCatalog
from .stages import corpus, nlp


def rate_pages_stream(spark: SparkSession, rows_per_second: int = 100,
                      seed: int = 42) -> DataFrame:
    """A streaming DataFrame of synthetic pages driven by the rate source
    (each rate `value` becomes the page id — same bytes as batch synth)."""
    _session.ensure_shipped(spark)
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgkg import synth

        for pdf in batches:
            rows = [synth.make_page(int(v), seed) for v in pdf["value"]]
            yield pd.DataFrame(
                rows, columns=[f.name for f in corpus.PAGES_SCHEMA]
            )

    return rate.select("value").mapInPandas(gen, schema=corpus.PAGES_SCHEMA)


def start_ingest(spark: SparkSession, base_dir: str,
                 rows_per_second: int = 200, seed: int = 42,
                 trigger_seconds: int = 2):
    """Start the streaming ingest: pages → text + triples appended to the
    catalog per micro-batch. Returns the StreamingQuery (caller stops it)."""
    catalog = ParquetCatalog(base_dir)
    pages = rate_pages_stream(spark, rows_per_second, seed)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # exactly-once: a retried batch overwrites its own batch-id
        # partition instead of appending a duplicate (plain append would be
        # at-least-once across stop/restart — observed duplicate urls).
        # Single-pass extraction (round-3 verdict item 8): the text write is
        # the staging for the triples job — triples re-read the just-written
        # parquet (columnar, tiny per micro-batch) instead of re-running the
        # HTML→text kernel chain, so each python kernel executes exactly
        # once per batch; the two remaining jobs are one per sink.
        spark_b = batch_df.sparkSession
        text_path = f"{catalog.path('stream_text')}/batch_id={batch_id}"
        corpus.extract_text(batch_df).write.mode("overwrite").parquet(
            text_path
        )
        text = spark_b.read.parquet(text_path)
        triples = nlp.link_triples(nlp.extract_triples(text))
        triples.write.mode("overwrite").parquet(
            f"{catalog.path('stream_triples')}/batch_id={batch_id}"
        )

    return (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{base_dir}/_stream_checkpoint")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def windowed_page_counts(pages_stream: DataFrame,
                         window: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """Watermarked tumbling-window page counts by lang (the late-data-aware
    aggregation shape for streaming metrics)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count("*").alias("n_pages"))
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, duration_sec long"
)
SESSION_STATE_SCHEMA = (
    "last_tsec long, start_tsec long, n_events long, session_idx long"
)


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Stateful streaming sessionization — the custom stateful operator slot
    (SURVEY.md §2.10): gap-based sessions per user via
    ``applyInPandasWithState``. Emits a (user_id, session_idx, n_events,
    duration_sec) row whenever a session CLOSES — either a later event
    arrives past the gap, or the processing-time timeout fires with no new
    events. The batch analog (identical closed-session rows) is the
    lag-window sessionizer of __spark_entry__ q27, which is the
    oracle-checkable ground truth.

    State per user is O(1) (4 longs); event order is assumed in-order per
    user within the stream — out-of-order data needs the watermark variant
    `sessionize_stream_event_time` below, which trades O(session) state for
    late-data correctness."""
    import pandas as pd

    cols = ["user_id", "session_idx", "n_events", "duration_sec"]

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            last, start, n, idx = state.get
            if last < 0:
                # second consecutive quiet period: now really drop the state
                state.remove()
                return
            # emit the closed session but KEEP the running session_idx for a
            # grace period (10x gap), so a returning user's sessions continue
            # numbering instead of restarting at 1 (which would repeat
            # (user_id, session_idx) keys). A user silent longer than the
            # grace period still renumbers — the documented residual
            # divergence of bounded state. -1 is the no-open-session
            # sentinel (tsec is non-negative by schema contract); None
            # would NOT round-trip through the Arrow state serializer.
            state.update((-1, -1, 0, idx))
            state.setTimeoutDuration(gap_sec * 1000 * 10)
            yield pd.DataFrame(
                [(user_id, idx, n, last - start)], columns=cols
            )
            return
        if state.exists:
            last, start, n, idx = state.get
            if last < 0:
                last = start = None
                n = 0
        else:
            last = start = None
            n = 0
            idx = 0
        rows = []
        for pdf in pdfs:
            for tsec in pdf["tsec"]:
                tsec = int(tsec)
                if last is None:
                    idx += 1
                    start, n = tsec, 1
                elif tsec - last > gap_sec:
                    rows.append((user_id, idx, n, last - start))
                    idx += 1
                    start, n = tsec, 1
                else:
                    n += 1
                last = tsec
        state.update((last, start, n, idx))
        state.setTimeoutDuration(gap_sec * 1000)
        yield pd.DataFrame(rows, columns=cols)

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


EVENT_SESSION_STATE_SCHEMA = "tsecs array<long>, session_idx long"


def sessionize_stream_event_time(events: DataFrame, gap_sec: int = 1800,
                                 watermark_sec: int = 3600) -> DataFrame:
    """EVENT-time sessionization with late-data handling — the watermarked
    variant of `sessionize_stream` (whose processing-time design silently
    missessionizes out-of-order events).

    Events carry `tsec` (event-time seconds); the stream is watermarked on
    `timestamp_seconds(tsec)` with `watermark_sec` allowed lateness. Open
    sessions BUFFER their event times in state (bounded by session length,
    not stream length — the price of reordering tolerance), and a session is
    emitted only once the watermark passes its last event + gap: at that
    point no admissible late event can extend or bridge it, so the emitted
    row is identical to the batch oracle's (q27 semantics: tsec-sorted,
    gap-split). Eviction uses `EventTimeTimeout`, so state never outlives
    the watermark.

    Late events WITHIN the watermark land in the correct session (the pytest
    feeds one and checks the batch-oracle match where the processing-time
    variant provably diverges); events older than the watermark are dropped
    by Spark before reaching the operator — standard watermark semantics."""
    import pandas as pd

    cols = ["user_id", "session_idx", "n_events", "duration_sec"]
    events = events.withColumn(
        "ts", F.timestamp_seconds(F.col("tsec"))
    ).withWatermark("ts", f"{watermark_sec} seconds")

    def fn(key, pdfs, state):
        (user_id,) = key
        wm_sec = state.getCurrentWatermarkMs() / 1000.0
        if state.exists:
            buf0, idx = state.get
            buf = list(buf0 or [])
        else:
            buf, idx = [], 0
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(int(t) for t in pdf["tsec"])
        buf.sort()
        rows = []
        while buf:
            end_i = 1
            while end_i < len(buf) and buf[end_i] - buf[end_i - 1] <= gap_sec:
                end_i += 1
            last = buf[end_i - 1]
            # closed only when no admissible event can still extend it: any
            # future event has ts >= watermark > last + gap
            if wm_sec > last + gap_sec:
                idx += 1
                rows.append((user_id, idx, end_i, last - buf[0]))
                buf = buf[end_i:]
            else:
                break
        if buf:
            state.update((buf, idx))
            # fire once the watermark can close the trailing session
            state.setTimeoutTimestamp((buf[-1] + gap_sec) * 1000 + 1000)
        elif state.hasTimedOut:
            state.remove()
        elif state.exists or rows:
            # emitted everything this batch: keep the running idx one grace
            # period (same renumbering trade as the processing-time variant)
            state.update(([], idx))
            state.setTimeoutTimestamp(
                int(max(wm_sec, 0) * 1000) + gap_sec * 1000 * 10
            )
        yield pd.DataFrame(rows, columns=cols)

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        EVENT_SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
