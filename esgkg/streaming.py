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
        # at-least-once across stop/restart — observed duplicate urls)
        text = corpus.extract_text(batch_df)
        text.write.mode("overwrite").parquet(
            f"{catalog.path('stream_text')}/batch_id={batch_id}"
        )
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
    user within the stream (late data would need an event-time watermark
    variant — documented limitation of the processing-time design)."""
    import pandas as pd

    cols = ["user_id", "session_idx", "n_events", "duration_sec"]

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            last, start, n, idx = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, idx, n, last - start)], columns=cols
            )
            return
        if state.exists:
            last, start, n, idx = state.get
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
