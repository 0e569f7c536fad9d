"""Structured Streaming pipelines.

The reference streams decoded deltas over SSE (crates/server/src/stream.rs)
— transport streaming of a per-request computation. The Spark-native
restatement is corpus-level: documents/events arrive continuously, the
engine maintains watermarked windowed aggregates and can run the extraction
stage itself on a stream (readStream → mapInPandas → writeStream).

Batch-equivalence: with Trigger.AvailableNow over static input, the final
result of a streaming aggregation equals the batch group-by — which is what
lets the driver's DuckDB oracle check a streaming query.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_counts_stream(
    spark: SparkSession,
    events_path: str,
    watermark: str = "1 hour",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Tumbling 1-hour windowed counts per event_type over a *stream* of
    events, with a watermark for late data; runs to completion with
    AvailableNow and returns the final (batch-equal) result.

    At production scale the source is a Kafka/files stream and the sink an
    Iceberg table in append mode per window close; here: memory sink.
    """
    schema = spark.read.parquet(events_path).schema
    # the file stream source takes a directory; a single-file input is
    # expressed as parent dir + glob (same as a real landing directory)
    if events_path.endswith(".parquet"):
        parent, fname = os.path.split(events_path)
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", fname)
            .parquet(parent)
        )
    else:
        stream = spark.readStream.schema(schema).parquet(events_path)
    # watermarks require TIMESTAMP (with local tz), parquet yields NTZ. The
    # watermark column is a cast copy; the GROUP key stays the original NTZ
    # hour so results are session-timezone-independent (an LTZ cast can
    # shift rows across hour buckets in DST-gap wall times).
    stream = stream.withColumn("ts_event", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts_event", watermark)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
    )
    sink = f"stream_result_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        query = query.option("checkpointLocation", checkpoint_dir)
    q = query.start()
    q.awaitTermination()
    return spark.table(sink)


def streaming_dedup(
    spark: SparkSession,
    docs_path: str,
    checkpoint_dir: str,
    key_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    cross-micro-batch exact dedup. Per group (e.g. per lang/host), the
    state carries the set of seen content fingerprints; only first-seen
    documents are emitted.

    This is the reference's mutable per-request KV-cache pattern
    (crates/core/src/cache.rs:358-401 — growable state keyed to a scope,
    cleared/carried by the runtime) re-expressed as Spark-managed keyed
    state: the store grows across batches, survives restarts via the
    streaming checkpoint, and the operator code stays a pure
    (state, batch) -> (state', output) function.
    """
    import hashlib

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(docs_path).schema

    def dedup_fn(key, pdfs, state: GroupState):
        seen = set(state.get[0].split("\x00")) if state.exists else set()
        out_ids, out_fps = [], []
        for pdf in pdfs:
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                fp = hashlib.md5(
                    " ".join(str(text).lower().split()).encode()
                ).hexdigest()
                if fp in seen:
                    continue
                seen.add(fp)
                out_ids.append(int(doc_id))
                out_fps.append(fp)
        state.update((("\x00".join(sorted(seen))),))
        yield pd.DataFrame(
            {"group_key": [key[0]] * len(out_ids), id_col: out_ids, "fp": out_fps}
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # force multi-batch processing
        .parquet(docs_path)
    )
    deduped = (
        stream.groupBy(F.col(key_col))
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=f"group_key string, {id_col} long, fp string",
            stateStructType="seen string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = f"dedup_result_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def extraction_stream(
    spark: SparkSession,
    docs_path: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """The extraction pipeline as a stream: new document files appearing
    under `docs_path` are extracted incrementally (exactly-once via the
    streaming checkpoint — the job-level resume story for continuous
    ingestion, complementing operators.checkpoint for batch backfills)."""
    from deepseek_ocr_api_rs_spark.operators.extract import (
        EXTRACT_OUTPUT_SCHEMA,
        _extract_batches,
    )

    schema = spark.read.parquet(docs_path).schema
    stream = spark.readStream.schema(schema).parquet(docs_path)
    extracted = stream.select("url", "warc_ts", "html", "lang").mapInPandas(
        _extract_batches, schema=EXTRACT_OUTPUT_SCHEMA
    )
    q = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
