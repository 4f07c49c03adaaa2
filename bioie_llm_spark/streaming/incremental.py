"""Incremental KG construction via Structured Streaming.

The reference is batch-only (SURVEY.md §2.9); its resume story is file-level
memoization. The engine adds a true incremental path: new corpus files
(= new Iceberg snapshots) land in a directory, a Structured Streaming job
picks up ONLY unseen files (source offsets tracked in the stream
checkpoint), runs the same extraction + linking operators, and appends to
the triple table. `Trigger.AvailableNow` drains everything pending then
stops — the batch-incremental execution the north_rule's
"checkpoint-resumable per snapshot" asks for, with exactly-once file
processing guaranteed by the checkpoint instead of hand-rolled markers.

Also provides a watermarked sliding-window aggregation over the events
table — the standard late-data-tolerant streaming aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extraction import extract_triples, link_entities

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def stream_extract_triples(
    spark: SparkSession,
    corpus_dir: str,
    gazetteer: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    miss_per_mille: int = 20,
    hallu_per_mille: int = 10,
):
    """Drain all unprocessed corpus parquet files through extraction +
    linking, appending linked triples to out_dir. Returns the finished
    StreamingQuery (already awaited). Re-running after new files arrive
    processes only the delta."""
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)
    raw = extract_triples(stream, miss_per_mille, hallu_per_mille)
    linked = link_entities(raw, gazetteer)  # stream-static broadcast join
    q = (
        linked.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return q


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Watermarked sliding-window count by event_type. Works on a streaming
    OR batch events frame (same plan either way — the batch run is the
    oracle for the streaming run in tests)."""
    # driver parquet stores ts as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stateful_user_totals(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (n_events, total_value) maintained in state across
    micro-batches, emitted (update mode) each time the user appears.
    Drains with AvailableNow, then returns the compacted totals.

    Sink shape (VERDICT r2 #9): update-mode emissions land in a PARQUET
    directory via foreachBatch (each micro-batch's updates appended
    executor-side — nothing accumulates on the driver, unlike the memory
    sink this replaces), and the final read compacts to the max emission
    per key — running counters are monotone, so max == last == the final
    running total. At scale the sink is a partitioned table and the
    compaction is one hash-agg; the state itself lives in the stream
    checkpoint either way. The batch groupBy remains the exact oracle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # default the emissions log NEXT TO the caller-owned checkpoint, not a
    # fresh mkdtemp per call (ADVICE r3): the two share a lifecycle anyway —
    # resuming from the checkpoint must also see the prior emissions for the
    # max-per-key compaction — and repeated runs no longer leak /tmp dirs.
    out_dir = out_dir or checkpoint_dir.rstrip("/") + "__emissions"
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # max-per-key compaction of the append log = final running totals
    return (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )


def run_windowed_events_stream(
    spark: SparkSession, events_dir: str, out_dir: str, checkpoint_dir: str
):
    """Streaming twin of windowed_event_counts over a parquet directory
    source; append mode requires the watermark to close windows."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return q


def stream_dedup_docs(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming exact dedup: as document files land, only the FIRST
    occurrence of each normalized-content key is emitted downstream —
    `dropDuplicates` on the md5 content key with its state held in the
    stream checkpoint, so dedup is exactly-once ACROSS micro-batches and
    restarts (a later batch re-delivering known content emits nothing).
    The batch twin is operators.dedup.exact_dedup keepers; the streaming
    form is what a continuously-ingesting corpus pipeline runs. Drained
    with AvailableNow; returns the finished query."""
    from ..operators.dedup import normalized_text

    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    keyed = stream.withColumn(
        "content_key", F.md5(normalized_text(F.col(text_col)))
    )
    deduped = keyed.dropDuplicates(["content_key"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return q


def stream_near_dup_docs(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket: int = 256,
) -> DataFrame:
    """Streaming NEAR-dup detection (late r7): the continuous-ingestion
    twin of the batch MinHash-LSH candidate path. Each arriving doc's
    signature is banded exactly like operators.dedup._minhash_banded (the
    same Catalyst expressions run on the stream); the stream groups on
    the (band, bucket) key and an ``applyInPandasWithState`` operator
    keeps the bucket's previously-seen (doc_id, signature) list in stream
    state — so a doc is flagged against EVERYTHING that ever streamed
    through the bucket, across micro-batches and restarts, without any
    growing driver-side structure. Per bucket the verdict is the best
    earlier match by MinHash-estimated Jaccard (component agreement
    fraction) at ``threshold``; per doc the final verdict compacts bucket
    verdicts to the single best (max estimate, then min partner id —
    deterministic at any batch split, since state insertion is sorted by
    doc id within a batch and earlier batches always precede later ones).

    State is capped at ``max_bucket`` entries per bucket (the batch
    path's bounded-bucket policy, minhash_dropped_buckets): a hot
    boilerplate bucket stops ACCUMULATING new reference docs but keeps
    flagging against the ones it holds, so state size is bounded by
    construction at 100 TB. Emissions append to parquet via foreachBatch;
    drains with AvailableNow and returns one row per doc:
    (doc_id, dup_of, est_jaccard) with NULLs for non-duplicates.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import _minhash_banded

    out_dir = out_dir or checkpoint_dir.rstrip("/") + "__neardup"
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    banded = _minhash_banded(stream, id_col, text_col, n_hashes, bands).select(
        "id", "sig", F.concat_ws("|", "band", "bucket").alias("bkey")
    )

    def update(key, pdfs, state: GroupState):
        ids, flat = state.get if state.exists else ([], [])
        ids = list(ids)
        flat = list(flat)
        out_ids, out_dup, out_est = [], [], []
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), [int(x) for x in s]) for i, s in zip(pdf["id"], pdf["sig"])
            )
        rows.sort(key=lambda r: r[0])  # deterministic within-batch order
        for did, sig in rows:
            best = None  # (est, -partner) maximized
            for j, pid in enumerate(ids):
                psig = flat[j * n_hashes : (j + 1) * n_hashes]
                est = sum(a == b for a, b in zip(sig, psig)) / n_hashes
                if est >= threshold and (best is None or (est, -pid) > best):
                    best = (est, -pid)
            out_ids.append(did)
            out_dup.append(None if best is None else -best[1])
            out_est.append(None if best is None else round(best[0], 4))
            if len(ids) < max_bucket:
                ids.append(did)
                flat.extend(sig)
        state.update((ids, flat))
        yield pd.DataFrame(
            {"doc_id": out_ids, "dup_of": out_dup, "est_jaccard": out_est}
        )

    verdicts = banded.groupBy("bkey").applyInPandasWithState(
        update,
        outputStructType="doc_id long, dup_of long, est_jaccard double",
        stateStructType="ids array<long>, sigs array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        verdicts.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # per-doc compaction: best bucket verdict = max est, then min partner
    log = spark.read.parquet(out_dir)
    w_best = (
        F.when(F.col("est_jaccard").isNotNull(), F.col("est_jaccard")).otherwise(-1.0)
    )
    ranked = log.withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                w_best.desc(), F.coalesce("dup_of", F.lit(2**62)).asc()
            )
        ),
    )
    return ranked.filter(F.col("__rk") == 1).drop("__rk")
