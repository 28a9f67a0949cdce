"""Structured-Streaming ingest for transcript tables.

The reference is batch-only (SURVEY.md §2.11) — every corpus arrives as
static files. At 10^12-turn scale new conversations arrive continuously,
so the engine also exposes the same stage-1 logic as an incremental
pipeline:

* ``stream_transcripts``    — file-source readStream with the exact
  ``input_hint`` schema (new parquet files under a directory are the
  micro-batches; swap for Kafka/Iceberg-CDC source on a real cluster).
* ``streaming_mention_counts`` — watermarked tumbling-window aggregation
  of mention surface counts (the streaming analogue of the name-stats
  build; late turns beyond the watermark are dropped, counted by the
  sink's metrics).
* ``incremental_extract``   — foreachBatch ingest: per micro-batch run
  the stage-1 mention extraction (stateless column exprs — identical
  code path as batch) and append to the mentions table. Blocking/
  scoring/clustering then run as periodic batch jobs over the appended
  table — the standard lambda-architecture split for record linkage,
  because transitive clustering is a global fixpoint and does not
  stream.

Everything below is exercised with ``trigger(availableNow=True)`` in
tests — the bounded-drain mode that processes all pending files and
stops, which is also the right production shape for catch-up runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pboh_spark.normalize import extract_mentions

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def stream_transcripts(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript turns (one micro-batch per new
    parquet file set). Schema is fixed — no inference on the hot path."""
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def streaming_mention_counts(
    turns: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window mention-surface counts — incremental
    name statistics. Late rows beyond ``watermark`` are dropped (state
    stays bounded: #windows × #surfaces, not #turns)."""
    from pboh_spark.normalize import MENTION_RE

    mentions = turns.withWatermark("ts", watermark).select(
        F.col("ts"),
        F.explode(
            F.expr(f"regexp_extract_all(text, '{MENTION_RE}', 0)")
        ).alias("surface"),
    )
    return (
        mentions.withColumn("ngram", F.lower(F.col("surface")))
        .groupBy(F.window("ts", window).alias("w"), F.col("ngram"))
        .agg(F.count("*").alias("freq"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "ngram",
            "freq",
        )
    )


def incremental_extract(
    turns_stream: DataFrame,
    mentions_out: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """foreachBatch ingest: stage-1 mention extraction per micro-batch.
    Exactly-once: each batch overwrites its own ``batch_id=N`` partition
    directory, so a replayed micro-batch (failure between sink commit and
    streaming-checkpoint commit) rewrites the same files instead of
    appending duplicates. Returns the started StreamingQuery."""

    # layout guard: this sink writes batch_id=N partition dirs; a mentions
    # table from the old flat-append layout would make the root unreadable
    # (conflicting directory structures) — fail loudly with a migration
    # hint instead of corrupting it
    from pathlib import Path

    root = Path(mentions_out)
    if root.exists():
        stray = [
            p.name for p in root.iterdir()
            if not p.name.startswith(("batch_id=", "_", "."))
        ]
        if stray:
            raise ValueError(
                f"{mentions_out} contains non-partitioned files {stray[:3]}; "
                "this sink writes batch_id=N partitions — migrate the old "
                "flat layout (read + rewrite partitioned) first"
            )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_mentions(batch_df)
        out.write.mode("overwrite").parquet(
            f"{mentions_out}/batch_id={batch_id}"
        )

    writer = (
        turns_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_surface_stats(turns_stream: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): incremental
    surface-form dictionary. Per distinct mention surface the state holds
    the running occurrence total across ALL micro-batches; each batch
    emits the updated rows only (update mode).

    This is the streaming maintenance path for the surface-node table
    (pairs.surface_nodes) — THE bounded state of the 10^12-turn design:
    state size is the distinct-surface dictionary (~10^7-10^8 keys,
    language-bound), never the corpus. State lives in the streaming
    checkpoint, so totals survive query restarts (resumability is
    asserted in tests by draining two batches in two separate runs).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pboh_spark.normalize import MENTION_RE

    mentions = turns_stream.select(
        F.explode(
            F.expr(f"regexp_extract_all(text, '{MENTION_RE}', 0)")
        ).alias("surface")
    ).select(F.lower(F.col("surface")).alias("ngram"))

    def update(key, pdfs, state: GroupState):
        delta = 0
        for pdf in pdfs:
            delta += len(pdf)
        total = (state.get[0] if state.exists else 0) + delta
        state.update((total,))
        yield pd.DataFrame(
            {"ngram": [key[0]], "total": [total], "batch_delta": [delta]}
        )

    return mentions.groupBy("ngram").applyInPandasWithState(
        update,
        outputStructType="ngram string, total bigint, batch_delta bigint",
        stateStructType="total bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_surface_stats(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Drain pending files through the stateful surface-dictionary
    operator; each micro-batch's updated rows land in
    ``out_dir/batch_id=N`` (overwrite-per-batch = exactly-once, same
    layout as incremental_extract). Re-invoking with the same
    ``checkpoint_dir`` RESUMES the per-surface state — totals accumulate
    across runs (the memory sink can't recover a checkpoint; foreachBatch
    can). Current totals = latest batch row per surface."""
    stats = streaming_surface_stats(
        stream_transcripts(spark, input_path, max_files_per_trigger=1)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return (
        stats.writeStream.foreachBatch(process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_window_counts_to_memory(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    query_name: str = "mention_counts",
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Drain all pending files through the windowed agg into an in-memory
    sink (complete mode) — the test/inspection harness for the streaming
    path. Returns the started query; read results from
    ``spark.table(query_name)`` after awaitTermination."""
    counts = streaming_mention_counts(
        stream_transcripts(spark, input_path), window, watermark
    )
    return (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_doc_dedup(turns_stream: DataFrame) -> DataFrame:
    """Streamed EXACT DEDUP over document/turn content — the streaming
    counterpart of the batch dedup ladder's first rung
    (ops/dedup.exact_dedup); the reference is batch-only, so this is an
    ours-beyond-reference operator like the rest of streaming.py.

    Content key = md5 of the lowercased text (case-insensitive content
    identity, engine-portable for the DuckDB oracle). State per key is
    MONOTONE: (best representative = global min (conv_id, turn_idx) seen
    so far, running occurrence count). Each micro-batch that touches a
    key emits the key's updated row; the LATEST row per key therefore
    carries the GLOBAL minimum representative and the TOTAL duplicate
    count — values that do not depend on how rows split into
    micro-batches or arrive out of order. That split-invariance is the
    design rule of every driver-gated streaming operator here: it is
    what makes a streamed path oracle-checkable (and what a production
    pipeline wants anyway — a canonical keep-list must not depend on
    ingest batching).

    State size: one small row per DISTINCT content — the dedup
    dictionary bound, not the corpus (same scaling argument as the
    surface dictionary in streaming_surface_stats)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = turns_stream.select(
        F.md5(F.lower(F.col("text"))).alias("content_key"),
        "conv_id",
        "turn_idx",
    )

    def dedup(key, pdfs, state: GroupState):
        batch = pd.concat(list(pdfs), ignore_index=True)
        n = len(batch)
        batch = batch.sort_values(
            ["conv_id", "turn_idx"], kind="mergesort"
        )
        bc = batch.iloc[0]["conv_id"]
        bt = int(batch.iloc[0]["turn_idx"])
        if state.exists:
            pc, pt, pn = state.get
            if (pc, int(pt)) <= (bc, bt):
                bc, bt = pc, int(pt)
            n += int(pn)
        state.update((bc, bt, n))
        yield pd.DataFrame(
            {
                "content_key": [key[0]],
                "conv_id": [bc],
                "turn_idx": [bt],
                "n_dups": [n],
            }
        )

    return keyed.groupBy("content_key").applyInPandasWithState(
        dedup,
        outputStructType=(
            "content_key string, conv_id string, turn_idx int, n_dups bigint"
        ),
        stateStructType="best_conv string, best_turn int, n_seen bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Drain pending transcript files through the streamed exact-dedup
    operator; each micro-batch's updated keep-list rows land in
    ``out_dir/batch_id=N`` (overwrite-per-batch exactly-once, the same
    layout as the other foreachBatch sinks — resumable across restarts).
    The current keep-list = the LATEST batch row per content_key."""
    dedup = streaming_doc_dedup(
        stream_transcripts(spark, input_path, max_files_per_trigger=1)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return (
        dedup.writeStream.foreachBatch(process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
