"""Structured Streaming ingestion of transcript turns.

The reference is batch-only (SURVEY §2.9: its only incremental behavior is
model-checkpoint reuse). This module is our native streaming extension: a
stream of transcript turns (conv_id, turn_idx, role, text, tool, ts) is
ingested with a watermark, conversations whose turns have stopped arriving
are canonicalized per micro-batch, and each batch is appended to the
snapshot catalog so the downstream (batch) blocking/matching stages resume
from exactly what has been committed.

Design for 10^12-turn scale:
- the ONLY stateful operator is the watermarked dedup/aggregation keyed by
  conv_id — state size ∝ in-flight conversations, not corpus size;
- canonicalization inside foreachBatch reuses the identical batch operator
  (operators/canonicalize.canonicalize), so stream and batch outputs are
  byte-identical for the same closed conversation — the per-turn-equality
  invariant holds across both paths;
- sink = SnapshotCatalog commit per micro-batch (Iceberg-append analog),
  which makes restart/resume the same mechanism as batch resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def read_turn_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of transcript turns (the sandbox stand-in for a
    Kafka/Kinesis source — swap ``format``; the downstream plan is
    identical)."""
    reader = spark.readStream.format(fmt).schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def canonicalize_stream(
    turns: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked exactly-once turn dedup.

    Late turns beyond the watermark are dropped (the documented
    contract); duplicate (conv_id, turn_idx) retransmissions keep the
    first arrival. Output is still a stream of turns — the per-batch
    canonicalization happens in the sink (foreachBatch), where the batch
    operator can run verbatim.
    """
    return (
        turns.withWatermark("ts", watermark)
        .dropDuplicates(["conv_id", "turn_idx"])
    )


def stream_to_catalog(
    turns_stream: DataFrame,
    catalog,
    table: str = "stream_records",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Run the stream: per micro-batch, canonicalize the batch's turns with
    the BATCH operator and commit a snapshot + lineage rows.

    Returns the StreamingQuery (call .awaitTermination()). With
    ``trigger_available_now`` the query drains everything currently in the
    source and stops — the batch-parity mode used in tests.
    """
    from ertransfer_spark.operators.canonicalize import canonicalize

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        records = canonicalize(batch_df)
        n = records.count()
        catalog.commit(f"{table}_batch_{batch_id:05d}", records, meta={"batch_id": batch_id})
        catalog.append_lineage(
            [
                {
                    "stage": f"{table}_batch_{batch_id:05d}",
                    "run_id": f"stream-{batch_id}",
                    "wall_ms": 0,
                    "block_key": "",
                    "candidate_count": int(n),
                    "comparisons": 0,
                    "matches": 0,
                }
            ]
        )

    writer = turns_stream.writeStream.foreachBatch(commit_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_dedup_stream(
    turns_stream: DataFrame,
    catalog,
    corpus_table: str = "corpus_records",
    dup_table: str = "dup_pairs",
    min_jaccard: float = 0.6,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming near-dup detection against a growing corpus.

    Per micro-batch: canonicalize the batch's conversations, MinHash-join
    the NEW records against everything committed so far (plus themselves),
    append the new records to the corpus snapshot and the detected pairs to
    ``dup_table``. This is the streaming shape of web-scale ingest dedup:
    per-batch cost ∝ |batch| × collision rate, never |corpus|² — the
    committed corpus is only touched through the LSH bucket join.

    Dup pairs are oriented (existing_or_lower_id → new), deterministic
    across replays of the same batch sequence.
    """
    from ertransfer_spark.operators.blocking import minhash_lsh_join
    from ertransfer_spark.operators.canonicalize import canonicalize

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new = canonicalize(batch_df).select("conv_id", "agValue", "shingle_set")
        try:
            corpus = catalog.read(corpus_table).select("conv_id", "agValue", "shingle_set")
        except FileNotFoundError:
            corpus = None
        both = new if corpus is None else corpus.unionByName(new)
        pairs = minhash_lsh_join(
            both,
            new,
            id_col="conv_id",
            tokens_col="shingle_set",
            min_jaccard=min_jaccard,
            self_join=False,
        ).filter(F.col("a_id") < F.col("b_id"))
        # a new record also collides with itself via (corpus ∪ new) × new —
        # the a<b filter removes self-pairs and de-orients duplicates
        pairs = pairs.dropDuplicates(["a_id", "b_id"])
        n_new = new.count()
        n_pairs = pairs.count()
        catalog.commit(corpus_table, both, meta={"batch_id": batch_id})
        catalog.commit(f"{dup_table}_batch_{batch_id:05d}", pairs, meta={"batch_id": batch_id})
        catalog.append_lineage(
            [
                {
                    "stage": f"{dup_table}_batch_{batch_id:05d}",
                    "run_id": f"stream-{batch_id}",
                    "wall_ms": 0,
                    "block_key": "",
                    "candidate_count": int(n_new),
                    "comparisons": 0,
                    "matches": int(n_pairs),
                }
            ]
        )

    writer = turns_stream.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
