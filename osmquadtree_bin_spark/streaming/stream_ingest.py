"""Structured Streaming ingest of diff files (T1 as a stream).

The reference's replication loop (``osmquadtree-update.go:315-370``) polls a
diff directory and applies each state in order. The streaming rendition:
``readStream`` on the diff directory (file source tracks processed files in
its checkpoint — the S7 ledger role at the source level) → ``foreachBatch``
applying the same newest-wins merge as the batch path, so batch and streaming
share one merge implementation (T3) and the lineage ledger keeps recording
per-partition row counts.

``run_available`` uses ``trigger(availableNow=True)``: drain everything
pending, then stop — the batch-incremental duality Spark gives for free.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from .update import TiledStore


def run_available(
    spark: SparkSession,
    store: TiledStore,
    diff_dir: str,
    checkpoint_dir: str,
    schema: str,
) -> None:
    """Drain all pending diff files into the tiled store, exactly once per
    file (file-source checkpoint), states applied in ascending order within
    each micro-batch."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(diff_dir)
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        states = [r["state"] for r in batch_df.select("state").distinct().collect()]
        for state in sorted(states):
            diff = batch_df.filter(F.col("state") == state).drop("state")
            store.apply_diff(diff, state=int(state))

    (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
