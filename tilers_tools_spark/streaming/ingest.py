"""Incremental ingest — Structured Streaming surface (SURVEY.md §2.6).

The reference has no streaming; its only incremental notion is
noclobber-style resume, which the engine maps to checkpoint anti-joins
(plans/tile_pyramid.py). For continuous arrival of new image rows the
engine offers an `availableNow` micro-batch path: each batch runs the SAME
batch pipeline via foreachBatch, so semantics (bit-for-tile, lineage,
idempotent append) are identical to the batch engine — no separate
streaming operator implementations to keep in sync.

At scale: file-source listing is incremental; state is only the stream
checkpoint (no watermarks/stateful ops needed — every image row is
independent, the pipeline is embarrassingly row-parallel).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.render import render_pyramid


def ingest_available_now(
    spark: SparkSession,
    images_glob: str,
    images_schema: str,
    out_path: str,
    checkpoint_dir: str,
    overview_levels: int = 2,
) -> None:
    """Process all currently-available new image parquet files into tiles,
    then stop (availableNow trigger). Re-running picks up only new files.
    """
    stream = (
        spark.readStream.schema(images_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 8)
        .load(images_glob)
    )

    def process_batch(batch_df, batch_id: int):
        tiles = render_pyramid(batch_df, overview_levels=overview_levels)
        tiles.write.mode("append").partitionBy("z").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
