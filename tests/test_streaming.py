"""Structured Streaming ingest (SURVEY.md §2.6): availableNow micro-batches
run the SAME batch pipeline; re-running processes only new files."""

import glob
import os

from fixtures import gen
from tilers_tools_spark.streaming import ingest

SCHEMA = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"


def _write_batch(dirpath, recs, name):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    pdf = pd.DataFrame(recs)[["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]]
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(dirpath, name))


def test_ingest_available_now_incremental(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "tiles")
    ck = str(tmp_path / "ck")
    recs = list(gen.gen_images(12, fmts=("raw",)))
    _write_batch(src, recs[:8], "b0.parquet")
    ingest.ingest_available_now(spark, src, SCHEMA, out, ck)
    t1 = spark.read.parquet(out)
    ids1 = {r["image_id"] for r in t1.select("image_id").distinct().collect()}
    assert ids1 == {r["image_id"] for r in recs[:8]}
    n1 = t1.count()

    # second arrival: only the new file is processed (stream checkpoint)
    _write_batch(src, recs[8:], "b1.parquet")
    ingest.ingest_available_now(spark, src, SCHEMA, out, ck)
    t2 = spark.read.parquet(out)
    ids2 = {r["image_id"] for r in t2.select("image_id").distinct().collect()}
    assert ids2 == {r["image_id"] for r in recs}
    # no duplicates for the first batch's tiles
    assert t2.select("image_id", "z", "x", "y").distinct().count() == t2.count()
    assert t2.count() > n1
