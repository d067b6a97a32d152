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


DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(dirpath, rows, name):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(dirpath, name))


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """Cross-micro-batch stateful dedup: a duplicate arriving in a LATER
    batch is dropped (state store persists across availableNow restarts)."""
    from tilers_tools_spark.streaming import stateful

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ck = str(tmp_path / "docs_ck")
    _write_docs(src, [(0, "alpha beta", "en", "web", 10), (1, "gamma", "en", "web", 5)], "b0.parquet")

    def run_once():
        stream = spark.readStream.schema(DOCS_SCHEMA).format("parquet").load(src)
        deduped = stateful.streaming_exact_dedup(stream)
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got1 = spark.read.parquet(out).toPandas()
    assert set(got1.doc_id) == {0, 1}
    # batch 2: one true new doc, one exact dup of doc 0 (different doc_id)
    _write_docs(src, [(2, "alpha beta", "en", "mirror", 10), (3, "delta", "en", "web", 5)], "b1.parquet")
    run_once()
    got2 = spark.read.parquet(out).toPandas()
    assert set(got2.doc_id) == {0, 1, 3}  # dup content of doc 0 dropped


def test_running_source_stats_stateful(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: running per-source
    totals accumulate ACROSS micro-batches via GroupState."""
    from tilers_tools_spark.streaming import stateful

    src = str(tmp_path / "stats_in")
    ck = str(tmp_path / "stats_ck")
    _write_docs(src, [(0, "a b c", "en", "web", 5), (1, "d e", "en", "books", 3)], "b0.parquet")

    def run_once(qname):
        stream = spark.readStream.schema(DOCS_SCHEMA).format("parquet").load(src)
        stats = stateful.running_source_stats(stream)
        got = []

        def collect(batch_df, _bid):
            got.append(batch_df.toPandas())

        q = (
            stats.writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import pandas as _pd

        return _pd.concat(got, ignore_index=True)

    s1 = run_once("stats1").set_index("source")
    assert s1.loc["web", "n_docs"] == 1 and s1.loc["web", "n_tokens"] == 3
    assert s1.loc["books", "n_tokens"] == 2
    _write_docs(src, [(2, "f g h i", "en", "web", 7)], "b1.parquet")
    s2 = run_once("stats2").set_index("source")
    # state carried across the restart: web totals ACCUMULATE
    assert s2.loc["web", "n_docs"] == 2 and s2.loc["web", "n_tokens"] == 7


def test_session_windows_strict_merge_boundary(spark, tmp_path):
    """Spark session_window merge is INCLUSIVE (a new session starts only
    when the delta EXCEEDS the gap): events at t, t+gap+1 form TWO
    sessions; t, t+gap form ONE (touching extents join). Emitted window
    is [first, last + gap); an advancer flushes via the watermark."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tilers_tools_spark.streaming import stateful

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    BASE = 1_767_225_600
    GAP = 300

    def write(rows, name):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source", "event_secs"])
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(src, name))

    def run_once():
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, source string, event_secs long")
            .format("parquet").load(src)
            .withColumn("event_time",
                        __import__("pyspark.sql.functions", fromlist=["x"])
                        .timestamp_seconds(__import__("pyspark.sql.functions", fromlist=["x"]).col("event_secs")))
        )
        q = (stateful.session_doc_counts(stream, gap=f"{GAP} seconds")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    write([(0, "a", "split", BASE), (1, "b", "split", BASE + GAP + 1),   # > gap: 2 sessions
           (2, "c", "merge", BASE), (3, "d", "merge", BASE + GAP)],       # == gap: 1 session
          "b0.parquet")
    run_once()
    write([(9, "advancer", "adv", BASE + 10_000)], "b1.parquet")
    run_once()
    got = spark.read.parquet(out).toPandas()
    split = got[got.source == "split"].sort_values("window_start")
    merge = got[got.source == "merge"]
    assert len(split) == 2 and list(split.n_docs) == [1, 1]
    assert len(merge) == 1 and int(merge.n_docs.iloc[0]) == 2
    ws, we = int(merge.window_start.iloc[0].timestamp()), int(merge.window_end.iloc[0].timestamp())
    assert (ws, we) == (BASE, BASE + GAP + GAP)
    assert "adv" not in set(got.source)  # advancer's session still open


def test_stream_stream_join_boundaries_and_eviction(spark, tmp_path):
    """stream_stream_attribution: both range bounds INCLUSIVE (click at
    imp_time and at imp_time + 600 join; +601 does not), matches emit
    against state from a PREVIOUS run, and after watermark advance a
    late click finds its impression evicted -> no row."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from tilers_tools_spark.streaming import stateful

    src_i = str(tmp_path / "imp")
    src_c = str(tmp_path / "clk")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src_i)
    os.makedirs(src_c)
    BASE = 1_767_225_600

    def write(path, name, rows, cols):
        pdf = pd.DataFrame(rows, columns=cols)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(path, name))

    def run_once():
        imps = (
            spark.readStream.schema("imp_id long, usr string, imp_secs long")
            .format("parquet").load(src_i)
            .withColumn("imp_time", F.timestamp_seconds(F.col("imp_secs")))
            .drop("imp_secs")
        )
        clks = (
            spark.readStream.schema("click_id long, usr_c string, click_secs long")
            .format("parquet").load(src_c)
            .withColumn("click_time", F.timestamp_seconds(F.col("click_secs")))
            .drop("click_secs")
        )
        q = (stateful.stream_stream_attribution(imps, clks)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # run 1: impressions only -> nothing emits, state retained
    write(src_i, "b0.parquet", [(1, "u", BASE)], ["imp_id", "usr", "imp_secs"])
    run_once()
    assert spark.read.schema(
        "usr string, imp_id long, click_id long, imp_secs long, "
        "click_secs long, delay_s long"
    ).parquet(out).count() == 0

    # run 2: boundary clicks against run-1 state + advancers on both sides
    write(src_c, "b1.parquet",
          [(10, "u", BASE), (11, "u", BASE + 600), (12, "u", BASE + 601),
           (13, "u", BASE - 1), (9002, "__adv_c__", BASE + 120000)],
          ["click_id", "usr_c", "click_secs"])
    write(src_i, "b1.parquet", [(9001, "__adv_i__", BASE + 120000)],
          ["imp_id", "usr", "imp_secs"])
    run_once()
    got = {(r["click_id"], r["delay_s"])
           for r in spark.read.parquet(out).collect()}
    assert got == {(10, 0), (11, 600)}  # inclusive bounds; 601 and -1 excluded

    # run 3: late click — impression evicted by the advanced watermark
    write(src_c, "b2.parquet", [(99, "u", BASE + 60)],
          ["click_id", "usr_c", "click_secs"])
    run_once()
    assert spark.read.parquet(out).count() == 2
