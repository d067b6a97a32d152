"""T3 — idempotent resume (SURVEY.md §5.2): kill between part commits,
rerun, table equals a fresh full run; no duplicate keys; lineage counters.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.plans import tile_pyramid as tp
from tilers_tools_spark.sources.catalog import Catalog


@pytest.fixture()
def images(spark, images_smoke):
    return spark.read.parquet(images_smoke)


def _tiles_key_hash(df):
    pdf = (
        df.select("image_id", "z", "x", "y", F.md5(F.col("tile")).alias("t"), "h3_cell", "caption")
        .orderBy("image_id", "z", "x", "y")
        .toPandas()
    )
    return pd.util.hash_pandas_object(pdf, index=False).sum()


def test_resume_idempotent(spark, images, tmp_path):
    cat1 = Catalog(spark, str(tmp_path / "cat1"))
    m = tp.run(spark, images, cat1, run_id="full", n_parts=4)
    assert m["parts_run"] == 4 and m["rows_in"] == 100 and m["tiles_out"] > 0
    full = cat1.read(tp.TILES_TABLE)
    n_full = full.count()
    assert full.select("image_id", "z", "x", "y").distinct().count() == n_full

    # simulated kill after 2 parts, then resume with same run_id
    cat2 = Catalog(spark, str(tmp_path / "cat2"))
    m1 = tp.run(spark, images, cat2, run_id="r1", n_parts=4, max_parts=2)
    assert m1["parts_run"] == 2
    m2 = tp.run(spark, images, cat2, run_id="r1", n_parts=4)
    assert m2["parts_run"] == 2  # only the remaining parts
    resumed = cat2.read(tp.TILES_TABLE)
    assert resumed.count() == n_full
    assert _tiles_key_hash(resumed) == _tiles_key_hash(full)

    # a third run is a no-op
    m3 = tp.run(spark, images, cat2, run_id="r1", n_parts=4)
    assert m3["parts_run"] == 0
    assert cat2.read(tp.TILES_TABLE).count() == n_full

    # lineage counters add up
    cp = cat2.read(tp.CHECKPOINT_TABLE)
    agg = cp.filter(F.col("status") == "done").agg(
        F.sum("rows_in").alias("ri"), F.sum("tiles_out").alias("to")
    ).collect()[0]
    assert agg["ri"] == 100 and agg["to"] == n_full


def test_crash_between_tiles_and_checkpoint_commits(spark, images, tmp_path, monkeypatch):
    """Kill INSIDE the part commit: tiles batch committed, checkpoint row
    not. The rerun must reconcile the orphan batch (rollback) and produce a
    table identical to a clean run — no duplicate (image_id,z,x,y)."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    real_append = Catalog.append

    # crash AFTER the tiles append, BEFORE the checkpoint append commits
    def crash_before_checkpoint(self, df, table, partition_by=(), tag=None):
        if table == tp.CHECKPOINT_TABLE:
            raise RuntimeError("simulated crash between tiles and checkpoint commits")
        real_append(self, df, table, partition_by=partition_by, tag=tag)

    monkeypatch.setattr(Catalog, "append", crash_before_checkpoint)
    with pytest.raises(RuntimeError):
        tp.run(spark, images, cat, run_id="r1", n_parts=4)
    monkeypatch.setattr(Catalog, "append", real_append)
    # orphan tiles batch is visible pre-reconcile
    assert cat.read(tp.TILES_TABLE).count() > 0
    m = tp.run(spark, images, cat, run_id="r1", n_parts=4)
    assert m["orphans_rolled_back"] >= 1 and m["parts_run"] == 4
    tiles = cat.read(tp.TILES_TABLE)
    n = tiles.count()
    assert tiles.select("image_id", "z", "x", "y").distinct().count() == n

    clean = Catalog(spark, str(tmp_path / "clean"))
    tp.run(spark, images, clean, run_id="full", n_parts=4)
    assert _tiles_key_hash(tiles) == _tiles_key_hash(clean.read(tp.TILES_TABLE))


def test_staged_part_scan_is_partition_pruned(spark, images, tmp_path):
    """stage_input writes the planned input partitioned by part_id once;
    each part job's parquet scan must then carry a part_id partition filter
    (pruned directories) instead of re-scanning the full input."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    planned = tp.plan_parts(images, 4)
    cat.append(planned, "_staged_images_x", partition_by=("part_id",))
    staged = cat.read("_staged_images_x")
    one = staged.filter(F.col("part_id") == 2).drop("part_id")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part_id" in plan.split("PartitionFilters")[1][:200], plan
    assert one.count() == planned.filter("part_id = 2").count()


def test_resume_with_different_n_parts_refused(spark, images, tmp_path):
    """'done' markers are only valid under the pmod modulus that wrote
    them: resuming a partially-done run_id with a different n_parts must
    be refused loudly (silently reusing them renders wrong/duplicate image
    subsets), and a completed run stays guarded too."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    tp.run(spark, images, cat, run_id="r1", n_parts=4, max_parts=2)  # partial
    with pytest.raises(ValueError, match="n_parts=4"):
        tp.run(spark, images, cat, run_id="r1", n_parts=8)
    # same modulus resumes fine and completes
    m = tp.run(spark, images, cat, run_id="r1", n_parts=4)
    assert m["parts_run"] == 2
    # completed run: a LARGER n_parts would re-render phantom parts -> still refused
    with pytest.raises(ValueError, match="n_parts=4"):
        tp.run(spark, images, cat, run_id="r1", n_parts=16)


def test_resume_without_plan_record_refused(spark, images, tmp_path):
    """Done markers WITHOUT a plan record (run predates the guard): the
    original modulus is unknowable, so ANY resume must be refused rather
    than backfilling the plan from the current call's n_parts."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    tp.run(spark, images, cat, run_id="r1", n_parts=4, max_parts=2)
    cat.drop("_run_plan_r1")  # simulate a pre-guard catalog
    with pytest.raises(ValueError, match="no plan record"):
        tp.run(spark, images, cat, run_id="r1", n_parts=8)
    with pytest.raises(ValueError, match="no plan record"):
        tp.run(spark, images, cat, run_id="r1", n_parts=4)  # even same value: unverifiable


def test_catalog_compact(spark, tmp_path):
    """Many small appends -> one compacted batch: identical rows, single
    manifest entry, folded dirs removed, appends continue to work after."""
    import os

    import pandas as _pd
    from pyspark.sql import functions as F

    from tilers_tools_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    for i in range(6):
        df = spark.createDataFrame(_pd.DataFrame({"k": range(i * 10, i * 10 + 10), "b": [i] * 10}))
        cat.append(df, "t", tag={"run_id": "r", "part_id": i})
    before = cat.read("t").orderBy("k").toPandas()
    assert len(cat._entries("t")) == 6
    assert cat.compact("t") == 6
    entries = cat._entries("t")
    assert len(entries) == 1 and entries[0]["tag"] is None
    after = cat.read("t").orderBy("k").toPandas()
    assert before.equals(after)
    tdir = str(tmp_path / "cat" / "t")
    # folded dirs are RETAINED (concurrent readers may still scan them) as
    # unreferenced orphans; gc() reclaims them once readers drain
    assert len([d for d in os.listdir(tdir) if d.startswith("batch-")]) == 7
    assert cat.gc("t") == 6
    assert sorted(d for d in os.listdir(tdir) if not d.startswith("_")) == [entries[0]["dir"]]
    assert cat.read("t").orderBy("k").toPandas().equals(before)
    # appends after compaction still read correctly
    cat.append(spark.createDataFrame(_pd.DataFrame({"k": [999], "b": [9]})), "t")
    assert cat.read("t").filter(F.col("k") == 999).count() == 1
    assert cat.compact("t") == 2  # compacting again folds the new pair
    assert cat.compact("t") == 0  # idempotent no-op on a single batch


def test_catalog_compact_preserves_partition_layout(spark, tmp_path):
    """compact() without arguments reuses the partition layout recorded at
    append time (a z-partitioned tile table must stay partition-prunable);
    mixed recorded layouts refuse."""
    import os

    import pandas as _pd

    from tilers_tools_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    for i in range(3):
        df = spark.createDataFrame(_pd.DataFrame({"k": range(i * 5, i * 5 + 5), "z": [i, i, i, 7, 7]}))
        cat.append(df, "t", partition_by=("z",))
    assert cat.compact("t") == 3
    entry = cat._entries("t")[0]
    assert entry["partition_by"] == ["z"]
    batch_dir = os.path.join(str(tmp_path / "cat" / "t"), entry["dir"])
    assert any(d.startswith("z=") for d in os.listdir(batch_dir))
    assert cat.read("t").count() == 15
    # mixed layouts -> explicit choice required
    cat.append(spark.createDataFrame(_pd.DataFrame({"k": [99], "z": [1]})), "t", partition_by=("k",))
    cat.append(spark.createDataFrame(_pd.DataFrame({"k": [98], "z": [1]})), "t", partition_by=("z",))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mixed partition layouts"):
        cat.compact("t")
    assert cat.compact("t", partition_by=("z",)) == 3


def test_catalog_gc_orphans(spark, tmp_path):
    """gc() removes batch/staging dirs the manifest doesn't reference
    (crash debris) and never touches live batches."""
    import os

    import pandas as _pd

    from tilers_tools_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.append(spark.createDataFrame(_pd.DataFrame({"k": [1, 2]})), "t")
    tdir = str(tmp_path / "cat" / "t")
    os.makedirs(os.path.join(tdir, "batch-deadbeef"))
    os.makedirs(os.path.join(tdir, "_tmp-crashed"))
    os.makedirs(os.path.join(tdir, "unrelated-dir"))  # not engine debris: kept
    assert cat.gc("t") == 2
    assert cat.read("t").count() == 2
    left = sorted(d for d in os.listdir(tdir) if os.path.isdir(os.path.join(tdir, d)))
    assert "unrelated-dir" in left and "batch-deadbeef" not in left
    assert cat.gc("t") == 0
