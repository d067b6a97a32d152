"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Registry lives in ``tilers_tools_spark/plans/queries.py`` — each entry
exercises an operator family from SURVEY.md §2 (tiling core, tile-set
transforms, spatial joins, training-data ops). EVERY entry carries a DuckDB
oracle: relational SQL where expressible, otherwise a golden-VALUES result
set precomputed WITHOUT the Spark engine (tools/make_golden_sql.py —
oracle/minitiler pixels, NumPy indexers, oracle/sparkhash XXH64 twin;
rendered by plans/golden_sql.py). Bit-level pixel correctness is further
pinned by pytest against oracle/minitiler
(tests/test_pipeline_vs_oracle.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from tilers_tools_spark.plans.queries import QUERIES  # noqa: E402


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the engine packages to executor Python workers via addPyFile —
    the caller's session may have neither our cwd nor PYTHONPATH, and
    pandas-UDF closures import `tilers_tools_spark` on the worker side."""
    sc = spark.sparkContext
    if getattr(sc, "_tilers_pyfiles_added", False):
        return
    import hashlib
    import zipfile

    # key the zip name on a content hash of the package sources so a stale
    # zip from a previous source version is never shipped to workers
    srcs = []
    for pkg in ("tilers_tools_spark", "fixtures", "oracle"):
        for dirpath, _d, files in os.walk(os.path.join(_REPO, pkg)):
            if "__pycache__" in dirpath:
                continue
            srcs += [os.path.join(dirpath, f) for f in files if f.endswith(".py")]
    srcs.sort()
    h = hashlib.md5()
    for full in srcs:
        h.update(full.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    zpath = os.path.join("/tmp", f"tilers_engine_pyfiles-{h.hexdigest()[:12]}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for full in srcs:
                z.write(full, os.path.relpath(full, _REPO))
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # e.g. re-registration after session restart
    sc._tilers_pyfiles_added = True


def _wrap(fn):
    def inner(spark: SparkSession, sf_dir: str):
        _ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return inner


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: derive event points, assign
    XYZ tiles at zooms 6/8/10 (native column tile math), index each tile
    with H3 + S2 (Arrow UDF indexers), aggregate tilemap metadata."""
    _ensure_workers_can_import(spark)
    sf_dir = "/root/testdata/sf0.001"
    from tilers_tools_spark.plans.queries import _merc_pts, _tiles_at
    from tilers_tools_spark.operators.spatial import _h3_cell_udf
    from tilers_tools_spark.plans.queries import _s2_cell_udf
    from tilers_tools_spark.functions import tilemath as tm

    mp = _merc_pts(spark, sf_dir)
    tiles = _tiles_at(mp, 6).unionByName(_tiles_at(mp, 8)).unionByName(_tiles_at(mp, 10))
    span = tm.resolution(F.col("z")) * F.lit(float(tm.TILE))
    tiles = tiles.withColumn("lon", tm.inv_merc_lon((F.col("x").cast("double") + 0.5) * span - F.lit(tm.ORIGIN)))
    tiles = tiles.withColumn("lat", tm.inv_merc_lat((F.col("y").cast("double") + 0.5) * span - F.lit(tm.ORIGIN)))
    tiles = tiles.withColumn("h3_cell", _h3_cell_udf(F.col("lat"), F.col("lon"), F.lit(7)))
    tiles = tiles.withColumn("s2_cell", _s2_cell_udf(F.col("lat"), F.col("lon"), F.lit(12)))
    return tiles.groupBy("z").agg(
        F.count("*").alias("n_points"),
        F.countDistinct("x", "y").alias("n_tiles"),
        F.countDistinct("h3_cell").alias("n_h3"),
        F.countDistinct("s2_cell").alias("n_s2"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return {name: _wrap(fn) for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for engine-only ops)."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
