"""Table catalog abstraction — Iceberg when the runtime jar is present,
transparent Parquet-directory fallback otherwise (SURVEY.md §7 [ENV]: no
iceberg-spark-runtime jar on this box; BASELINE.json:14 mandates Iceberg in
production).

The fallback preserves the two Iceberg semantics the engine relies on:
* atomic append per batch — staged `_tmp-<uuid>` dir renamed into place,
  readers list only committed dirs via the JSON manifest;
* snapshot read — a read lists the manifest first, so a concurrent
  half-written append is invisible.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j returns a silent JavaPackage for unknown attrs, so probe the
        # classloader explicitly
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


class Catalog:
    """Minimal write/read/append facade over Iceberg-or-Parquet."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.use_iceberg = iceberg_available(spark)

    # -- fallback manifest helpers ------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifest.json")

    def _commits(self, table: str) -> list[str]:
        mf = self._manifest(table)
        if not os.path.exists(mf):
            return []
        with open(mf) as f:
            return json.load(f)["commits"]

    def _commit(self, table: str, batch_dir: str):
        mf = self._manifest(table)
        commits = self._commits(table)
        commits.append(batch_dir)
        tmp = mf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"commits": commits}, f)
        os.replace(tmp, mf)  # atomic on POSIX

    # -- public API ----------------------------------------------------
    def append(self, df: DataFrame, table: str, partition_by: tuple[str, ...] = ()) -> None:
        if self.use_iceberg:
            w = df.writeTo(table)
            w.append()
            return
        tdir = self._tdir(table)
        os.makedirs(tdir, exist_ok=True)
        batch = f"batch-{uuid.uuid4().hex}"
        staging = os.path.join(tdir, f"_tmp-{batch}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        final = os.path.join(tdir, batch)
        os.replace(staging, final)
        self._commit(table, batch)

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(table)
        commits = self._commits(table)
        if not commits:
            raise FileNotFoundError(f"table {table} has no commits")
        from functools import reduce

        from pyspark.sql import DataFrame as _DF

        # each batch dir is its own partition-discovery root (the table dir
        # mixes batch-* dirs, which confuses a single basePath scan)
        dfs = [
            self.spark.read.option("basePath", os.path.join(self._tdir(table), c)).parquet(
                os.path.join(self._tdir(table), c)
            )
            for c in commits
        ]
        return reduce(_DF.unionByName, dfs)

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(table)
        return bool(self._commits(table))

    def drop(self, table: str) -> None:
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {table}")
            return
        shutil.rmtree(self._tdir(table), ignore_errors=True)
