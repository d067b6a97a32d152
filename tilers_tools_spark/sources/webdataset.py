"""WebDataset-style training-export sink (task brief: large-scale
multimodal training pipelines). The webdataset convention (Aizman et
al., the `webdataset` library; used by LAION-scale image-text training)
stores samples as ADJACENT tar members sharing a basename —
``{key}.{ext}`` image bytes next to ``{key}.txt`` caption — across many
shard tars consumed in parallel by dataloaders.

Engine mapping:
* shard assignment = the engine's portable-md5 bucket
  (``operators.sampling`` mechanism): ``shard_id =
  int(md5(key + ':seed')[:8], 16) % n_shards`` — cross-engine
  reproducible (oracle gate `webdataset_shards`), stable under corpus
  growth (adding images never moves existing ones between shards).
* write = one narrow repartition on shard_id, then per-partition tar
  writing via stdlib tarfile in ``foreachPartition`` (no driver
  bottleneck; one executor writes a whole shard, the dataloader-side
  unit of parallelism). Member order inside a shard is sorted by key
  and all tar metadata is zeroed (mtime/uid/gid/mode fixed), so a
  re-export of the same corpus is BYTE-IDENTICAL — publishable
  incrementally by comparing shard digests.
* a shard holds its members in executor memory while the tar is
  written — size shards via n_shards so (corpus bytes / n_shards) fits
  an executor (same contract as any tar-shard writer).
"""

from __future__ import annotations

import glob
import io
import os
import tarfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT = {"jpeg": "jpg", "tiff": "tif"}


def shard_column(key: Column, n_shards: int, seed: int = 0) -> Column:
    """Portable shard id in [0, n_shards): int(md5(key+':seed')[:8], 16)
    % n_shards — the DuckDB mirror is ('0x' || substring(md5(..),1,8))
    ::BIGINT % n."""
    hex8 = F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % F.lit(n_shards)).cast("int")


def shard_manifest(
    images: DataFrame, n_shards: int, id_col: str = "image_id", seed: int = 0
) -> DataFrame:
    """Per-shard manifest (shard_id, n_members, keys_md5) where keys_md5
    digests the comma-joined key list in the exact member order the
    writer uses (sorted by key, binary collation both engines) — the
    distributed part of the export, cross-engine checkable."""
    key = F.col(id_col).cast("string")
    return (
        images.select(shard_column(key, n_shards, seed).alias("shard_id"), key.alias("_k"))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_members"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("_k")))).alias("keys_md5"),
        )
    )


def write_webdataset(
    images: DataFrame,
    out_dir: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str | None = "caption",
) -> str:
    """Export to ``out_dir/shard-%05d.tar`` webdataset shards. Returns
    out_dir. Empty shards produce no file. Deterministic: same corpus ->
    byte-identical tars (sorted members, zeroed tar metadata)."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [
        shard_column(F.col(id_col), n_shards, seed).alias("_shard"),
        F.col(id_col).cast("string").alias("_k"),
        F.col(bytes_col).alias("_b"),
        F.col(fmt_col).cast("string").alias("_f"),
    ]
    if caption_col is not None:
        cols.append(F.col(caption_col).cast("string").alias("_c"))
    kv = images.select(*cols).repartition(n_shards, "_shard")

    has_caption = caption_col is not None

    def write_part(rows):
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(int(r["_shard"]), []).append(r)
        for shard_id, members in by_shard.items():
            members.sort(key=lambda r: r["_k"])
            path = os.path.join(out_dir, f"shard-{shard_id:05d}.tar")
            with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tf:
                for r in members:
                    ext = _EXT.get(r["_f"], r["_f"])
                    payloads = [(f"{r['_k']}.{ext}", bytes(r["_b"]))]
                    if has_caption and r["_c"] is not None:
                        payloads.append((f"{r['_k']}.txt", r["_c"].encode("utf-8")))
                    for name, data in payloads:
                        ti = tarfile.TarInfo(name)
                        ti.size = len(data)
                        ti.mtime = 0
                        ti.uid = ti.gid = 0
                        ti.uname = ti.gname = ""
                        ti.mode = 0o644
                        tf.addfile(ti, io.BytesIO(data))

    kv.foreachPartition(write_part)
    return out_dir


_WDS_SCHEMA = "image_id string, bytes binary, fmt string, caption string"


def read_webdataset(spark: SparkSession, path: str, parallel: bool | None = None) -> DataFrame:
    """Shard dir (or one tar) -> (image_id, bytes, fmt, caption) DF.
    The shard list is distributed; each partition opens its own tars in
    ``mapInPandas`` (mirrors the sqlite container readers).
    Caption-less samples read back with caption null."""
    files = [path] if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "*.tar")))
    if not files:
        raise FileNotFoundError(f"no .tar under {path}")

    def _read_tar(f):
        samples: dict[str, dict] = {}
        with tarfile.open(f, "r") as tf:
            for m in tf.getmembers():
                stem, dot, ext = m.name.rpartition(".")
                data = tf.extractfile(m).read()
                s = samples.setdefault(stem, {"caption": None, "bytes": None, "fmt": None})
                if ext == "txt":
                    s["caption"] = data.decode("utf-8")
                else:
                    s["bytes"] = data
                    s["fmt"] = {"jpg": "jpeg", "tif": "tiff"}.get(ext, ext)
        return [
            (k, v["bytes"], v["fmt"], v["caption"]) for k, v in sorted(samples.items())
        ]

    if parallel is None:
        parallel = len(files) > 1
    if not parallel:
        rows = []
        for f in files:
            rows += _read_tar(f)
        return spark.createDataFrame(rows, _WDS_SCHEMA)

    def read_shards(batches):
        import pandas as pd

        for pdf in batches:
            for f in pdf["path"]:
                rows = _read_tar(f)
                if rows:
                    yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt", "caption"])

    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(len(files), "path")
    return fdf.mapInPandas(read_shards, _WDS_SCHEMA)
