"""Training-data export: deterministic shuffled shard writer.

The last stage of a corpus pipeline: a *global shuffle* of the training
rows (SGD wants neighboring rows decorrelated) split into a fixed number
of shard files consumable by a data loader.

Scale design: the shuffle is a HASH, not a sort — shard id and
within-shard order both derive from md5(seed || key), so the layout is
(a) deterministic for a given (seed, key set) regardless of input
partitioning or cluster size, (b) reproducible across engines, and
(c) one single shuffle (repartition on shard) with no global sort
barrier.  Each executor writes only its shards; nothing funnels through
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from snappydata_spark.functions.text import hash32


def shard_assignment(
    df: DataFrame, key_col: str, n_shards: int, seed: str = "shard~"
) -> DataFrame:
    """Attach `shard` (0..n_shards-1) and `shuffle_rank` columns — the
    deterministic shuffled layout, exposed as a transformation so it can
    be inspected/tested without writing."""
    h = hash32(F.col(key_col).cast("string"), seed)
    return df.withColumn("shard", (h % n_shards).cast("int")).withColumn(
        "shuffle_rank", h
    )


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: str = "shard~",
    fmt: str = "parquet",
) -> None:
    """Write `df` as `path/shard=K/` partitions, rows shuffled
    deterministically by md5(seed || key).  Re-running with the same seed
    and keys reproduces byte-identical shard membership."""
    out = shard_assignment(df, key_col, n_shards, seed)
    # key_col tie-break: shuffle_rank is a 32-bit hash (collisions are
    # certain beyond ~100k rows) and duplicate keys share a rank — tied
    # rows would otherwise emit in input-partition order, which varies
    # across runs and breaks the byte-identical contract
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_rank", key_col)
        .write.format(fmt)
        .partitionBy("shard")
        .mode("overwrite")
        .save(path)
    )


def export_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    payload_col: str,
    n_shards: int,
    meta_cols: tuple[str, ...] = (),
    ext: str = "bin",
    seed: str = "shard~",
) -> DataFrame:
    """WebDataset-style tar shard export — the standard container for
    multimodal training corpora (image/audio/video bytes + JSON
    metadata, consumed sequentially by data loaders): each shard is one
    tar holding `<key>.<ext>` (the binary payload column) and
    `<key>.json` (the metadata columns) per sample, samples in the
    deterministic md5-shuffled order of shard_assignment.

    Scale design: one shuffle (groupBy shard), then EACH TASK streams
    its own tar — samples never funnel through the driver, and tar
    append is O(payload) sequential IO, the access pattern object
    stores and data loaders both want.  Writes are atomic per shard
    (tmp file + rename).  Reproducibility: fixed tar metadata
    (mtime=0, uid/gid=0) + the deterministic order make re-exports
    BYTE-IDENTICAL for the same (seed, keys, payloads) — so shard
    checksums can gate pipeline re-runs.  `path` must be a filesystem
    every executor can reach (shared fs / fuse mount at cluster scale;
    an object-store variant would stream multipart uploads instead of
    rename).

    Returns a summary DataFrame (shard, n_samples, data_bytes,
    tar_sha256) — the manifest a training job records."""
    import hashlib
    import io
    import json
    import os
    import tarfile

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    assigned = shard_assignment(df, key_col, n_shards, seed).select(
        F.col(key_col).cast("string").alias("__key"),
        F.col(payload_col).alias("__payload"),
        *[F.col(c) for c in meta_cols],
        "shard",
        "shuffle_rank",
    )

    def write_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["shard", "n_samples", "data_bytes", "tar_sha256"]
            )
        sid = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["shuffle_rank", "__key"])
        final = os.path.join(path, f"shard-{sid:05d}.tar")
        tmp = final + ".tmp"
        data_bytes = 0
        with tarfile.open(tmp, "w") as tar:
            for row in pdf.to_dict("records"):
                key = row["__key"]
                payload = (
                    bytes(row["__payload"]) if row["__payload"] is not None else b""
                )
                # Scalar-safe null check: pd.isna on a list/ndarray meta
                # value returns an array (ambiguous truth value), so only
                # apply it to scalars and pass sequences through as-is.
                meta = {
                    c: (
                        row[c]
                        if isinstance(row[c], (list, tuple))
                        or hasattr(row[c], "__array__")
                        else (None if pd.isna(row[c]) else row[c])
                    )
                    for c in meta_cols
                }
                for name, blob in (
                    (f"{key}.{ext}", payload),
                    (
                        f"{key}.json",
                        json.dumps(meta, sort_keys=True, default=str).encode(),
                    ),
                ):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(blob)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(blob))
                    data_bytes += len(blob)
        os.replace(tmp, final)  # atomic per shard
        with open(final, "rb") as f:
            sha = hashlib.sha256(f.read()).hexdigest()
        return pd.DataFrame(
            {
                "shard": [sid],
                "n_samples": [len(pdf)],
                "data_bytes": [data_bytes],
                "tar_sha256": [sha],
            }
        )

    return assigned.groupBy("shard").applyInPandas(
        write_shard,
        "shard int, n_samples long, data_bytes long, tar_sha256 string",
    )


def read_webdataset(
    spark,
    path: str,
    ext: str = "bin",
) -> DataFrame:
    """Read WebDataset tar shards (export_webdataset's layout, or any
    webdataset-style tar with `<key>.<ext>` + `<key>.json` members)
    back into a DataFrame of (shard, key, payload, meta_json) — the
    re-import half of the multimodal round trip (reshard, filter, or
    join corpus metadata back onto sample bytes).

    Scale: Spark's binaryFile source assigns each tar to one task
    (shards are the parallelism unit, as in data loaders); the tar is
    parsed from bytes with the stdlib reader inside mapInPandas, so
    samples stream out as Arrow batches without driver involvement.
    Shards larger than a task's memory should use smaller n_shards at
    export time (the standard WebDataset practice)."""
    import io
    import os as _os
    import re
    import tarfile

    import pandas as pd

    files = spark.read.format("binaryFile").load(
        _os.path.join(path, "*.tar")
    ).select("path", "content")

    def parse(batches):
        for pdf in batches:
            for row in pdf.to_dict("records"):
                m = re.search(r"shard-(\d+)\.tar$", row["path"])
                sid = int(m.group(1)) if m else -1
                out = {"shard": [], "key": [], "payload": [], "meta_json": []}
                with tarfile.open(fileobj=io.BytesIO(row["content"])) as tar:
                    samples: dict[str, dict] = {}
                    order: list[str] = []
                    for mem in tar.getmembers():
                        # Foreign webdataset tars may carry directories,
                        # PAX headers, or extension-less members; skip
                        # anything that is not a plain `base.suffix` file.
                        if not mem.isfile() or "." not in mem.name:
                            continue
                        fobj = tar.extractfile(mem)
                        if fobj is None:
                            continue
                        base, suffix = mem.name.rsplit(".", 1)
                        if base not in samples:
                            samples[base] = {}
                            order.append(base)
                        samples[base][suffix] = fobj.read()
                    for base in order:
                        s = samples[base]
                        out["shard"].append(sid)
                        out["key"].append(base)
                        out["payload"].append(s.get(ext, b""))
                        out["meta_json"].append(
                            s.get("json", b"{}").decode("utf-8")
                        )
                yield pd.DataFrame(out)

    return files.mapInPandas(
        parse, "shard int, key string, payload binary, meta_json string"
    )
