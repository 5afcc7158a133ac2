"""WebDataset tar-shard export: structure, determinism, reproducibility.

The multimodal training-data handoff: binary payload + JSON metadata per
sample, packed into per-shard tars in a deterministic shuffled order.
"""

import hashlib
import json
import os
import tarfile
import tempfile

from pyspark.sql import functions as F

from snappydata_spark.export import export_webdataset


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.encode(F.md5(F.col("id").cast("string")), "utf-8").alias("payload"),
        (F.col("id") % 3).alias("label"),
        F.concat(F.lit("src"), (F.col("id") % 5).cast("string")).alias("source"),
    )


def test_webdataset_structure_and_counts(spark):
    out = tempfile.mkdtemp(prefix="wds_")
    summary = export_webdataset(
        _docs(spark),
        out,
        key_col="doc_id",
        payload_col="payload",
        n_shards=4,
        meta_cols=("label", "source"),
        ext="txt",
    ).collect()
    assert sum(r.n_samples for r in summary) == 200
    assert {r.shard for r in summary} <= set(range(4))
    seen = 0
    for r in summary:
        p = os.path.join(out, f"shard-{r.shard:05d}.tar")
        with tarfile.open(p) as tar:
            members = tar.getmembers()
            # two entries per sample: payload + json, adjacent
            assert len(members) == 2 * r.n_samples
            for i in range(0, len(members), 2):
                base = members[i].name.rsplit(".", 1)[0]
                assert members[i].name == f"{base}.txt"
                assert members[i + 1].name == f"{base}.json"
                meta = json.load(tar.extractfile(members[i + 1]))
                assert set(meta) == {"label", "source"}
                body = tar.extractfile(members[i]).read().decode()
                assert body == hashlib.md5(base.encode()).hexdigest()
                seen += 1
        # recorded checksum matches the file on disk
        with open(p, "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == r.tar_sha256
    assert seen == 200
    # no stray tmp files (atomic rename per shard)
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_webdataset_reexport_is_byte_identical(spark):
    a, b = tempfile.mkdtemp(prefix="wds_a"), tempfile.mkdtemp(prefix="wds_b")
    df = _docs(spark, 120)
    # different input partitioning must not change a single byte
    kw = dict(
        key_col="doc_id", payload_col="payload", n_shards=3, meta_cols=("label",)
    )
    export_webdataset(df.repartition(7), a, **kw).collect()
    export_webdataset(df.coalesce(1), b, **kw).collect()
    for f in sorted(os.listdir(a)):
        with open(os.path.join(a, f), "rb") as fa, open(
            os.path.join(b, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f


def test_webdataset_roundtrip(spark):
    out = tempfile.mkdtemp(prefix="wds_rt")
    df = _docs(spark, 150)
    from snappydata_spark.export import read_webdataset

    export_webdataset(
        df, out, key_col="doc_id", payload_col="payload",
        n_shards=3, meta_cols=("label", "source"), ext="txt",
    ).collect()
    back = read_webdataset(spark, out, ext="txt")
    rows = back.collect()
    assert len(rows) == 150
    orig = {
        str(r.doc_id): (bytes(r.payload), r.label, r.source)
        for r in df.collect()
    }
    for r in rows:
        p, label, source = orig[r.key]
        assert bytes(r.payload) == p
        meta = json.loads(r.meta_json)
        assert meta["label"] == label and meta["source"] == source
    # within-shard order is the deterministic shuffled order: keys per
    # shard match the exporter's manifest counts
    per_shard = {}
    for r in rows:
        per_shard[r.shard] = per_shard.get(r.shard, 0) + 1
    assert sum(per_shard.values()) == 150 and len(per_shard) == 3


def test_read_webdataset_tolerates_foreign_tar_members(spark):
    """Foreign webdataset tars commonly carry directory entries,
    extension-less members, and PAX metadata; read_webdataset must skip
    them instead of crashing (rsplit ValueError / extractfile None)."""
    import io

    from snappydata_spark.export import read_webdataset

    out = tempfile.mkdtemp(prefix="wds_foreign")
    path = os.path.join(out, "shard-00000.tar")
    with tarfile.open(path, "w", format=tarfile.PAX_FORMAT) as tar:
        d = tarfile.TarInfo(name="subdir")
        d.type = tarfile.DIRTYPE
        tar.addfile(d)
        noext = tarfile.TarInfo(name="READM E")  # extension-less file
        payload0 = b"not-a-sample"
        noext.size = len(payload0)
        tar.addfile(noext, io.BytesIO(payload0))
        for key, blob in (("k1", b"alpha"), ("k2", b"beta")):
            for name, content in (
                (f"{key}.txt", blob),
                (f"{key}.json", json.dumps({"label": key}).encode()),
            ):
                info = tarfile.TarInfo(name=name)
                info.size = len(content)
                # PAX long-name style headers are emitted by the format
                tar.addfile(info, io.BytesIO(content))
    rows = read_webdataset(spark, out, ext="txt").collect()
    assert {r.key for r in rows} == {"k1", "k2"}
    got = {r.key: bytes(r.payload) for r in rows}
    assert got == {"k1": b"alpha", "k2": b"beta"}


def test_export_webdataset_array_meta_column(spark):
    """Array-typed metadata columns must not crash the exporter's
    null check (pd.isna on an ndarray is ambiguous)."""
    from snappydata_spark.export import read_webdataset

    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
        F.array(F.col("id"), F.col("id") * 2).alias("tags"),
    )
    out = tempfile.mkdtemp(prefix="wds_arr")
    summary = export_webdataset(
        df, out, key_col="doc_id", payload_col="payload",
        n_shards=2, meta_cols=("tags",), ext="bin",
    ).collect()
    assert sum(r.n_samples for r in summary) == 20
    back = read_webdataset(spark, out, ext="bin").collect()
    metas = {r.key: json.loads(r.meta_json) for r in back}
    assert len(metas) == 20
    # the array value survives as a 2-element sequence per sample
    assert all(len(m["tags"]) == 2 or isinstance(m["tags"], str)
               for m in metas.values())
