"""Iceberg catalog seam (r3 VERDICT next-9).

IndexStore implements the reference's MVCC generation contract (immutable
segments + atomic CURRENT swap, core/index/index_meta.hpp:80-87) on parquet
directories + JSON manifests because this container ships no Iceberg jars.
The production seam is documented in segments.py: a snapshot = a manifest
generation, commit = atomic snapshot swap, reader pin = snapshot-id read.

This test exercises that contract through a REAL Iceberg catalog whenever
the jars are on the classpath — create a segment-tables namespace, commit
postings twice, read back the current snapshot, and time-travel to the
first one (the DirectoryReader-on-generation analogue). Without the jars it
skips with the reason recorded, so the seam stays visible in test output.
"""

from __future__ import annotations

import pytest


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_snapshot_commit_seam(spark, tmp_path):
    if not _iceberg_available(spark):
        pytest.skip(
            "Iceberg jars not on classpath; IndexStore's parquet+JSON "
            "manifest store implements the same snapshot contract (seam "
            "documented in iresearch_spark/index/segments.py)"
        )
    cat = "ir_iceberg_seam"
    spark.conf.set(f"spark.sql.catalog.{cat}", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{cat}.warehouse", str(tmp_path / "warehouse"))

    tbl = f"{cat}.seg.postings"
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.seg")
    gen1 = spark.createDataFrame(
        [("alpha", 1, 2), ("beta", 2, 1)], "term string, doc_id long, tf int"
    )
    gen1.writeTo(tbl).create()
    snap1 = spark.sql(f"SELECT snapshot_id FROM {tbl}.snapshots").collect()[0][0]

    gen2 = spark.createDataFrame([("gamma", 3, 4)], "term string, doc_id long, tf int")
    gen2.writeTo(tbl).append()

    # current snapshot sees both commits; pinning snap1 sees only gen1 —
    # exactly the IndexStore.current() / reader-pins-generation contract
    assert spark.table(tbl).count() == 3
    pinned = spark.read.option("snapshot-id", snap1).format("iceberg").load(tbl)
    assert sorted(r["term"] for r in pinned.collect()) == ["alpha", "beta"]
