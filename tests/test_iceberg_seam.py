"""Iceberg catalog seam (r3 VERDICT next-9, probe r4 VERDICT next-10).

IndexStore implements the reference's MVCC generation contract (immutable
segments + atomic CURRENT swap, core/index/index_meta.hpp:80-87) on parquet
directories + JSON manifests because this container ships no Iceberg jars.
The production seam is documented in segments.py: a snapshot = a manifest
generation, commit = atomic snapshot swap, reader pin = snapshot-id read.

This test exercises that contract through a REAL Iceberg catalog whenever
the SparkCatalog class is loadable. When it is not, it PROBES for jars
(r4 next-10) before skipping: a subprocess SparkSession configured with
spark.jars.packages + a local ivy cache (pip-less fetch — works the moment
the sandbox gets network or a pre-seeded ~/.ivy2), hard-timeout-bounded,
with the outcome cached in a sentinel file so a no-network container pays
the probe cost once, not once per pytest run. Skip reasons record which
stage failed so the seam stays visible in test output.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import textwrap

import pytest

# candidate runtime coordinates, newest first (scala 2.13 / spark 4.x)
_ICEBERG_COORDS = (
    "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0",
    "org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:1.9.2",
)
_SENTINEL = os.path.join(tempfile.gettempdir(), "ir_iceberg_probe.json")

_SNAPSHOT_SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession

    packages, warehouse, ivy = sys.argv[1], sys.argv[2], sys.argv[3]
    b = (
        SparkSession.builder.master("local[2]")
        .appName("ir-iceberg-probe")
        .config("spark.sql.catalog.seamcat", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.seamcat.type", "hadoop")
        .config("spark.sql.catalog.seamcat.warehouse", warehouse)
        .config("spark.jars.ivy", ivy)
    )
    if packages:
        b = b.config("spark.jars.packages", packages)
    spark = b.getOrCreate()
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        tbl = "seamcat.seg.postings"
        spark.sql("CREATE NAMESPACE IF NOT EXISTS seamcat.seg")
        g1 = spark.createDataFrame(
            [("alpha", 1, 2), ("beta", 2, 1)], "term string, doc_id long, tf int"
        )
        g1.writeTo(tbl).create()
        snap1 = spark.sql(f"SELECT snapshot_id FROM {tbl}.snapshots").collect()[0][0]
        g2 = spark.createDataFrame([("gamma", 3, 4)], "term string, doc_id long, tf int")
        g2.writeTo(tbl).append()
        assert spark.table(tbl).count() == 3
        pinned = spark.read.option("snapshot-id", snap1).format("iceberg").load(tbl)
        assert sorted(r["term"] for r in pinned.collect()) == ["alpha", "beta"]
        print("ICEBERG_SEAM_OK")
    finally:
        spark.stop()
    """
)


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _probe_subprocess(packages: str, tmp_path) -> tuple[bool, str]:
    """Run the snapshot contract in a fresh JVM that can resolve jars via
    spark.jars.packages (ivy fetch to a local cache) — the only way to add
    a catalog plugin the running test JVM was started without."""
    ivy = os.environ.get("IR_ICEBERG_IVY", os.path.expanduser("~/.ivy2"))
    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                _SNAPSHOT_SCRIPT,
                packages,
                str(tmp_path / "warehouse"),
                ivy,
            ],
            capture_output=True,
            text=True,
            timeout=int(os.environ.get("IR_ICEBERG_PROBE_TIMEOUT", "120")),
        )
    except subprocess.TimeoutExpired:
        return False, "probe timed out (no network / ivy resolve hung)"
    if "ICEBERG_SEAM_OK" in r.stdout:
        return True, "ok"
    tail = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["no output"]
    return False, f"probe failed: {tail[0][:200]}"


def test_iceberg_snapshot_commit_seam(spark, tmp_path):
    if _iceberg_available(spark):
        cat = "ir_iceberg_seam"
        spark.conf.set(
            f"spark.sql.catalog.{cat}", "org.apache.iceberg.spark.SparkCatalog"
        )
        spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
        spark.conf.set(f"spark.sql.catalog.{cat}.warehouse", str(tmp_path / "warehouse"))

        tbl = f"{cat}.seg.postings"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.seg")
        gen1 = spark.createDataFrame(
            [("alpha", 1, 2), ("beta", 2, 1)], "term string, doc_id long, tf int"
        )
        gen1.writeTo(tbl).create()
        snap1 = spark.sql(f"SELECT snapshot_id FROM {tbl}.snapshots").collect()[0][0]

        gen2 = spark.createDataFrame(
            [("gamma", 3, 4)], "term string, doc_id long, tf int"
        )
        gen2.writeTo(tbl).append()

        # current snapshot sees both commits; pinning snap1 sees only gen1 —
        # exactly the IndexStore.current() / reader-pins-generation contract
        assert spark.table(tbl).count() == 3
        pinned = spark.read.option("snapshot-id", snap1).format("iceberg").load(tbl)
        assert sorted(r["term"] for r in pinned.collect()) == ["alpha", "beta"]
        return

    # ---- jar probe (r4 next-10): cached so a no-network sandbox pays it
    # once per container, not once per pytest invocation ----
    if os.path.exists(_SENTINEL) and not os.environ.get("IR_ICEBERG_REPROBE"):
        with open(_SENTINEL) as f:
            prior = json.load(f)
        pytest.skip(
            "Iceberg jars not on classpath; prior fetch probe: "
            f"{prior['reason']} (rm {_SENTINEL} or set IR_ICEBERG_REPROBE=1 "
            "to re-probe; IndexStore's parquet+JSON manifest store "
            "implements the same snapshot contract, seam documented in "
            "iresearch_spark/index/segments.py)"
        )

    reasons = []
    for coord in _ICEBERG_COORDS:
        ok, reason = _probe_subprocess(coord, tmp_path)
        if ok:
            with open(_SENTINEL, "w") as f:
                json.dump({"ok": True, "reason": f"resolved {coord}"}, f)
            return  # the subprocess ran the full snapshot contract
        reasons.append(f"{coord}: {reason}")
    with open(_SENTINEL, "w") as f:
        json.dump({"ok": False, "reason": "; ".join(reasons)}, f)
    pytest.skip(
        "Iceberg unavailable after jar fetch probe — " + "; ".join(reasons)
    )
