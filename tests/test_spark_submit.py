"""End-to-end `spark-submit --py-files` invocation test (north-rule shape).

The north rule requires the job to run "via spark-submit --py-files on a
multi-executor cluster". This test executes that invocation literally in
local mode: the package is zipped (exactly what a user ships to a
cluster), the entry scripts are COPIED OUT of the repo into a temp dir,
and the subprocess environment is scrubbed of any path that could import
`iresearch_spark` locally — so the build and the query below only work
if the zip shipped through `--py-files` provides the package, the same
way a 1000-executor cluster run would resolve it.

Covers, through the cluster invocation shape:
  - submit_build.py --synthetic --verify: combiner index build + commit +
    per-partition lineage recompute + content-sha256 per-row invariant
    (the north rule's resumability/lineage clauses);
  - submit_query.py --query: IndexStore reopen + BM25 top-k with WAND.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "iresearch_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


def _scrubbed_env() -> dict:
    env = dict(os.environ)
    # drop any PYTHONPATH leg that could resolve the package locally —
    # the subprocess must get it from --py-files alone
    pp = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != REPO
    ]
    env["PYTHONPATH"] = os.pathsep.join(pp)
    return env


def test_spark_submit_py_files_build_then_query(tmp_path):
    zip_path = str(tmp_path / "iresearch_spark.zip")
    _build_zip(zip_path)
    # copy the entry scripts OUT of the repo: their sys.path fallback then
    # points at tmp's parent (no package there), so only the zip can
    # satisfy `import iresearch_spark`
    for s in ("submit_build.py", "submit_query.py"):
        shutil.copy(os.path.join(REPO, "scripts", s), tmp_path / s)
    index = str(tmp_path / "ix")
    common = [
        _spark_submit(),
        "--master",
        "local[4]",
        "--py-files",
        zip_path,
        "--conf",
        "spark.sql.shuffle.partitions=8",
        "--conf",
        "spark.ui.enabled=false",
    ]

    r = subprocess.run(
        common
        + [
            str(tmp_path / "submit_build.py"),
            "--synthetic",
            "300",
            "--index",
            index,
            "--segment",
            "s0",
            "--verify",
        ],
        cwd=str(tmp_path),
        env=_scrubbed_env(),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, f"build failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["segment"] == "s0" and out["docs"] == 300
    assert out["lineage_ok"] is True
    assert out["sha_violations"] == 0
    assert os.path.exists(os.path.join(index, "CURRENT"))

    r = subprocess.run(
        common
        + [
            str(tmp_path / "submit_query.py"),
            "--index",
            index,
            "--query",
            "def",
            "--k",
            "5",
        ],
        cwd=str(tmp_path),
        env=_scrubbed_env(),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, f"query failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    res = json.loads(r.stdout.strip().splitlines()[-1])
    hits = res["AdHoc"]["hits"]
    assert 0 < len(hits) <= 5
    # scores sorted desc, gdoc asc on ties — the engine's top-k contract
    scores = [h[1] for h in hits]
    assert scores == sorted(scores, reverse=True)
