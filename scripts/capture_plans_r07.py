"""Capture .explain('formatted') for the r7-touched query paths.

Usage: python scripts/capture_plans_r07.py <out_dir> <suffix>
Run from a repo root (the round-6 worktree for `_before`, the optimized
tree for `_after`). Uses the sf0.001 gate fixtures so plans are cheap to
produce; plan SHAPE (exchanges, joins, Python-eval nodes) is what the
files document, not timings.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cap(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    sf = "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from iresearch_spark.functions.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        simhash,
        simhash_pairs,
    )
    from iresearch_spark.functions.similarity import embedding_neardup_pairs
    from iresearch_spark.session import get_spark

    spark = get_spark("plans-r07", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    plans = {
        "simhash_sketch": simhash(docs, bits=32, hash_fn="md5_32"),
        "simhash_pairs": simhash_pairs(docs),
        "minhash_signatures": minhash_signatures(docs, shingle=2),
        "minhash_lsh_pairs": minhash_lsh_pairs(docs, shingle=2, threshold=0.5),
        "embedding_neardup_pairs": embedding_neardup_pairs(
            emb, 64, threshold=0.999, n_planes=8, multiprobe_bits=1
        ),
    }
    for name, df in plans.items():
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(cap(df))
        print("wrote", name, suffix)

    # merge plan: the docmap write path (join vs shift projection)
    import shutil
    import tempfile

    from iresearch_spark.index.segments import IndexStore, build_segment

    root = tempfile.mkdtemp(prefix="plan_ix_")
    store = IndexStore(root)
    half = docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    build_segment(spark, store, half[0], "a", text_col="text", doc_id_col="doc_id")
    build_segment(spark, store, half[1], "b", text_col="text", doc_id_col="doc_id")
    # reproduce the merged-docmap DataFrame the way merge_segments builds it
    from iresearch_spark.index import merge as M

    docmaps = store.read_union(spark, "docmap", ["a", "b"])
    aggs = M.docmap_aggs(spark, store, ["a", "b"])
    shifts = M.docmap_shift_spec(spark, store, ["a", "b"], aggs)
    if suffix == "before":
        doc_map = M.build_doc_map(spark, store, ["a", "b"], None)
        dm = docmaps.join(doc_map, ["segment", "doc_id"]).drop(
            "doc_id", "segment"
        ).withColumnRenamed("new_doc", "doc_id")
    else:
        keep = [c for c in docmaps.columns if c not in ("doc_id", "segment")]
        base_map = F.create_map(
            *[F.lit(x) for s, sh in shifts.items() for x in (s, sh)]
        )
        dm = docmaps.select(
            *keep, (F.col("doc_id") + base_map[F.col("segment")]).alias("doc_id")
        )
    with open(os.path.join(out_dir, f"merge_docmap_{suffix}.txt"), "w") as f:
        f.write(cap(dm))
    print("wrote merge_docmap", suffix)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
