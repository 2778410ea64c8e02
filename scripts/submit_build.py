"""spark-submit entry point: build (or incrementally extend) an index.

Cluster usage (the north-rule invocation shape):

    spark-submit --master <cluster> \
        --py-files iresearch_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        scripts/submit_build.py \
        --input  <parquet/iceberg path of (repo,path,commit,lang,content)> \
        --index  <index root> \
        --segment <segment name> [--consolidate] [--verify]

Local smoke:
    python scripts/submit_build.py --synthetic 10000 --index /tmp/ix

The script only uses SparkSession.getActiveSession()/builder without a
master override, so spark-submit's cluster config wins; local runs fall
back to local[*].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="source table path (parquet dir)")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N synthetic docs instead of --input")
    ap.add_argument("--index", required=True, help="index root directory")
    ap.add_argument("--segment", default=None, help="segment name (default: build_<epoch>)")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--key-cols", default="repo,path,commit")
    ap.add_argument("--doc-id-col", default=None, help="use a pre-assigned id column")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--slices", type=int, default=0,
                    help="resumable sliced build: hash-partition the corpus "
                         "into K deterministic slices, one committed segment "
                         "each; re-invoking skips committed slices")
    ap.add_argument("--consolidate", action="store_true", help="run one tiered consolidation round after the build")
    ap.add_argument("--verify", action="store_true", help="verify lineage + sha invariant after commit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from iresearch_spark.corpus import generate_corpus
    from iresearch_spark.index.merge import consolidate
    from iresearch_spark.index.segments import (
        IndexStore,
        build_segment,
        verify_lineage,
        verify_sha_invariant,
    )

    spark = (
        SparkSession.builder.appName("iresearch-build")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    if args.synthetic:
        docs = generate_corpus(spark, args.synthetic, seed=42)
    else:
        assert args.input, "--input or --synthetic required"
        docs = spark.read.parquet(args.input)

    store = IndexStore(args.index)
    t0 = time.time()
    if args.slices:
        from iresearch_spark.index.segments import build_sliced

        metas = build_sliced(
            spark, store, docs, args.slices,
            prefix=(args.segment or "slice"),
            key_cols=args.key_cols.split(","),
            text_col=args.text_col,
            doc_id_col=args.doc_id_col,  # forwarded (r5 ADVICE: was dropped)
            with_positions=not args.no_positions,
        )
        build_sec = time.time() - t0
        n = sum(m.docs_count for m in metas)
        out = {
            "segments": [m.name for m in metas],
            "docs": n,
            "build_sec": round(build_sec, 2),
            "docs_per_sec": round(n / build_sec, 1),
            "gen": store.current().gen,
        }
        # verify target: last slice, against ITS slice subset (lineage
        # recompute must see exactly the segment's input rows)
        seg = metas[-1].name
        from pyspark.sql import functions as F

        kc = args.key_cols.split(",")
        docs = docs.where(
            F.pmod(F.xxhash64(*[F.col(c) for c in kc]), F.lit(args.slices))
            == args.slices - 1
        )
    else:
        seg = args.segment or f"build_{int(time.time())}"
        meta = build_segment(
            spark,
            store,
            docs,
            seg,
            text_col=args.text_col,
            key_cols=args.key_cols.split(","),
            doc_id_col=args.doc_id_col,
            with_positions=not args.no_positions,
        )
        build_sec = time.time() - t0

        out = {
            "segment": meta.name,
            "docs": meta.docs_count,
            "sum_len": meta.sum_len,
            "bytes": meta.bytes,
            "build_sec": round(build_sec, 2),
            "docs_per_sec": round(meta.docs_count / build_sec, 1),
            "gen": store.current().gen,
        }
    if args.verify:
        out["lineage_ok"] = verify_lineage(spark, store, seg, docs, args.key_cols.split(","), args.text_col)
        try:
            out["sha_violations"] = verify_sha_invariant(spark, store, seg, docs, args.key_cols.split(","), args.text_col)
        except ValueError:
            out["sha_violations"] = None  # source lacks content_sha256
    if args.consolidate:
        merged = consolidate(spark, store)
        out["consolidated_into"] = merged.name if merged else None
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
