"""Index inspection CLI — the analogue of the reference's read-only Python
tooling (reference python/scripts/index-dump.py): dump manifest, per-term
postings, and block metadata from a built index.

    python scripts/index_dump.py --index <root> [--term foo] [--limit 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--term", help="dump postings for this term")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--cores", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from iresearch_spark.index.codec import unpack_positions, varint_decode, delta_decode
    from iresearch_spark.index.segments import IndexStore
    from iresearch_spark.session import get_spark

    spark = get_spark("index-dump", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    store = IndexStore(args.index)
    m = store.current()
    print(json.dumps({
        "gen": m.gen,
        "analyzer": m.analyzer,
        "docs_count": m.docs_count,
        "sum_len": m.sum_len,
        "avg_dl": round(m.avg_dl, 4),
        "segments": [s.to_dict() for s in m.segments],
    }, indent=1))

    if args.term:
        blocks = (
            store.read_union(spark, "postings")
            .where(F.col("term") == args.term)
            .orderBy("segment", "block_id")
            .collect()
        )
        print(f"\nterm={args.term!r}: {len(blocks)} block(s)")
        shown = 0
        for b in blocks:
            docs = delta_decode(varint_decode(b["docs_bin"])).astype(int)
            tfs = varint_decode(b["tfs_bin"]).astype(int)
            dls = varint_decode(b["dls_bin"]).astype(int)
            print(
                f"  seg={b['segment']} block={b['block_id']} n={b['doc_count']} "
                f"docs[{b['first_doc']}..{b['last_doc']}] max_tf={b['max_tf']} min_dl={b['min_dl']}"
            )
            for d, tf, dl in list(zip(docs, tfs, dls))[: args.limit]:
                print(f"    doc={d} tf={tf} dl={dl}")
            shown += 1
            if shown >= args.limit:
                break
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
