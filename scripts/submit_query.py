"""spark-submit entry point: run queries against a built index.

Task-file format = the reference benchmark's (`Category: text # freq`,
reference scripts/iresearch-benchmark.tasks, utils/index-search.cpp:218-238):

    HighTerm: ref
    AndHighMed: +ref +code
    OrHighMed: ref code
    LowPhrase: "big bad wolf"
    Prefix3: sec*
    Wildcard: re*f
    Fuzzy1: refugees
    MinMatch2High2Med: 2 ref http code span

Usage:
    spark-submit ... scripts/submit_query.py --index <root> \
        [--tasks tasks.txt] [--query "term"] [--k 10] [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_task(category: str, text: str):
    """Reference task line -> filter tree (index-search.cpp:240-449)."""
    from iresearch_spark.search import And, Fuzzy, Or, Phrase, Prefix, Term, Terms, Wildcard

    text = text.strip()
    if text.startswith('"') and text.endswith('"'):
        return Phrase(tuple(text.strip('"').lower().split()))
    if "Fuzzy" in category:
        dist = 2 if category.endswith("2") else 1
        return Fuzzy(text.lower(), distance=dist)
    if "Prefix" in category:
        return Prefix(text.rstrip("*").lower())
    if "Wildcard" in category:
        return Wildcard(text.lower())
    if "MinMatch" in category:
        parts = text.split()
        m = int(parts[0])
        return Or(tuple(Term(t.lower()) for t in parts[1:]), min_match=m)
    parts = text.split()
    if len(parts) == 1:
        return Term(parts[0].lower())
    if all(p.startswith("+") for p in parts):
        return And(tuple(Term(p[1:].lower()) for p in parts))
    return Or(tuple(Term(p.lower()) for p in parts))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--tasks", help="task file (Category: text [# freq] lines)")
    ap.add_argument("--query", help="single term/phrase query")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--scorer", default="bm25")
    ap.add_argument("--no-wand", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from iresearch_spark.index.segments import IndexStore
    from iresearch_spark.search import SearchEngine, Term, get_scorer

    spark = SparkSession.builder.appName("iresearch-query").getOrCreate()
    eng = SearchEngine(spark, IndexStore(args.index), scorer=get_scorer(args.scorer))

    tasks: list[tuple[str, object]] = []
    if args.tasks:
        for line in open(args.tasks):
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            cat, text = line.split(":", 1)
            tasks.append((cat.strip(), parse_task(cat.strip(), text)))
    if args.query:
        tasks.append(("AdHoc", parse_task("Term", args.query)))
    if not tasks:
        print(json.dumps({"error": "no tasks; pass --tasks or --query"}))
        return 2

    results = {}
    for cat, node in tasks:
        times = []
        rows = []
        for _ in range(args.repeat):
            t0 = time.time()
            rows = eng.topk(node, args.k, wand=not args.no_wand).collect()
            times.append(time.time() - t0)
        results[cat] = {
            "ms": [round(t * 1000, 1) for t in times],
            "hits": [(r["gdoc"], round(float(r["score"]), 6)) for r in rows],
        }
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
