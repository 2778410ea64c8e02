"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Phases:
  1. index-build: deterministic source-code corpus (input_hint shape,
     IR_BENCH_DOCS docs, seed 42) -> packed segment build -> docs/sec
     (the reference's index-put wall-clock metric).
  1b. merge_10seg: timed k-way consolidation (join-free packed merge) of
     10 micro-segments of the same corpus.
  2. query latency: reference-benchmark-style categories (HighTerm /
     MedTerm / LowTerm / AndHighMed / OrHighMed / MinMatch / Phrase /
     Prefix / Wildcard / Fuzzy) against the packed index via the
     mapInPandas BM25 kernel (top-10, WAND where eligible), min-of-3.
  3. sql-path queries over $SPARK_GRAFT_SF_DIR documents.parquet
     (tokenize+score end-to-end, no prebuilt index).
  4. big corpus (600k bursty docs): build + wand-vs-nowand + expansion /
     fuzzy / phrase categories, min-of-3; kernel-granularity wand pins.
  5. dedup/ANN scale tier (r6): minhash-LSH + simhash near-dup over the
     600k corpus and embedding near-dup over 100k deterministic vectors,
     min-of-3, with an executed-plan assert that no all-pairs stage
     (CartesianProduct / NestedLoop join) appears.
All phases record hypervisor steal%% deltas (/proc/stat) in the JSON.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), IR_BENCH_DOCS (default 50000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _cpu_times() -> tuple[int, int]:
    """(total jiffies, steal jiffies) from /proc/stat — hypervisor steal
    is the dominant run-to-run noise source on this sandbox (r4 VERDICT
    wrong-4: ±27% single-shot swings with no code cause)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError):
        return 0, 0


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[0] - before[0]
    return round(100.0 * (after[1] - before[1]) / dt, 3) if dt > 0 else 0.0


def _min_of(n: int, fn, samples: list | None = None) -> float:
    """min-of-n wall time — phase-2 single-shot timings swung with steal
    between rounds (r4 VERDICT next-3); phase 4 already ran min-of-5.
    Raw samples optionally accumulate into `samples` for the p95 row."""
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        if samples is not None:
            samples.append(dt)
        best = min(best, dt)
    return best



def _mark(msg: str) -> None:
    """Progress marker on stderr (with disk usage) so a mid-run failure in
    the minutes-long big phase is attributable to a specific row."""
    import shutil as _sh
    u = _sh.disk_usage("/tmp")
    print(f"[bench] {time.strftime('%H:%M:%S')} disk_free={u.free >> 30}G {msg}",
          file=sys.stderr, flush=True)

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("IR_BENCH_DOCS", "50000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    from pyspark.sql import functions as F

    from iresearch_spark.corpus import generate_corpus
    from iresearch_spark.index.segments import IndexStore, build_segment
    from iresearch_spark.search import (
        And,
        Fuzzy,
        Or,
        Phrase,
        Prefix,
        SearchEngine,
        Term,
        Terms,
        Wildcard,
    )
    from iresearch_spark.session import get_spark

    spark = get_spark("iresearch-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t_all = time.time()
    queries: dict[str, float] = {}
    steal: dict[str, float] = {}
    cpu0 = _cpu_times()

    # ---- phase 1: index build ------------------------------------------
    root = tempfile.mkdtemp(prefix="irbench_")
    store = IndexStore(root)
    corpus = generate_corpus(spark, n_docs, seed=42).persist()
    corpus.count()  # materialize input outside the build timing
    # warmup: compile codegen paths + spawn Python workers on a tiny slice
    # so the timed run measures throughput, not JVM/worker startup
    warm = IndexStore(tempfile.mkdtemp(prefix="irwarm_"))
    build_segment(spark, warm, corpus.limit(500), "w")
    shutil.rmtree(warm.root, ignore_errors=True)
    # best-of-2: the headline throughput row swung ±10% single-shot with
    # steal; contention is one-sided, so min wall time (max docs/s) is the
    # standard noise-robust estimator (same as min-of-N query timing)
    build_secs = []
    for _ in range(2):
        t0 = time.time()
        meta = build_segment(spark, store, corpus, "bench0")
        build_secs.append(time.time() - t0)
    build_sec = min(build_secs)
    queries["index_build"] = round(build_sec, 3)
    queries["index_build_cold"] = round(build_secs[0], 3)
    docs_per_sec = round(n_docs / build_sec, 1)
    steal["build"] = _steal_pct(cpu0, _cpu_times())

    # ---- phase 1b: timed consolidation (r4 VERDICT next-7): the join-free
    # packed merge path got equality tests in r4 but no pinned number.
    # 10 micro-segments of the same corpus -> one merge_segments call.
    from pyspark.sql import functions as _F

    from iresearch_spark.index.merge import merge_segments

    mroot = tempfile.mkdtemp(prefix="irmerge_")
    mstore = IndexStore(mroot)
    h = _F.abs(_F.hash("repo", "path", "commit")) % 10
    for i in range(10):
        build_segment(spark, mstore, corpus.where(h == i), f"m{i}")
    t0 = time.time()
    merge_segments(spark, mstore, [f"m{i}" for i in range(10)], "m10", commit=False)
    queries["merge_10seg"] = round(time.time() - t0, 3)
    t0 = time.time()  # legacy flat pipeline on identical inputs, for the ledger
    merge_segments(
        spark, mstore, [f"m{i}" for i in range(10)], "m10flat",
        commit=False, force_flat=True,
    )
    queries["merge_10seg_flat"] = round(time.time() - t0, 3)
    shutil.rmtree(mroot, ignore_errors=True)
    corpus.unpersist()

    # ---- phase 2: packed-engine query latency --------------------------
    eng = SearchEngine(spark, store)
    eng.prepare_dictionary()  # engine-open warm-up (one-time vocab pull)
    eng.pin_postings()  # hot-index posture: cached columnar scan (~10%)
    stats = (
        eng.term_stats.orderBy(F.desc("doc_freq"), F.asc("term"))
        .select("term", "doc_freq")
        .collect()
    )
    terms = [(r["term"], r["doc_freq"]) for r in stats]
    high = terms[0][0]
    med = next((t for t, df in terms if df <= terms[0][1] / 10), terms[len(terms) // 10][0])
    low = next((t for t, df in terms if df <= terms[0][1] / 100), terms[len(terms) // 2][0])

    cases = {
        "HighTerm": Term(high),
        "MedTerm": Term(med),
        "LowTerm": Term(low),
        "AndHighMed": And((Term(high), Term(med))),
        "OrHighMed": Or((Term(high), Term(med))),
        "Or4": Or((Term(high), Term(med), Term(low), Term(terms[1][0]))),
        "Or6": Or(tuple(Term(t) for t, _ in terms[:5]) + (Term(low),)),
        "MinMatch2of3": Or((Term(high), Term(med), Term(low)), min_match=2),
        # 'call x' is a high-df decorated bigram (~1/12 of tokens) -> the
        # HighPhrase-shaped category
        "Phrase": Phrase(("call", "x")),
        "Prefix3": Prefix(med[:3] if len(med) >= 3 else med),
        "Wildcard": Wildcard(f"{med[:2]}*" if len(med) >= 2 else f"{med}*"),
        "Fuzzy1": Fuzzy(high, distance=1),
    }
    # one unmeasured query so the FIRST timed case doesn't absorb kernel /
    # python-worker warm-up that none of the others pay (measured ~0.3s
    # first-query tax that previously landed on whichever case ran first)
    eng.topk(Term(med), 10).collect()
    cpu_q = _cpu_times()
    q_samples: list[float] = []
    for name, node in cases.items():
        queries[name] = round(
            _min_of(3, lambda n=node: eng.topk(n, 10).collect(), q_samples), 3
        )
    # the north metric names query p95: p95 over ALL raw phase-2 samples
    # (every category x 3 runs), steal included — the pessimistic view the
    # min-of-3 rows deliberately exclude
    q_samples.sort()
    queries["query_p95"] = round(
        q_samples[min(len(q_samples) - 1, int(0.95 * len(q_samples)))], 3
    )
    # serving posture: concurrent submission from 4 driver threads (Spark
    # schedules the jobs in parallel) — throughput the latency rows can't
    # show, since single-stream wall time is ~fixed scheduling overhead
    from concurrent.futures import ThreadPoolExecutor

    jobs = [node for node in cases.values() for _ in range(2)]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(lambda nd: eng.topk(nd, 10).collect(), jobs))
    queries["query_qps_4way"] = round(len(jobs) / (time.time() - t0), 2)
    # batched execution (r6): the SAME 24-query workload through ONE
    # shared postings scan (topk_batch) — the serving-tier posture where
    # the scan is amortized across the batch instead of re-run per query
    batch = {
        f"{name}#{i}": node for i in range(2) for name, node in cases.items()
    }
    t_batch = _min_of(3, lambda: eng.topk_batch(batch, 10).collect())
    queries["query_qps_batched24"] = round(len(batch) / t_batch, 2)
    # WAND pruning gain: same queries with block-max skipping disabled
    for name, node in (("HighTerm", Term(high)), ("OrHighMed", Or((Term(high), Term(med))))):
        queries[f"{name}_nowand"] = round(
            _min_of(3, lambda n=node: eng.topk(n, 10, wand=False).collect()), 3
        )
    steal["query"] = _steal_pct(cpu_q, _cpu_times())

    # ---- phase 3: driver-gate queries over the testdata (engine-backed
    # since r2: term/boolean/phrase run the packed index; jaccard is the
    # relational dedup op). Keys renamed sql_* -> gate_*.
    import __spark_entry__ as E

    from iresearch_spark.functions.similarity import release_cached

    sql_qs = E.queries()
    cpu_g = _cpu_times()
    for name in ("term_high", "or_high_med", "phrase_low", "ngram_jaccard_pairs"):
        t0 = time.time()
        out_df = sql_qs[name](spark, sf_dir)
        out_df.collect()
        queries[f"gate_{name}"] = round(time.time() - t0, 3)
        release_cached(out_df)  # drop builder-attached caches (LSH sigs)
    steal["gate"] = _steal_pct(cpu_g, _cpu_times())

    # Partial result line BEFORE the (minutes-long) big phase: the driver
    # takes the LAST json line, so a truncated run still reports phases 1-3
    # instead of nothing.
    print(
        json.dumps(
            {
                "metric": "index-build docs/sec + BM25 top-10 latency (packed engine, local)",
                "value": round(time.time() - t_all, 3),
                "unit": "sec",
                "queries": dict(queries),
                "sf": sf,
                "bench_docs": n_docs,
                "docs_per_sec": docs_per_sec,
                "cpus": cpus,
                "index_bytes": store.dir_bytes("bench0"),
                "steal_pct": dict(steal),
                "partial": "big phase pending",
            }
        ),
        flush=True,
    )

    # ---- phase 4: big corpus (r4, VERDICT next-4/next-8) ----------------
    # At 50k docs every query is fixed job overhead and WAND has nothing to
    # skip (the pool fills after one block). This phase sizes the corpus so
    # posting lists span hundreds of blocks, then measures wand vs nowand
    # INTERLEAVED (min of repeats — ordering/warmup artifacts hit both
    # variants equally) to pin where block-max pruning is net-positive.
    big_docs = int(os.environ.get("IR_BENCH_BIG_DOCS", "600000"))
    big_meta = {}
    if big_docs:
        broot = tempfile.mkdtemp(prefix="irbig_")
        bstore = IndexStore(broot)
        # bursty (Church-Gale) term distribution: real text concentrates a
        # term's occurrences in few topical docs; the flat binomial tf of
        # the plain synthetic corpus gives every block the same max_tf, so
        # block-max pruning could never engage on it
        bcorpus = generate_corpus(spark, big_docs, seed=43, burstiness=0.1).persist()
        bcorpus.count()
        # min-of-2: the FIRST build after materializing a big corpus cache
        # runs up to 4x slower than an identical immediate re-run
        # (measured 41.3 s vs 10.2 s at 300k docs — allocator/page-cache
        # state, not plan); one repeat strips that from the headline
        big_builds = []
        for _ in range(2):
            t0 = time.time()
            build_segment(spark, bstore, bcorpus, "big0")
            big_builds.append(time.time() - t0)
        big_build = min(big_builds)
        queries["big_index_build_cold"] = round(big_builds[0], 3)
        bcorpus.unpersist()
        queries["big_index_build"] = round(big_build, 3)
        big_meta = {
            "big_docs": big_docs,
            "big_docs_per_sec": round(big_docs / big_build, 1),
            "big_index_bytes": bstore.dir_bytes("big0"),
        }
        beng = SearchEngine(spark, bstore)
        beng.prepare_dictionary()
        beng.pin_postings()
        bstats = (
            beng.term_stats.orderBy(F.desc("doc_freq"), F.asc("term"))
            .select("term", "doc_freq")
            .collect()
        )
        bterms = [(r["term"], r["doc_freq"]) for r in bstats]
        # highest-df VOCABULARY term ('call'/'x' are decoration artifacts
        # that never receive bursts — a term no real corpus would have:
        # ubiquitous yet with perfectly flat per-doc tf)
        bhigh = next(t for t, _ in bterms if t not in ("call", "x"))
        bmed = next(
            (t for t, df in bterms if df <= bterms[0][1] / 10),
            bterms[len(bterms) // 10][0],
        )
        beng.topk(Term(bmed), 10).collect()  # unmeasured warmup
        cpu_b = _cpu_times()
        _mark("big build done; query rows starting")
        for name, node in (
            ("BigMedTerm", Term(bmed)),
            ("BigAndHighMed", And((Term(bhigh), Term(bmed)))),
            ("BigPrefix3", Prefix(bmed[:3] if len(bmed) >= 3 else bmed)),
            # expansion / verify / position-stream categories — the costs
            # that actually grow with corpus size (vocab scan, candidate
            # verify, positional intersection) were only ever measured at
            # 50k docs (r4 VERDICT missing-5/next-5)
            ("BigWildcard", Wildcard(f"{bmed[:2]}*" if len(bmed) >= 2 else f"{bmed}*")),
            ("BigFuzzy1", Fuzzy(bhigh, distance=1)),
            ("BigPhrase", Phrase(("call", "x"))),
        ):
            queries[name] = round(
                _min_of(3, lambda n=node: beng.topk(n, 10).collect()), 3
            )
        _mark("big latency rows done")
        for name, node in (
            ("BigHighTerm", Term(bhigh)),
            ("BigOrHighMed", Or((Term(bhigh), Term(bmed)))),
        ):
            tw, tn = [], []
            for r in range(3):  # interleave, alternate order per repeat
                order = [(True, tw), (False, tn)] if r % 2 == 0 else [(False, tn), (True, tw)]
                for wand_on, sink in order:
                    t0 = time.time()
                    beng.topk(node, 10, wand=wand_on).collect()
                    sink.append(time.time() - t0)
            queries[name] = round(min(tw), 3)
            queries[f"{name}_nowand"] = round(min(tn), 3)
        # KERNEL-level wand demonstration: end-to-end wall time above is
        # dominated by fixed per-job scheduling (~0.45 s) — at 32-way
        # parallelism each task scores ~20k postings in milliseconds, so no
        # data-plane improvement can show. Here the scoring kernel runs
        # directly on ONE collected batch of the term's packed blocks (what
        # a single executor core sees), wand vs exhaustive, interleaved
        # min-of-5 — the reference wanderator's own granularity.
        from iresearch_spark.search.executor import _topk_sums_kernel

        for kname, kterm in (("KernelHighTerm", bhigh), ("KernelMedTerm", bmed)):
            dfreq = dict(bterms)[kterm]
            ksc = {kterm: beng.scorer.prepare(beng.field, dfreq, 1.0)}
            bpdf = (
                beng.postings.where(F.col("term") == kterm)
                .select(*beng.SCAN_COLS)
                .toPandas()
            )
            res = {}
            tms = {True: [], False: []}
            for r in range(5):
                for prune in (True, False) if r % 2 == 0 else (False, True):
                    kern = _topk_sums_kernel(
                        ksc, {kterm: 0.0}, beng.seg_base,
                        k=10, min_match=1, const_add=0.0, merge="sum",
                        mode="f32", deleted=None, grouped=False, prune=prune,
                    )
                    t0 = time.time()
                    frames = list(kern(iter([bpdf])))
                    tms[prune].append(time.time() - t0)
                    res[prune] = sorted(
                        map(tuple, frames[0][["gdoc", "score"]].to_numpy().tolist())
                    ) if frames else []
            assert res[True] == res[False], f"wand changed results for {kterm}"
            queries[kname] = round(min(tms[True]), 4)
            queries[f"{kname}_nowand"] = round(min(tms[False]), 4)
            big_meta[f"{kname}_blocks"] = int(len(bpdf))
        # batched vs 4-thread-concurrent at the BIG tier (r6): at 600k docs
        # the postings scan is real work, so sharing it across the batch is
        # the 100-TB serving argument, not just job-overhead amortization
        big_cases = {
            "mt": Term(bmed), "ht": Term(bhigh),
            "and": And((Term(bhigh), Term(bmed))),
            "or": Or((Term(bhigh), Term(bmed))),
            "pre": Prefix(bmed[:3] if len(bmed) >= 3 else bmed),
            "wild": Wildcard(f"{bmed[:2]}*" if len(bmed) >= 2 else f"{bmed}*"),
            "fz": Fuzzy(bhigh, distance=1),
            "ph": Phrase(("call", "x")),
        }
        bbatch = {
            f"{nm}#{i}": nd for i in range(3) for nm, nd in big_cases.items()
        }
        from concurrent.futures import ThreadPoolExecutor as _TPE

        _mark("kernel rows done; big_qps_4way starting")
        bjobs = [nd for nd in big_cases.values() for _ in range(3)]
        t0 = time.time()
        with _TPE(max_workers=4) as pool:
            list(pool.map(lambda nd: beng.topk(nd, 10).collect(), bjobs))
        queries["big_qps_4way"] = round(len(bjobs) / (time.time() - t0), 2)
        _mark("big_qps_4way done; big_qps_batched24 starting")
        t_bb = _min_of(2, lambda: beng.topk_batch(bbatch, 10).collect())
        queries["big_qps_batched24"] = round(len(bbatch) / t_bb, 2)
        steal["big"] = _steal_pct(cpu_b, _cpu_times())
        shutil.rmtree(broot, ignore_errors=True)

        # ---- phase 5 (r6): dedup / ANN at the scale tier ----------------
        # The LLM-pipeline operators were only ever TIMED at gate scale
        # (~500-5k rows; r5 VERDICT next-5). These rows run the bucketed /
        # banded plans at the same 600k-doc / 100k-embedding scale as the
        # search tier, min-of-N with steal%, and ASSERT no all-pairs stage
        # appears in any measured plan.
        _mark("big query tier done; phase 5 dedup/ANN starting")
        # single-shot by default: one rep of each row is minutes of 32-core
        # work (the signature kernel is the cost, not noise-prone job
        # overhead), and r6's first real execution of this phase found a
        # genuine scale bug (simhash single-block bands -> ~billions of
        # candidate pairs -> 80 GB of shuffle), so keeping the phase
        # runnable beats min-of-3 polish
        reps = int(os.environ.get("IR_BENCH_DEDUP_REPS", "1"))
        dedup_docs = int(os.environ.get("IR_BENCH_DEDUP_DOCS", "200000"))
        n_emb = int(os.environ.get("IR_BENCH_EMB", "100000"))
        from iresearch_spark.functions.dedup import (
            minhash_lsh_pairs,
            simhash_pairs,
        )
        from iresearch_spark.functions.similarity import (
            embedding_neardup_pairs,
            release_cached,
        )
        from iresearch_spark.index.build import assign_doc_ids

        cpu_d = _cpu_times()
        # slice the big corpus to the dedup tier and PLANT near-dups (2%
        # of docs duplicated under new keys): the raw synthetic corpus has
        # zero near-dup pairs, which would leave the verify stages of both
        # operators unexercised and the counts vacuously 0
        frac = max(1, (big_docs + dedup_docs - 1) // dedup_docs)
        dslice = bcorpus.where(F.xxhash64("path") % frac == 0)
        dupes = dslice.where(F.xxhash64("path", "commit") % 50 == 0).withColumn(
            "path", F.concat(F.col("path"), F.lit(".dupcopy"))
        )
        dcorpus = assign_doc_ids(
            dslice.unionByName(dupes), ["repo", "path", "commit"]
        ).persist()

        def _no_all_pairs(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan and "NestedLoop" not in plan, (
                "all-pairs stage in a dedup/ANN plan"
            )

        big_meta["dedup_docs"] = dcorpus.count()
        mh = lambda: minhash_lsh_pairs(dcorpus, text_col="content")  # noqa: E731
        # 64-bit product sketch + hamming<=1 here (the gate's md5_32/32-bit
        # is an oracle-portability constraint): same-template synthetic
        # text is simhash-DENSE — measured 3x10^8 pairs at 32-bit k<=3 over
        # 600k docs (the r6 first-run 80GB blowup, together with
        # single-block band keys) and still 8x10^6 at 64-bit k<=3 — so the
        # bench row pins the true-near-identical tier (planted dups are
        # hamming 0) instead of timing corpus pathology
        sh = lambda: simhash_pairs(  # noqa: E731
            dcorpus, text_col="content", bits=64, hash_fn="xxhash64",
            max_hamming=1,
        )
        _no_all_pairs(mh())
        _no_all_pairs(sh())
        _mark("plans checked; BigMinhashLSH starting")

        def _timed_pairs(fn):
            counts = []

            def once():
                df = fn()
                counts.append(df.count())
                release_cached(df)

            t = _min_of(reps, once)
            return t, counts[-1]

        t, n = _timed_pairs(mh)
        queries["BigMinhashLSH"] = round(t, 3)
        big_meta["minhash_pairs"] = n
        _mark("BigMinhashLSH done; BigSimhash starting")
        t, n = _timed_pairs(sh)
        queries["BigSimhash"] = round(t, 3)
        big_meta["simhash_pairs"] = n
        dcorpus.unpersist()
        bcorpus.unpersist()

        # deterministic embeddings: two copies of n_emb/2 seeded gaussian
        # bases, the second with 1% noise, so near-dup pairs exist and the
        # LSH bucket recall is exercised (no external data; Philox rng
        # keyed by vec_id keeps rows deterministic under any partitioning)
        import numpy as np
        import pandas as pd

        half = n_emb // 2

        def _gen_emb(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                out = []
                for i in ids:
                    rng = np.random.default_rng(int(i) % half)
                    v = rng.standard_normal(64)
                    if i >= half:
                        v = v + (
                            np.random.default_rng(10_000_000 + int(i)).standard_normal(64)
                            * 0.01
                        )
                    out.append(v.tolist())
                yield pd.DataFrame({"vec_id": ids, "embedding": out})

        emb = (
            spark.range(n_emb)
            .repartition(cpus)
            .mapInPandas(_gen_emb, "vec_id long, embedding array<double>")
            .persist()
        )
        emb.count()
        nd = lambda: embedding_neardup_pairs(  # noqa: E731
            emb, 64, threshold=0.99, n_planes=12, multiprobe_bits=1
        )
        _mark("BigSimhash done; BigEmbNeardup starting")
        _no_all_pairs(nd())
        t, n = _timed_pairs(nd)
        queries["BigEmbNeardup"] = round(t, 3)
        big_meta["emb_rows"] = n_emb
        big_meta["emb_neardup_pairs"] = n
        emb.unpersist()
        steal["dedup"] = _steal_pct(cpu_d, _cpu_times())

    total = time.time() - t_all
    out = {
        "metric": "index-build docs/sec + BM25 top-10 latency (packed engine, local)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "bench_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "cpus": cpus,
        "index_bytes": store.dir_bytes("bench0"),
        "steal_pct": steal,
        **big_meta,
    }
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
