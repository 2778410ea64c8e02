"""Local simulation of the driver's correctness gate: run every registry
query through Spark AND its DuckDB oracle at a given sf_dir, compare
row-count / schema / values. Usage:

    python scripts/gate_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys


def compare(spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f"rows {len(spark_rows)} != {len(duck_rows)}"

    def norm(rows):
        out = []
        for r in rows:
            out.append(tuple(r[c] if not isinstance(r[c], float) else round(r[c], 9) for c in cols))
        return sorted(out, key=lambda t: tuple(str(x) for x in t))

    a, b = norm(spark_rows), norm(duck_rows)
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return f"value mismatch at sorted row {i}: spark={x} duck={y}"
    return None


def main():
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from iresearch_spark.session import get_spark

    spark = get_spark("gate-check", cores=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in E.TABLES:
        import os

        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [{c: r[c] for c in scols} for r in sdf.collect()]
        except Exception as e:
            print(f"{name:24s} SPARK ERROR: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(srows)} (no_oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck = con.execute(oracles[name])
            dcols = [d[0] for d in duck.description]
            drows = [dict(zip(dcols, row)) for row in duck.fetchall()]
        except Exception as e:
            print(f"{name:24s} DUCK ERROR: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"{name:24s} SCHEMA MISMATCH spark={scols} duck={dcols}")
            failures += 1
            continue
        err = compare(srows, drows, sorted(scols))
        if err:
            print(f"{name:24s} FAIL: {err} [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"{name:24s} ok rows={len(srows)} [{time.time()-t0:.1f}s]")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
