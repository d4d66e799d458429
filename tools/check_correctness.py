"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` DuckDB
equivalent side by side, compare row count + column names + order-
insensitive values. Run with:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, ".")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "timestamp"):  # datetime
        return round(v.timestamp(), 6)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(repr(tuple(_norm(r[i]) for i in order)) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from zx_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    # Data-derived oracles (IVF centers) must read the SAME sf dir the
    # Spark queries run against, or they'd spuriously mismatch here.
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = list(df.columns)
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            oracle_cols = [d[0] for d in cur.description]
            oracle_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised: {str(e)[:160]}")
            n_fail += 1
            continue
        problems = []
        if len(spark_rows) != len(oracle_rows):
            problems.append(f"rows {len(spark_rows)} vs {len(oracle_rows)}")
        if sorted(spark_cols) != sorted(oracle_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(oracle_cols)}")
        if not problems:
            a, b = _rowset(spark_cols, spark_rows), _rowset(oracle_cols, oracle_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
