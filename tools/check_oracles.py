"""Driver-mimic: run every __spark_entry__ queries()[name] on Spark and its
oracle_sql()[name] on DuckDB at the given sf dir; compare row count, sorted
column names, and order-insensitive values.  Usage:
    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from zsolr.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # data-dependent oracle literals (ann_ivf_trained's codebook) must be
    # derived from the SAME sf dir the comparison runs at
    os.environ["ZSOLR_ORACLE_SF_DIR"] = sf
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracle without query: {missing}"
    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sorted(sdf.columns)
            srows = [tuple(norm(r[c]) for c in scols) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:22s} spark error: {str(e)[:160]}")
            n_bad += 1
            continue
        if name not in os_:
            print(f"ROWS  {name:22s} rows={len(srows)} cols={scols} "
                  f"({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            rel = con.sql(os_[name])
            ocols = sorted(rel.columns)
            idx = [rel.columns.index(c) for c in ocols]
            orows = [tuple(norm(row[i]) for i in idx) for row in rel.fetchall()]
        except Exception as e:
            print(f"FAIL  {name:22s} duckdb error: {str(e)[:160]}")
            n_bad += 1
            continue
        ok_cols = scols == ocols
        ok_count = len(srows) == len(orows)
        ok_vals = sorted(srows) == sorted(orows)
        if ok_cols and ok_count and ok_vals:
            print(f"OK    {name:22s} rows={len(srows)} ({time.time()-t0:.1f}s)")
        else:
            n_bad += 1
            print(f"FAIL  {name:22s} cols {scols} vs {ocols} | "
                  f"rows {len(srows)} vs {len(orows)}")
            if ok_cols:
                s_only = sorted(set(srows) - set(orows))[:3]
                o_only = sorted(set(orows) - set(srows))[:3]
                print(f"      spark-only: {s_only}")
                print(f"      duck-only : {o_only}")
    print(f"\n{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
