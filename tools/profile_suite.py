"""Serial + batch query-suite timer against a freshly built bench-shaped
index (same scale/config as bench.py, build untimed).  Prints one JSON
line — used for query-path A/Bs without paying a full bench run.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python tools/profile_suite.py
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zsolr.build import BuildConfig, IndexBuilder  # noqa: E402
from zsolr.catalog import ManifestParquetCatalog  # noqa: E402
from zsolr.corpus import synth_corpus  # noqa: E402
from zsolr.search import Searcher  # noqa: E402
from zsolr.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    replicate = int(os.environ.get("ZSOLR_BENCH_REPLICATE", "10"))
    reps = int(os.environ.get("ZSOLR_BENCH_QUERY_REPS", "3"))
    spark = get_spark("zsolr-profile-suite", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    root = tempfile.mkdtemp(prefix="zsolr-profile-s-")
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from queryset import reference_queries

    queries: dict[str, float] = {}
    try:
        corpus_path = os.path.join(root, "corpus_input")
        synth_corpus(spark, sf_dir, replicate=replicate).write.mode(
            "overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        corpus.count()
        cat = ManifestParquetCatalog(root)
        IndexBuilder(cat, BuildConfig(n_buckets=max(32, cpus))).build(
            spark, corpus_path, corpus_df=corpus)
        searcher = Searcher(spark, cat)
        for qi, q in enumerate(reference_queries()):
            best = None
            for _ in range(reps):
                tq = time.time()
                searcher.search(q, k=10).collect()
                dt = time.time() - tq
                best = dt if best is None else min(best, dt)
            queries[f"q{qi:02d}"] = round(best, 4)
        serial = sum(queries.values())

        serial_rows = [
            [tuple(r) for r in searcher.search(q, k=10).collect()]
            for q in reference_queries()]
        batch_best = None
        for _ in range(reps):
            tb = time.time()
            batch_dfs = searcher.search_batch(list(reference_queries()), k=10)
            batch_rows = [[tuple(r) for r in df.collect()]
                          for df in batch_dfs]
            dtb = time.time() - tb
            batch_best = dtb if batch_best is None else min(batch_best, dtb)
        assert batch_rows == serial_rows, "batch != serial results"
        print(json.dumps({"serial_suite_s": round(serial, 3),
                          "batch_suite_s": round(batch_best, 4),
                          "queries": queries}))
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
