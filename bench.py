"""Headline benchmark (driver-run per round; see BENCH/BASELINE.md).

Builds the inverted index over the sf corpus (deterministically replicated
to ~50k files at sf0.1 per FIXTURES.md §1) and runs the reference query set
(SURVEY.md Appendix B) against the warm index.  Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {"build": s, "q00_spark": s, ...}, "sf": ...}
plus derived throughput/latency fields (files_per_sec, p95_query_ms).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default nproc), ZSOLR_BENCH_REPLICATE (default 10),
     ZSOLR_BENCH_QUERY_REPS (default 3 — p95 needs a sample per query).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    replicate = int(os.environ.get("ZSOLR_BENCH_REPLICATE", "10"))
    reps = int(os.environ.get("ZSOLR_BENCH_QUERY_REPS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0

    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog
    from zsolr.corpus import synth_corpus
    from zsolr.search import Searcher
    from zsolr.session import get_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    from queryset import reference_queries

    spark = get_spark("zsolr-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    root = tempfile.mkdtemp(prefix="zsolr-bench-")
    queries: dict[str, float] = {}
    try:
        # stage the synthesized corpus as a real parquet table first (the
        # mandated input is a stored Iceberg/parquet table of files, not a
        # generator lineage) — staging is outside the build timer
        corpus_path = os.path.join(root, "corpus_input")
        synth_corpus(spark, sf_dir, replicate=replicate).write.mode(
            "overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        n_files = corpus.count()

        t0 = time.time()
        cat = ManifestParquetCatalog(root)
        res = IndexBuilder(cat, BuildConfig(n_buckets=max(32, cpus))).build(
            spark, corpus_path, corpus_df=corpus)
        build_s = time.time() - t0
        queries["build"] = round(build_s, 3)

        searcher = Searcher(spark, cat)
        lat_ms: list[float] = []
        for qi, q in enumerate(reference_queries()):
            best = None
            for _ in range(reps):
                tq = time.time()
                searcher.search(q, k=10).collect()
                dt = time.time() - tq
                lat_ms.append(dt * 1000)
                best = dt if best is None else min(best, dt)
            queries[f"q{qi:02d}_{re.sub('[^a-z0-9]+', '_', q.lower())[:24]}"] = \
                round(best, 4)
        lat_ms.sort()
        p95 = lat_ms[int(0.95 * (len(lat_ms) - 1))]
        p50 = lat_ms[len(lat_ms) // 2]
        total = round(build_s + sum(v for k, v in queries.items()
                                    if k != "build"), 3)

        # batched mode: the whole reference set in ONE kernel wave + ONE
        # doc fetch (search_batch); results are bit-identical to the
        # serial path (asserted here on every run)
        serial_rows = [
            [tuple(r) for r in searcher.search(q, k=10).collect()]
            for q in reference_queries()]
        batch_best = None
        for _ in range(reps):
            tb = time.time()
            batch_dfs = searcher.search_batch(list(reference_queries()),
                                              k=10)
            batch_rows = [[tuple(r) for r in df.collect()]
                          for df in batch_dfs]
            dtb = time.time() - tb
            batch_best = dtb if batch_best is None else min(batch_best, dtb)
        assert batch_rows == serial_rows, "batch != serial results"
        serial_suite = sum(v for k, v in queries.items() if k != "build")
        queries["batch_suite"] = round(batch_best, 4)

        # training-data ops at the same sf (separate section — NOT part of
        # `value`, which stays comparable to BENCH/BASELINE.md)
        ops_s: dict[str, float] = {}
        try:
            from zsolr import ops as zops

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            qv = [float(x) for x in
                  emb.filter("vec_id = 0").collect()[0]["embedding"]]
            ops_runs = {
                "dedup_exact": lambda: zops.dedup_exact(docs).count(),
                "dedup_minhash_lsh": lambda: zops.minhash_lsh_pairs(
                    docs).count(),
                "simhash": lambda: zops.simhash32(docs).count(),
                "doc_fingerprint": lambda: zops.doc_fingerprint(
                    docs).count(),
                "lang_id_ngram": lambda: zops.lang_id_ngram(docs).count(),
                "ann_lsh_topk": lambda: zops.lsh_bucket_topk(
                    emb, qv, k=10).count(),
                "sessionize_events": lambda: zops.sessionize_events(
                    spark.read.parquet(f"{sf_dir}/events.parquet")).count(),
                "dedup_components": lambda: zops.dedup_components(
                    zops.minhash_lsh_pairs(
                        docs.filter("doc_id % 10 = 0"))).count(),
                "dedup_embedding_cosine": lambda:
                    zops.dedup_embedding_cosine(emb).count(),
            }
            for name, fn in ops_runs.items():
                t0 = time.time()
                fn()
                ops_s[name] = round(time.time() - t0, 3)
        except Exception as e:  # ops bench is best-effort
            ops_s["error"] = str(e)[:200]
        out = {
            "metric": "index-build + BM25 top-10 query suite wall time",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "n_files": n_files,
            "n_docs": res.n_docs,
            "files_per_sec": round(n_files / build_s, 1),
            "p50_query_ms": round(p50, 1),
            "p95_query_ms": round(p95, 1),
            "batch_suite_s": round(batch_best, 4),
            "batch_speedup": round(serial_suite / batch_best, 2)
            if batch_best else None,
            "cpus": cpus,
            "replicate": replicate,
            "ops": ops_s,
        }
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
