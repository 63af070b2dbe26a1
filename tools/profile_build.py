"""Stage-level build profiler (guide §1: measure first; noop-sink isolation).

Replicates bench.py's build at the same scale but times each internal
phase separately, so optimization targets the real hot stage.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python tools/profile_build.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zsolr.build import (  # noqa: E402
    BuildConfig, IndexBuilder, BuildResult, corpus_to_tokd, tokd_to_tf,
)
from zsolr.catalog import ManifestParquetCatalog  # noqa: E402
from zsolr.corpus import synth_corpus  # noqa: E402
from zsolr.docids import assign_doc_ids  # noqa: E402
from zsolr.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    replicate = int(os.environ.get("ZSOLR_BENCH_REPLICATE", "10"))
    spark = get_spark("zsolr-profile-build", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    sc = spark.sparkContext
    root = tempfile.mkdtemp(prefix="zsolr-profile-")
    t: dict[str, float] = {}
    try:
        corpus_path = os.path.join(root, "corpus_input")
        synth_corpus(spark, sf_dir, replicate=replicate).write.mode(
            "overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        corpus.count()

        cfg = BuildConfig(n_buckets=max(32, cpus))
        cat = ManifestParquetCatalog(root)
        builder = IndexBuilder(cat, cfg)

        t0 = time.time()
        sc.setJobDescription("profile: assign_doc_ids")
        with_ids = assign_doc_ids(corpus, cfg.doc_id_partitions)
        t["assign_doc_ids"] = time.time() - t0

        t0 = time.time()
        sc.setJobDescription("profile: tokd->tf write")
        tokd = corpus_to_tokd(with_ids, cfg.tokenizer,
                              scored_fields=cfg.scored_fields)
        tf = tokd_to_tf(tokd, cfg.n_buckets, positions=cfg.positions,
                        scored_fields=cfg.scored_fields)
        cat.write(tf, "tfs", mode="overwrite")
        t["write_tfs"] = time.time() - t0

        t0 = time.time()
        sc.setJobDescription("profile: docs write")
        docs = tokd.drop("toks")
        cat.write(docs, "docs", mode="overwrite")
        t["write_docs"] = time.time() - t0
        spark.catalog.clearCache()

        result = BuildResult(build_id="prof", fingerprint="prof",
                             n_docs=0, avgdl=0.0)
        t0 = time.time()
        sc.setJobDescription("profile: stats")
        width = builder._stage_stats(spark, "prof", "prof", result)
        t["stats"] = time.time() - t0

        t0 = time.time()
        sc.setJobDescription("profile: postings")
        builder._stage_postings(spark, "prof", "prof", result.n_docs,
                                result, {}, align_width=width)
        t["postings"] = time.time() - t0
        t["total"] = sum(v for k, v in t.items())
        print(json.dumps({"timings_s": {k: round(v, 2)
                                        for k, v in t.items()},
                          "stages": result.stages}))
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
