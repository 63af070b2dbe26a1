"""Capture .explain('formatted') for every operator touched in round 8,
writing plans/r08/<name>_{before,after}.txt.  Run once from the round-7
worktree with MODE=before and once from this tree with MODE=after:

    MODE=before PYTHONPATH=/tmp/r7tree python tools/capture_plans_r08.py
    MODE=after  PYTHONPATH=/root/repo  python tools/capture_plans_r08.py

Uses sf0.001 so the plans are cheap; plan SHAPE (Exchange count, node
types, pushdown) is scale-independent.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
import shutil

mode = os.environ.get("MODE", "after")
src_root = os.environ.get("PYTHONPATH", "/root/repo")
sys.path.insert(0, src_root)
OUT = "/root/repo/plans/r08"
os.makedirs(OUT, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from zsolr.session import get_spark  # noqa: E402
from zsolr.build import BuildConfig, IndexBuilder, corpus_to_tokd, \
    tokd_to_tf  # noqa: E402
from zsolr.catalog import ManifestParquetCatalog  # noqa: E402
from zsolr.corpus import synth_corpus  # noqa: E402
from zsolr.docids import assign_doc_ids  # noqa: E402
from zsolr.search import Searcher  # noqa: E402
from zsolr import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


def grab(df) -> str:
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    return buf.getvalue()


def save(name: str, df):
    with open(os.path.join(OUT, f"{name}_{mode}.txt"), "w") as f:
        f.write(grab(df))
    print("captured", name)


def main():
    spark = get_spark(f"plans-r08-{mode}", master="local[8]",
                      shuffle_partitions=16)
    root = tempfile.mkdtemp(prefix=f"zsolr-plans-{mode}-")
    try:
        corpus = synth_corpus(spark, SF)
        with_ids = assign_doc_ids(corpus)
        save("build_docids", with_ids)
        tokd = corpus_to_tokd(with_ids)
        tf = tokd_to_tf(tokd, 16)
        save("build_tfs", tf)

        cat = ManifestParquetCatalog(root)
        IndexBuilder(cat, BuildConfig(n_buckets=16)).build(
            spark, f"{SF}/corpus", corpus_df=corpus)
        # postings pre-grouping (round 8: per-group sort_array → codegen
        # partition sort feeding collect_list; kernel verifies order)
        from zsolr.build import grouped_postings
        tf_read = cat.read(spark, "tfs").withColumn("salt", F.lit(0))
        if mode == "before":
            par = spark.sparkContext.defaultParallelism
            save("build_postings_group",
                 grouped_postings(tf_read.repartition(par * 8, "term",
                                                      "salt")))
        else:
            save("build_postings_group", grouped_postings(tf_read))
        s = Searcher(spark, cat)
        save("query_result_page", s.search("hash AND join", k=10))
        save("query_match_scores", s.match_scores("hash AND join"))

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        pairs = ops.minhash_lsh_pairs(docs)
        save("ops_minhash_lsh_pairs", pairs)
        save("ops_simhash32", ops.simhash32(docs))
        qv = [float(x) for x in
              emb.filter("vec_id = 0").collect()[0]["embedding"]]
        save("ops_lsh_bucket_topk", ops.lsh_bucket_topk(emb, qv, k=5))
        save("ops_dedup_embedding_cosine", ops.dedup_embedding_cosine(emb))
        # dedup_components' edge frame (the loop localCheckpoints, so the
        # returned plan hides lineage): mirror the function's first lines
        e = pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
        both = e.unionByName(e.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
        if mode == "before":
            both = both.distinct()
        save("ops_dedup_components_edges", both)
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
