"""Manual smoke driver for fast iteration (not collected by pytest)."""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from zsolr.build import BuildConfig, IndexBuilder
from zsolr.catalog import ManifestParquetCatalog
from zsolr.corpus import synth_corpus
from zsolr.search import Searcher
from zsolr.session import get_spark

from tests.oracle import OracleIndex
from tests.queryset import reference_queries
from zsolr.parse import parse


def main():
    spark = get_spark("smoke", master="local[4]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    corpus = synth_corpus(spark, sf)
    corpus.show(3, truncate=60)
    root = tempfile.mkdtemp(prefix="zsolr-smoke-")
    cat = ManifestParquetCatalog(root)
    builder = IndexBuilder(cat, BuildConfig(n_buckets=8, hot_df_threshold=200))
    res = builder.build(spark, f"{sf}/corpus", corpus_df=corpus)
    print("BUILD:", res.n_docs, res.avgdl, res.stages)

    rows = [r.asDict() for r in
            cat.read(spark, "docs").select("doc_id", "repo", "path", "commit",
                                           "lang").collect()]
    content = {r["doc_id"]: t for r, t in zip(
        sorted(rows, key=lambda r: r["doc_id"]), [None])}  # placeholder
    # oracle needs content: rebuild from corpus with ids via docs join
    docs = cat.read(spark, "docs").select("doc_id", "repo", "path", "lang")
    j = corpus.join(docs, ["repo", "path"]).select(
        "doc_id", "content", docs["lang"].alias("lang"), "repo", "path").collect()
    oracle = OracleIndex([r.asDict() for r in j])
    print("oracle N", oracle.n, "avgdl", oracle.avgdl)

    s = Searcher(spark, cat)
    bad = 0
    for q in reference_queries():
        got = [(r["doc_id"], r["score"]) for r in s.search(q, k=10).collect()]
        exp = oracle.search(parse(q), k=10)
        ok = len(got) == len(exp) and all(
            g[0] == e[0] and abs(g[1] - e[1]) < 1e-9 for g, e in zip(got, exp))
        nowand = [(r["doc_id"], r["score"]) for r in
                  s.search(q, k=10, wand=False).collect()]
        wand_ok = got == nowand
        print(f"{'OK ' if ok and wand_ok else 'FAIL'} {q!r} got={got[:3]} exp={exp[:3]} wand_eq={wand_ok}")
        if not (ok and wand_ok):
            bad += 1
    print("FAILURES:", bad)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
