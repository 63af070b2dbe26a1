"""Block-max WAND correctness on a corpus with real tf/df skew (the
fixture's uniform 31-word vocabulary makes all block upper bounds tie, so
this synthesizes the distribution WAND exists for) — SURVEY.md R5 gate:
WAND on == WAND off == oracle, on data where pruning genuinely fires."""

import random

import pytest

from zsolr.build import BuildConfig, IndexBuilder
from zsolr.catalog import ManifestParquetCatalog
from zsolr.parse import parse
from zsolr.search import Searcher

from tests.oracle import OracleIndex


@pytest.fixture(scope="module")
def skewed(tmp_path_factory, spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(800):
        n = rng.randint(20, 120)
        # zipf-ish term choice + occasional heavy repetition of one term
        toks = [vocab[min(39, int(rng.expovariate(0.12)))] for _ in range(n)]
        if i % 13 == 0:
            toks += ["w5"] * rng.randint(30, 90)   # high-tf outlier docs
        if i % 3 == 0:
            toks += ["w0"] * rng.randint(1, 4)
        text = " ".join(toks)
        rows.append(("r" + str(i % 7), f"f/{i}.py", f"{i:040d}", "en", text))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
              " content string").cache()
    cat = ManifestParquetCatalog(str(tmp_path_factory.mktemp("skewidx")))
    IndexBuilder(cat, BuildConfig(n_buckets=8, block_size=32,
                                  hot_df_threshold=100)).build(
        spark, "skew://corpus", corpus_df=corpus)
    docs = cat.read(spark, "docs").select("doc_id", "repo", "path", "lang")
    j = corpus.join(docs, ["repo", "path"]).select(
        "doc_id", "content", docs["lang"].alias("lang"), "repo", "path")
    oracle = OracleIndex([r.asDict() for r in j.collect()])
    return cat, oracle


@pytest.mark.parametrize("q", [
    "w5", "w0", "w1 AND w2", "w5 OR w38", "w0 AND NOT w5",
    "w3 AND w4", "w5 AND w0", "w2 OR w3 OR w17",
    # round-2 surface on genuinely skewed data: boosts (scaled UBs must
    # keep pruning safe), prefix/fuzzy constant-score legs, meta-in-OR
    "w5^2 OR w38", "w0^0.5 AND w1", "w3^3 OR w17^2",
    "w1* AND w5", "w39~1 OR w2", "lang:en OR w5",
])
def test_wand_rank_identity_under_skew(spark, skewed, q):
    cat, oracle = skewed
    s = Searcher(spark, cat)
    wand = [(r["doc_id"], r["score"]) for r in s.search(q, k=10).collect()]
    full = [(r["doc_id"], r["score"])
            for r in s.search(q, k=10, wand=False).collect()]
    exp = oracle.search(parse(q), k=10)
    assert wand == full, q
    assert [w[0] for w in wand] == [e[0] for e in exp], q
    for w, e in zip(wand, exp):
        assert abs(w[1] - e[1]) < 1e-9
