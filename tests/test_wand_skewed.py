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


@pytest.fixture(scope="module")
def clustered(tmp_path_factory, spark):
    """Repo-clustered hot identifiers (the tf distribution real code
    corpora have — see tools/bench_wand.py): high-tf mass contiguous in
    docID space, low-tf leakage spanning every block."""
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i:02d}" for i in range(50)])
    p = 1.0 / np.arange(1, 51, dtype=np.float64) ** 1.1
    p /= p.sum()
    rows = []
    for i in range(1500):
        toks = vocab[rng.choice(50, size=int(rng.integers(20, 120)),
                                p=p)].tolist()
        r = min(i // 150, 9)
        if rng.random() < 0.5:
            toks += [f"h{r:02d}"] * int(rng.integers(15, 61))
        for o in rng.choice(10, size=4, replace=False):
            if int(o) != r:
                toks += [f"h{int(o):02d}"] * int(rng.integers(1, 3))
        rows.append((f"r{r:02d}", f"d/{i:05d}.py", f"{i:040d}", "en",
                     " ".join(toks)))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
              " content string")
    cat = ManifestParquetCatalog(str(tmp_path_factory.mktemp("clusteridx")))
    IndexBuilder(cat, BuildConfig(n_buckets=8, block_size=32)).build(
        spark, "cluster://corpus", corpus_df=corpus)
    return cat


@pytest.mark.parametrize("q", ["h03", "h07", "h03 AND w01"])
def test_wand_blocks_actually_skip(spark, clustered, q):
    """Round-5 regression for the block-aligned cross-term bound +
    aligned phase-1 seeds: on clustered-tf data pruning must MEASURABLY
    fire (>50% of candidate blocks skipped, via the accumulator
    telemetry) while results stay bit-identical to exhaustive — the
    pre-round-5 global bound pruned 0 blocks on every multi-term query,
    and disjoint seeds left θ at -inf for AND shapes."""
    s = Searcher(spark, clustered)
    acc = s.enable_wand_stats()
    on = [tuple(r) for r in s.search(q, k=10).collect()]
    s._wand_acc = None
    off = [tuple(r) for r in s.search(q, k=10, wand=False).collect()]
    assert on == off, q
    cand, dec = int(acc[0].value), int(acc[1].value)
    assert cand > 0 and dec < cand / 2, (q, cand, dec)


@pytest.mark.parametrize("q", [
    "h03 OR w01", "h07 OR w00 OR w05", "h03 OR h07",
    "h03 AND w01", "h05^2 OR w02",
])
def test_wand_cursor_pages_sound(spark, clustered, q):
    """Round-6 soundness regression (ADVICE high): the score-cursor θ
    pool must not be seeded by PARTIAL phase-1 scores — a previous-page
    doc whose mass sits partly in an undecoded block slips under the
    cursor with an understated score, inflates θ past the true kth
    after-cursor score, and the block-aligned phase-2 bound then prunes
    blocks holding genuine page docs.  On the clustered fixture (where
    multi-term pruning measurably fires) every WAND cursor page must be
    bit-identical to the exhaustive walk."""
    s = Searcher(spark, clustered)
    full = [(r["doc_id"], r["score"])
            for r in s.search(q, k=10**6, wand=False).collect()]
    # page budget must exceed the match count or the walk truncates
    pages = -(-len(full) // 7) + 2
    walked, cur = [], None
    for _ in range(pages):
        rows, cur2 = s.search_after(q, k=7, after=cur, wand=True,
                                    as_rows=True)
        if not rows:
            break
        walked += [(d["doc_id"], d["score"]) for d in rows]
        cur = cur2
    assert [d for d, _ in walked] == [d for d, _ in full], q
    for (wd, ws), (fd, fs) in zip(walked, full):
        assert abs(ws - fs) < 1e-9, (q, wd)
