"""End-to-end training-set curation (round-6): exact dedup → near-dup
keep → lang/quality filters → deterministic token-budget cut, verified
against a driver-side recomposition from the individually-oracle-tested
operator outputs."""

import pytest
from pyspark.sql import functions as F

from zsolr import ops

from .test_ops import _union_find


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_token_budget_cut_is_exact_prefix(spark, docs):
    with_tok = docs.join(ops.token_count_bpe(docs), "doc_id")
    budget = 5_000
    got = sorted(r["doc_id"] for r in
                 ops.token_budget_cut(with_tok, budget).collect())
    rows = sorted((r["doc_id"], r["n_bpe_tokens"])
                  for r in with_tok.select("doc_id",
                                           "n_bpe_tokens").collect())
    exp, acc = [], 0
    for d, n in rows:
        acc += n
        if acc > budget:
            break
        exp.append(d)
    assert got == exp and 0 < len(got) < docs.count()
    # the kept set is a PREFIX of the id order: every kept id precedes
    # every dropped id
    dropped = {d for d, _ in rows} - set(got)
    assert not dropped or max(got) < min(dropped)


def test_token_budget_cut_edges(spark, docs):
    with_tok = docs.join(ops.token_count_bpe(docs), "doc_id")
    assert ops.token_budget_cut(with_tok, 0).count() == 0
    total = with_tok.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert ops.token_budget_cut(with_tok, int(total)).count() == \
        docs.count()


def _brute_pipeline(spark, docs, lang, max_stop, min_tok, budget):
    """Recompose the pipeline driver-side from the ops' own outputs
    (each independently oracle-tested); only the COMPOSITION is under
    test here."""
    text = {r["doc_id"]: r for r in docs.collect()}
    # 1. exact dedup: min id per text
    by_text: dict = {}
    for d, r in sorted(text.items()):
        by_text.setdefault(r["text"], d)
    keep = set(by_text.values())
    # 2. near-dup keep over the exact-deduped set
    kept_docs = docs.filter(F.col("doc_id").isin(list(keep)))
    pairs = [(r["doc_a"], r["doc_b"]) for r in
             ops.minhash_lsh_pairs(kept_docs).collect()]
    canon = _union_find(pairs)
    keep = {d for d in keep if canon.get(d, d) == d}
    # 3-4. features + filters
    feats = {r["doc_id"]: r for r in
             ops.lang_id_ngram(docs).join(
                 ops.quality_score(docs).select("doc_id", "stop_ratio"),
                 "doc_id").join(ops.token_count_bpe(docs),
                                "doc_id").collect()}
    keep = {d for d in keep
            if feats[d]["pred_lang"] == lang
            and feats[d]["stop_ratio"] <= max_stop
            and feats[d]["n_bpe_tokens"] >= min_tok}
    # 5. budget prefix
    out, acc = [], 0
    for d in sorted(keep):
        acc += feats[d]["n_bpe_tokens"]
        if acc > budget:
            break
        out.append(d)
    return out


def test_build_training_set_matches_recomposition(spark, docs):
    kw = dict(lang="en", max_stop_ratio=0.5, min_tokens=10,
              token_budget=20_000)
    got = ops.build_training_set(docs, near_dup=True, **kw)
    got_rows = got.collect()
    exp = _brute_pipeline(spark, docs, kw["lang"], kw["max_stop_ratio"],
                          kw["min_tokens"], kw["token_budget"])
    assert sorted(r["doc_id"] for r in got_rows) == exp
    assert exp  # the fixture must survive the filters
    # curated rows carry the feature columns
    assert {"pred_lang", "stop_ratio", "n_bpe_tokens"} <= \
        set(got.columns)
    assert all(r["pred_lang"] == "en" and r["stop_ratio"] <= 0.5
               and r["n_bpe_tokens"] >= 10 for r in got_rows)


def test_build_training_set_stages_optional(spark, docs):
    """near_dup=False + no filters = exact dedup + features only."""
    got = ops.build_training_set(docs, near_dup=False)
    by_text: dict = {}
    for r in sorted(docs.collect(), key=lambda r: r["doc_id"]):
        by_text.setdefault(r["text"], r["doc_id"])
    assert sorted(r["doc_id"] for r in got.collect()) == \
        sorted(by_text.values())
