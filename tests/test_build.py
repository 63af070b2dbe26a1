"""Index-build correctness (SURVEY.md §5 rings 1+3): golden rows, sha256
invariant, docID determinism, tokenizer-twin identity."""

import hashlib

import pytest
from pyspark.sql import functions as F

from zsolr.analyze import tokenize_arrow, tokenize_codegen, tokenize_py
from zsolr.build import term_bucket
from zsolr.corpus import synth_corpus
from zsolr.docids import assign_doc_ids


def test_corpus_shape_and_sha(spark, corpus_df):
    assert corpus_df.columns == ["repo", "path", "commit", "lang", "content"]
    rows = corpus_df.orderBy("repo", "path").limit(5).collect()
    for r in rows:
        exp = hashlib.sha256(
            f"{r['repo']}/{r['path']}@{r['path'].split('_')[1].split('.')[0]}"
            .encode()).hexdigest()[:40]
        assert r["commit"] == exp


def test_docids_dense_and_deterministic(spark, corpus_df):
    a = assign_doc_ids(corpus_df, num_partitions=3)
    b = assign_doc_ids(corpus_df, num_partitions=17)
    ra = {(r["repo"], r["path"]): r["doc_id"] for r in a.collect()}
    rb = {(r["repo"], r["path"]): r["doc_id"] for r in b.collect()}
    spark.catalog.clearCache()
    assert ra == rb  # parallelism-independent (north_rule rank-identity dep)
    ids = sorted(ra.values())
    assert ids == list(range(len(ids)))  # dense 0..N-1
    # rank order == sort order by (repo, path, commit)
    keys = sorted(ra, key=lambda k: ra[k])
    assert keys == sorted(keys)


def test_tokenizer_twins_identical(spark, corpus_df):
    df = corpus_df.limit(50).select(
        "content",
        tokenize_arrow(F.col("content")).alias("a"),
        tokenize_codegen(F.col("content")).alias("b"),
    )
    for r in df.collect():
        assert r["a"] == r["b"] == tokenize_py(r["content"])


def test_tokenizer_edge_cases(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("Foo-BAR_baz 42x",), ("...",)], "content string")
    out = df.select(tokenize_arrow("content").alias("a"),
                    tokenize_codegen(F.col("content")).alias("b")).collect()
    exp = [[], [], ["foo", "bar", "baz", "42x"], []]
    assert [r["a"] for r in out] == exp
    assert [r["b"] for r in out] == exp


def test_docs_table_sha_invariant(spark, built_index, corpus_df):
    """Per-row content sha256 equality corpus → docs (BASELINE input_hint)."""
    cat, _res = built_index
    docs = cat.read(spark, "docs")
    j = (corpus_df.withColumn("expected", F.sha2("content", 256))
         .join(docs, ["repo", "path", "commit"]))
    bad = j.filter(F.col("expected") != F.col("content_sha256")).count()
    assert bad == 0
    assert j.count() == corpus_df.count()


def test_doc_len_matches_python(spark, built_index, corpus_df):
    cat, _res = built_index
    docs = cat.read(spark, "docs")
    j = corpus_df.join(docs, ["repo", "path"]).select("content", "doc_len")
    for r in j.limit(100).collect():
        assert r["doc_len"] == len(tokenize_py(r["content"]))


def test_term_stats_df(spark, built_index, corpus_df):
    cat, _res = built_index
    stats = {r["term"]: r["df"]
             for r in cat.read(spark, "term_stats").collect()}
    texts = [r["content"] for r in corpus_df.collect()]
    from collections import Counter
    exp = Counter()
    for t in texts:
        exp.update(set(tokenize_py(t)))
    content_stats = {t: df for t, df in stats.items()
                     if "=" not in t and not t.startswith("\x00")}
    assert content_stats == dict(exp)
    # field terms indexed too: df of `lang=en` == docs with lang == 'en'
    langs = Counter(r["lang"] for r in corpus_df.select("lang").collect())
    for lang, n in langs.items():
        assert stats[f"lang={lang}"] == n


def test_postings_roundtrip_full(spark, built_index):
    """Decode every posting block; totals must equal term_stats df."""
    import numpy as np
    from zsolr import codec
    cat, _res = built_index
    rows = cat.read(spark, "postings").collect()
    per_term: dict[str, list] = {}
    for r in rows:
        ids, tfs = codec.decode_block(r["first_doc"], r["doc_gaps"], r["tfs"])
        assert len(ids) == r["n_docs"]
        assert ids[0] == r["first_doc"] and ids[-1] == r["last_doc"]
        assert int(tfs.max()) == r["block_max_tf"]
        assert r["bucket"] == term_bucket(r["term"], 8)
        per_term.setdefault(r["term"], []).append(ids)
    stats = {r["term"]: r["df"]
             for r in cat.read(spark, "term_stats").collect()}
    for t, chunks in per_term.items():
        all_ids = np.concatenate(chunks)
        assert len(np.unique(all_ids)) == len(all_ids) == stats[t]


def test_salting_was_exercised(built_index):
    _cat, res = built_index
    g0 = res.stages.get("postings_g0", {})
    assert g0.get("hot_terms", 0) > 0, "test config must trigger hot-term salting"
