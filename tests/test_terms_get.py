"""Round-7 facade additions: Solr TermsComponent (/terms), realtime get
(/get), and spellcheck.collate."""

import pytest

from zsolr.connection import SolrConnection
from zsolr.search import Searcher, UnsupportedQuery


@pytest.fixture(scope="module")
def conn(spark, built_index, corpus_df):
    cat, _res = built_index
    return SolrConnection(spark, cat, corpus_df=corpus_df)


@pytest.fixture(scope="module")
def oracle_tf(corpus_df):
    """term → document frequency over the analyzed corpus."""
    import collections

    from zsolr.analyze import tokenize_py

    df = collections.Counter()
    langs = collections.Counter()
    for r in corpus_df.select("content", "lang").collect():
        df.update(set(tokenize_py(r["content"])))
        if r["lang"] is not None:
            langs[r["lang"]] += 1
    return df, langs


def test_terms_count_sort(conn, oracle_tf):
    df, _langs = oracle_tf
    got = conn.terms(field="content", limit=5)
    exp = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(got.items()) == exp


def test_terms_index_sort_prefix(conn, oracle_tf):
    df, _langs = oracle_tf
    got = conn.terms(field="content", prefix="s", sort="index", limit=100)
    exp = sorted((t, c) for t, c in df.items() if t.startswith("s"))
    assert list(got.items()) == exp


def test_terms_mincount_maxcount_regex(conn, oracle_tf):
    df, _langs = oracle_tf
    lo, hi = 50, 400
    got = conn.terms(field="content", limit=1000, mincount=lo,
                     maxcount=hi, regex="^s.*")
    exp = {t: c for t, c in df.items()
           if lo <= c <= hi and t.startswith("s")}
    assert got == exp


def test_terms_metadata_field(conn, oracle_tf):
    _df, langs = oracle_tf
    got = conn.terms(field="lang", limit=100)
    assert got == dict(langs)


def test_terms_scored_path_field(spark, tmp_path_factory, corpus_df,
                                 sf_dir):
    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog

    root = str(tmp_path_factory.mktemp("terms-dm"))
    cat = ManifestParquetCatalog(root)
    IndexBuilder(cat, BuildConfig(
        n_buckets=4, scored_fields=("content", "path"))).build(
        spark, "terms-dm", corpus_df=corpus_df)
    s = Searcher(spark, cat)
    got = {r["term"]: r["df"]
           for r in s.terms("path", prefix="dir", limit=100).collect()}
    import collections

    from zsolr.analyze import tokenize_py

    exp = collections.Counter()
    for r in corpus_df.select("path").collect():
        exp.update(t for t in set(tokenize_py(r["path"]))
                   if t.startswith("dir"))
    assert got == dict(exp)
    # the path norms sidecar must never surface as a term
    allt = {r["term"] for r in s.terms("path", limit=10000).collect()}
    assert not any(t.startswith("\x00") or t.startswith("\x01")
                   for t in allt)


def test_terms_guards(conn):
    with pytest.raises(UnsupportedQuery, match="unknown field"):
        conn.terms(field="nope")
    with pytest.raises(UnsupportedQuery, match="sort"):
        conn.terms(field="content", sort="alpha")


def test_realtime_get(conn, corpus_df):
    row = corpus_df.select("repo", "path", "commit",
                           "lang").limit(1).collect()[0]
    doc = conn.get(row["repo"], row["path"])
    assert doc is not None
    assert doc["commit"] == row["commit"] and doc["lang"] == row["lang"]
    assert "doc_id" in doc and "content_sha256" in doc
    assert conn.get("no-such-repo", "no/such/path.py") is None


def test_get_sees_lifecycle_ops(tmp_path, spark):
    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog

    corpus = spark.createDataFrame(
        [("r0", "a.py", "c0", "en", "spark join")],
        "repo string, path string, commit string, lang string,"
        " content string")
    cat = ManifestParquetCatalog(str(tmp_path / "g"))
    IndexBuilder(cat, BuildConfig(n_buckets=4)).build(
        spark, "g", corpus_df=corpus)
    conn = SolrConnection(spark, cat, corpus_df=corpus)
    assert conn.get("r0", "a.py")["lang"] == "en"
    conn.add([{"repo": "r0", "path": "a.py", "lang": {"set": "de"}}])
    assert conn.get("r0", "a.py")["lang"] == "de"   # fresh after atomic
    conn.delete(id=[conn.get("r0", "a.py")["doc_id"]])
    assert conn.get("r0", "a.py") is None           # tombstone applied


def test_spellcheck_collation(conn):
    res = conn.search("sparl AND windoq", rows=5, spellcheck=True,
                      spellcheck_collate=True)
    col = res.spellcheck.get("collation")
    assert col is not None
    # the collation substitutes each word's TOP suggestion (engine ranks
    # candidates df-desc — the round-4 spellcheck contract)
    suggs = res.spellcheck["suggestions"]
    expected = f"{suggs['sparl'][0]} AND {suggs['windoq'][0]}"
    assert col["collationQuery"] == expected
    ref = conn.search(expected, rows=0)
    assert col["hits"] == ref.hits and col["hits"] > 0
    # well-spelled query → suggestions empty, no collation
    res2 = conn.search("spark", rows=5, spellcheck=True,
                       spellcheck_collate=True)
    assert res2.spellcheck == {"suggestions": {}}
