"""Solr atomic updates (set / null-set field ops) + the round-7
lifecycle↔dismax integration fixes: delta appends recover the build-time
scored_fields schema from index_stats, and _refresh_stats preserves
per-field avgdl across deletes/updates."""

import pytest

from zsolr.build import BuildConfig, IndexBuilder
from zsolr.catalog import ManifestParquetCatalog
from zsolr.connection import SolrConnection
from zsolr.lifecycle import atomic_update, delete_by_ids, incremental_add
from zsolr.search import Searcher


def _fresh(tmp_path, spark, corpus_df, name, **cfg_kw):
    cat = ManifestParquetCatalog(str(tmp_path / name))
    IndexBuilder(cat, BuildConfig(n_buckets=4, **cfg_kw)).build(
        spark, name, corpus_df=corpus_df)
    return cat


@pytest.fixture()
def small_corpus(spark):
    rows = [
        ("r0", "a.py", "c0", "en", "spark join window", "2024-01-10T00:00:00Z"),
        ("r0", "b.py", "c1", "en", "spark hash batch", "2024-02-10T00:00:00Z"),
        ("r1", "c.js", "c2", "de", "stream window spark", "2024-03-10T00:00:00Z"),
        ("r1", "d.rs", "c3", "fr", "query scan merge", "2024-04-10T00:00:00Z"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
              " content string, ts_s string")
    from pyspark.sql import functions as F
    return df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_atomic_set_metadata(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "am")
    n0 = Searcher(spark, cat).n_docs_total
    res = atomic_update(spark, cat,
                        [{"repo": "r0", "path": "a.py",
                          "lang": {"set": "de"}}],
                        corpus_df=small_corpus)
    assert res == {"updated": 1}
    s = Searcher(spark, cat)
    # live doc count unchanged (tombstone + re-add)
    assert s.n_docs_total == n0
    de = {r["path"] for r in s.search("spark AND lang:de", k=10).collect()}
    assert de == {"a.py", "c.js"}
    en = {r["path"] for r in s.search("spark AND lang:en", k=10).collect()}
    assert en == {"b.py"}
    # content untouched: same terms match, sha equal
    hit = [r for r in s.search("join", k=10).collect()
           if r["path"] == "a.py"]
    assert len(hit) == 1
    sha = {r["path"]: r["content_sha256"] for r in
           cat.read(spark, "docs").select("path", "content_sha256")
           .collect()}
    import hashlib
    assert sha["a.py"] == hashlib.sha256(
        b"spark join window").hexdigest()


def test_atomic_null_set_counts_as_missing(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "an")
    atomic_update(spark, cat,
                  [{"repo": "r0", "path": "a.py", "lang": {"set": None}}],
                  corpus_df=small_corpus)
    s = Searcher(spark, cat)
    ranked, _hits = s.facet_fields("spark", ["lang"], with_hits=True,
                                   missing=True)
    vals = dict(ranked["lang"])
    assert vals[None] == 1 and vals.get("en") == 1 and vals.get("de") == 1
    assert not [r for r in s.search("spark AND lang:en", k=10).collect()
                if r["path"] == "a.py"]


def test_atomic_set_content_reindexes(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "ac")
    atomic_update(spark, cat,
                  [{"repo": "r0", "path": "a.py",
                    "content": {"set": "vector table sort"}}])
    s = Searcher(spark, cat)
    assert [r["path"] for r in s.search("vector", k=10).collect()] \
        == ["a.py"]
    assert not [r for r in s.search("join", k=10).collect()
                if r["path"] == "a.py"]


def test_atomic_set_ts(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "at")
    atomic_update(spark, cat,
                  [{"repo": "r1", "path": "d.rs",
                    "ts": {"set": "2030-06-01T00:00:00Z"}}],
                  corpus_df=small_corpus)
    s = Searcher(spark, cat)
    got = s.search("query AND ts:[2030-01-01T00:00:00Z TO *]",
                   k=10).collect()
    assert [r["path"] for r in got] == ["d.rs"]
    with pytest.raises(ValueError, match="ts"):
        atomic_update(spark, cat,
                      [{"repo": "r1", "path": "d.rs",
                        "ts": {"set": "not-a-date"}}],
                      corpus_df=small_corpus)


def test_atomic_guards(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "ag")
    with pytest.raises(ValueError, match="matched"):
        atomic_update(spark, cat,
                      [{"repo": "rX", "path": "zz.py",
                        "lang": {"set": "en"}}],
                      corpus_df=small_corpus)
    with pytest.raises(ValueError, match="unsupported atomic op"):
        atomic_update(spark, cat,
                      [{"repo": "r0", "path": "a.py",
                        "lang": {"inc": 1}}],
                      corpus_df=small_corpus)
    with pytest.raises(ValueError, match="not atomically updatable"):
        atomic_update(spark, cat,
                      [{"repo": "r0", "path": "a.py",
                        "doc_len": {"set": 3}}],
                      corpus_df=small_corpus)
    with pytest.raises(ValueError, match="duplicate"):
        atomic_update(spark, cat,
                      [{"repo": "r0", "path": "a.py",
                        "lang": {"set": "de"}},
                       {"repo": "r0", "path": "a.py",
                        "lang": {"set": "fr"}}],
                      corpus_df=small_corpus)
    with pytest.raises(ValueError, match="corpus_df"):
        atomic_update(spark, cat,
                      [{"repo": "r0", "path": "a.py",
                        "lang": {"set": "de"}}])
    assert atomic_update(spark, cat, [], corpus_df=small_corpus) \
        == {"updated": 0}


def test_facade_atomic_routing(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "af")
    conn = SolrConnection(spark, cat, corpus_df=small_corpus)
    res = conn.add([{"repo": "r0", "path": "b.py",
                     "lang": {"set": "fr"}}])
    assert res == {"updated": 1}
    hits = conn.search("hash AND lang:fr", rows=10)
    assert [d["path"] for d in hits.docs] == ["b.py"]
    with pytest.raises(ValueError, match="mixed"):
        conn.add([{"repo": "r0", "path": "b.py", "lang": {"set": "fr"}},
                  {"repo": "r0", "path": "e.py", "commit": "c",
                   "lang": "en", "content": "spark"}])


def test_dismax_delta_append_keeps_path_field(tmp_path, spark,
                                              small_corpus):
    """Round-7 regression: incremental_add on a scored_fields index must
    re-emit per-field terms + norms for the delta (the cfg reconstructed
    from index_stats previously lost scored_fields)."""
    cat = _fresh(tmp_path, spark, small_corpus, "dm",
                 scored_fields=("content", "path"))
    delta = spark.createDataFrame(
        [("r2", "newmod/handler.py", "c9", "en", "vector sort agg")],
        "repo string, path string, commit string, lang string,"
        " content string")
    incremental_add(spark, cat, delta)
    s = Searcher(spark, cat)
    assert "path" in s.field_avgdl
    got = s.search_dismax("newmod", qf={"path": 1.0}, k=5).collect()
    assert [r["path"] for r in got] == ["newmod/handler.py"]
    # both-field dismax over old + new docs still evaluates
    got = s.search_dismax("py OR vector", qf={"path": 2.0, "content": 1.0},
                          tie=0.5, k=10).collect()
    assert {r["path"] for r in got} >= {"newmod/handler.py", "a.py"}


def test_refresh_stats_preserves_field_avgdl(tmp_path, spark,
                                             small_corpus):
    """Deletes (and any _refresh_stats caller) must keep avgdl_path —
    losing it breaks dismax on every lifecycle-touched index."""
    cat = _fresh(tmp_path, spark, small_corpus, "dr",
                 scored_fields=("content", "path"))
    delete_by_ids(spark, cat, [0])
    s = Searcher(spark, cat)
    assert "path" in s.field_avgdl and s.field_avgdl["path"] > 0
    assert s.search_dismax("py", qf={"path": 1.0}, k=10).count() > 0


def test_atomic_on_dismax_index(tmp_path, spark, small_corpus):
    """Atomic updates re-index with the per-field schema intact."""
    cat = _fresh(tmp_path, spark, small_corpus, "da",
                 scored_fields=("content", "path"))
    atomic_update(spark, cat,
                  [{"repo": "r0", "path": "a.py", "lang": {"set": "de"}}],
                  corpus_df=small_corpus)
    s = Searcher(spark, cat)
    got = s.search_dismax("a AND lang:de", qf={"path": 1.0}, k=5).collect()
    assert [r["path"] for r in got] == ["a.py"]
