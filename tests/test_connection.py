"""SolrConnection facade: pysolr call shape (search/fq/fl/facet/hl,
add/delete lifecycle) over the engine — Solr semantics verified against
the Searcher directly."""

import pytest

from zsolr.connection import Results, SolrConnection
from zsolr.search import Searcher, UnsupportedQuery


@pytest.fixture(scope="module")
def conn(spark, built_index, corpus_df):
    cat, _res = built_index
    return SolrConnection(spark, cat, corpus_df=corpus_df)


@pytest.fixture(scope="module")
def searcher(spark, built_index):
    cat, _res = built_index
    return Searcher(spark, cat)


def test_search_results_shape(conn, searcher):
    res = conn.search("spark", rows=5)
    assert isinstance(res, Results)
    exp_df, exp_n = searcher.search("spark", k=5, with_count=True)
    exp = [r.asDict() for r in exp_df.collect()]
    assert res.docs == exp
    assert res.hits == exp_n
    assert len(res) == 5 and list(res) == res.docs


def test_search_rows0_count_only(conn, searcher):
    res = conn.search("spark", rows=0)
    assert res.docs == []
    _df, n = searcher.search("spark", k=1, with_count=True)
    assert res.hits == n > 0


def test_fl_field_list(conn):
    res = conn.search("spark", rows=3, fl="repo, path")
    assert all(set(d) == {"repo", "path"} for d in res.docs)
    with pytest.raises(UnsupportedQuery):
        conn.search("spark", rows=3, fl="nope")


def test_fq_meta_equals_meta_conjunct(conn):
    """A meta fq is exactly the zero-scored meta conjunct the engine
    already supports — same docs, same scores, same numFound."""
    a = conn.search("spark", rows=10, fq="lang:en")
    b = conn.search("lang:en AND spark", rows=10)
    assert a.docs == b.docs and a.hits == b.hits
    assert a.hits < conn.search("spark", rows=0).hits  # fq restricts


def test_fq_scored_clause_restricts_without_scoring(conn, searcher):
    """Solr fq semantics on a CONTENT clause: matches are required but the
    score stays the main query's.  Every returned doc scores exactly its
    'spark'-only score (not spark+join), and the doc set is the top-k of
    the intersection ranked by that score."""
    res = conn.search("spark", rows=10, fq="join")
    spark_scores = {r["doc_id"]: r["score"] for r in
                    searcher.match_scores("spark").collect()}
    inter = {r["doc_id"] for r in
             searcher.search("spark AND join", k=None, wand=False).collect()}
    assert res.hits == len(inter)
    exp_ids = sorted(inter, key=lambda d: (-spark_scores[d], d))[:10]
    assert [d["doc_id"] for d in res.docs] == exp_ids
    for d in res.docs:
        assert abs(d["score"] - spark_scores[d["doc_id"]]) < 1e-12


def test_facet_field_section(conn, searcher):
    res = conn.search("spark", rows=0, facet_field="lang")
    exp = {r[0]: r["hits"] for r in searcher.facet("spark", "lang").collect()}
    assert res.facets == {"facet_fields": {"lang": exp}}
    # Solr facet.sort=count ordering + facet.limit truncation
    got = res.facets["facet_fields"]["lang"]
    counts = list(got.values())
    assert counts == sorted(counts, reverse=True)
    lim = conn.search("spark", rows=0, facet_field="lang", facet_limit=2)
    top2 = lim.facets["facet_fields"]["lang"]
    assert len(top2) == 2
    assert list(top2.items()) == list(got.items())[:2]


def test_facet_limit_runs_in_engine(conn, searcher):
    """facet.sort=count + facet.limit execute INSIDE the engine as a
    TakeOrdered (round-4 verdict #1): faceting on a corpus-cardinality
    field (path — one distinct value per doc) collects exactly
    facet_limit rows ranked (hits desc, value asc), never the full value
    histogram; the facade consumes that ordering without re-sorting."""
    lim = searcher.facet("spark", "path", limit=7).collect()
    assert len(lim) == 7
    full = searcher.facet("spark", "path").collect()
    assert len(full) > 7          # the field really is high-cardinality
    exp = [(r[0], r["hits"])
           for r in sorted(full, key=lambda r: (-r["hits"], r[0]))[:7]]
    assert [(r[0], r["hits"]) for r in lim] == exp
    res = conn.search("spark", rows=0, facet_field="path", facet_limit=7)
    assert list(res.facets["facet_fields"]["path"].items()) == exp
    # facet.sort=index variant orders by value
    idx = searcher.facet("spark", "path", limit=5, sort="index").collect()
    assert [r[0] for r in idx] == sorted(r[0] for r in full)[:5]


def test_facet_only_request_single_pass(conn, searcher):
    """rows=0 + facet.field (the classic UI request): numFound rides the
    same persisted match set the facets aggregate (one kernel
    evaluation) and must equal the regular path's numFound exactly."""
    a = conn.search("spark", rows=0, facet_field="lang")
    b = conn.search("spark", rows=1, facet_field="lang")
    assert a.hits == b.hits and a.docs == []
    assert a.facets == b.facets
    # composes with facet.query and filters
    c = conn.search("lang:en AND spark", rows=0, facet_field="repo",
                    facet_query=["join"])
    d = conn.search("lang:en AND spark", rows=1, facet_field="repo",
                    facet_query=["join"])
    assert c.hits == d.hits and c.facets == d.facets


def test_facet_multi_field_shares_match_set(conn, searcher):
    """Round-5: N facet fields cost ONE kernel evaluation (facet_fields
    persists the match set); rankings equal the per-field facet() path
    exactly, through both the engine and the facade."""
    got = searcher.facet_fields("spark", ["lang", "repo", "path"], limit=4)
    for f in ("lang", "repo", "path"):
        exp = [(r[0], r["hits"]) for r in
               searcher.facet("spark", f, limit=4).collect()]
        assert got[f] == exp, f
    res = conn.search("spark", rows=0, facet_field=["lang", "repo"],
                      facet_limit=4)
    ff = res.facets["facet_fields"]
    for f in ("lang", "repo"):
        exp = [(r[0], r["hits"]) for r in
               searcher.facet("spark", f, limit=4).collect()]
        assert list(ff[f].items()) == exp, f


def test_highlighting_section(conn):
    res = conn.search("spark", rows=3, hl=True)
    assert res.highlighting, "top docs for 'spark' must produce snippets"
    frags = [s for d in res.highlighting.values() for s in d["content"]]
    assert any("<em>spark</em>" in s for s in frags)
    # multi-term rewrite rides through the facade too
    res2 = conn.search("spar*", rows=3, hl=True)
    frags2 = [s for d in res2.highlighting.values() for s in d["content"]]
    assert any("<em>spark</em>" in s for s in frags2)


def test_cursor_with_fq_composes(conn):
    """cursorMark + fq in one request: cursor pages walk the fq-filtered
    ranking exactly."""
    full = []
    mark = "*"
    for _ in range(100):
        res = conn.search("spark", rows=4, fq="lang:en", cursor_mark=mark)
        full += [d["doc_id"] for d in res.docs]
        if res.nextCursorMark == mark:
            break
        mark = res.nextCursorMark
    exp = conn.search("lang:en AND spark", rows=10**6)
    assert full == [d["doc_id"] for d in exp.docs]


def test_spellcheck_section(conn):
    """SpellCheckComponent through the facade: suggestions only for
    query terms absent from the index, ranked candidates include the
    intended word."""
    res = conn.search("spark OR sprak", rows=2, spellcheck=True)
    sugg = res.spellcheck["suggestions"]
    assert "sprak" in sugg and "spark" in sugg["sprak"]
    assert "spark" not in sugg          # in-index word: no suggestion
    assert conn.search("spark", rows=1).spellcheck == {}


def test_facet_query_section(conn, searcher):
    """facet.query through the facade: exact intersected counts for each
    subquery, alongside facet_fields in one response."""
    res = conn.search("spark", rows=0, facet_query=["join", "lang:en"],
                      facet_field="lang")
    for fq in ("join", "lang:en"):
        _df, n = searcher.search(f"spark AND ({fq})", k=1, with_count=True)
        assert res.facets["facet_queries"][fq] == n
    assert "facet_fields" in res.facets


def test_cursor_mark_pages_to_exhaustion(conn, searcher):
    """Solr cursorMark protocol through the facade: iterate until the
    mark stops changing; concatenated pages equal the full ranking."""
    rows = searcher.search("spark", k=None, wand=False).collect()
    full = [r["doc_id"] for r in
            sorted(rows, key=lambda r: (-r["score"], r["doc_id"]))]
    mark, seen = "*", []
    for _ in range(200):
        res = conn.search("spark", rows=5, cursor_mark=mark)
        seen += [d["doc_id"] for d in res.docs]
        assert res.hits == len(full)       # numFound on every page
        if res.nextCursorMark == mark:
            break
        mark = res.nextCursorMark
    assert seen == full
    with pytest.raises(UnsupportedQuery):
        conn.search("spark", rows=5, cursor_mark="*", start=2)


def test_cursor_mark_with_field_sort(conn, searcher):
    """Round-4 verdict #5 through the facade: cursorMark composes with a
    sort override — the mark round-trips (sort values…, doc_id) and the
    walk equals the offset path's full field-sorted ranking."""
    exp = [r["doc_id"] for r in
           searcher.search("hash AND join", k=10**6,
                           sort="doc_len desc").collect()]
    mark, seen = "*", []
    for _ in range(50):
        res = conn.search("hash AND join", rows=50, sort="doc_len desc",
                          cursor_mark=mark)
        seen += [d["doc_id"] for d in res.docs]
        assert res.hits == len(exp)
        if res.nextCursorMark == mark:
            break
        mark = res.nextCursorMark
    assert seen == exp


def test_mlt_and_suggest_facade(conn, searcher):
    """pysolr parity methods (round-5): more_like_this / suggest_terms
    delegate to the engine's MLT and suggester components with pysolr's
    call and return shapes."""
    src = int(conn.search("spark", rows=1).docs[0]["doc_id"])
    res = conn.more_like_this(src, rows=5)
    exp = [r.asDict() for r in
           searcher.more_like_this(src, k=5).collect()]
    assert res.docs == exp
    # hits = TOTAL similar-doc count (Solr MLT numFound), NOT the page
    # size (round-6 advice) — equals the interesting-term OR's match
    # count minus the source doc
    _df, total = searcher.more_like_this(src, k=5, with_count=True)
    assert res.hits == total and total >= len(exp)
    assert all(d["doc_id"] != src for d in res.docs)
    sg = conn.suggest_terms("sp", rows=5)
    exp_sg = [(r["term"], r["df"])
              for r in searcher.suggest("sp", 5).collect()]
    assert sg == {"sp": exp_sg}


def test_hl_without_corpus_raises(spark, built_index):
    cat, _res = built_index
    bare = SolrConnection(spark, cat)
    with pytest.raises(UnsupportedQuery):
        bare.search("spark", rows=2, hl=True)


def test_add_delete_lifecycle(spark, tmp_path, corpus_df):
    """E1'/E3 through the facade: delete-by-query tombstones and
    re-pins the searcher; add() incrementally indexes new docs."""
    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog
    from pyspark.sql import functions as F

    cat = ManifestParquetCatalog(str(tmp_path / "conn-idx"))
    IndexBuilder(cat, BuildConfig(n_buckets=4)).build(
        spark, "cx", corpus_df=corpus_df)
    conn = SolrConnection(spark, cat)
    before = conn.search("spark", rows=0).hits
    assert before > 0
    conn.delete(q="lang:en AND spark")
    conn.commit()   # parity no-op
    after = conn.search("spark", rows=0).hits
    assert after == conn.search("spark AND NOT lang:en", rows=0).hits
    assert after < before
    # delete exactly one id
    one = conn.search("join", rows=1).docs[0]["doc_id"]
    n0 = conn.search("join", rows=0).hits
    conn.delete(id=int(one))
    assert conn.search("join", rows=0).hits == n0 - 1
    with pytest.raises(ValueError):
        conn.delete()
    # add new docs (fresh repo name → pure inserts)
    new = corpus_df.limit(3).select(
        F.lit("newrepo").alias("repo"), "path", "commit", "lang",
        F.concat(F.col("content"), F.lit(" zzzuniq")).alias("content"))
    res = conn.add(new)
    assert res == {"added": 3, "changed": 0, "skipped": 0}
    hits = conn.search("zzzuniq", rows=5)
    assert hits.hits == 3
    assert all(d["repo"] == "newrepo" for d in hits.docs)
    # upsert semantics: re-adding identical docs is a no-op, absent docs
    # untouched; changing one doc re-indexes exactly that one
    n_all = conn.search("[* TO *]", rows=0).hits
    assert conn.add(new) == {"added": 0, "changed": 0, "skipped": 3}
    assert conn.search("[* TO *]", rows=0).hits == n_all
    changed = new.limit(1).select(
        "repo", "path", "commit", "lang",
        F.concat(F.col("content"), F.lit(" yyyuniq")).alias("content"))
    assert conn.add(changed) == {"added": 0, "changed": 1, "skipped": 0}
    assert conn.search("yyyuniq", rows=0).hits == 1
    assert conn.search("zzzuniq", rows=0).hits == 3  # changed doc kept it
    assert conn.search("[* TO *]", rows=0).hits == n_all


def test_add_to_empty_index(spark, tmp_path):
    """Round-4 advice: the FIRST add() to an index built over an empty
    corpus must start doc ids at 0 (max(doc_id) is NULL → coalesced to
    -1), not crash with NoneType + 1."""
    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog

    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string,"
            " content string")
    cat = ManifestParquetCatalog(str(tmp_path / "empty-idx"))
    IndexBuilder(cat, BuildConfig(n_buckets=4)).build(
        spark, "empty", corpus_df=empty)
    conn = SolrConnection(spark, cat)
    assert conn.search("spark", rows=0).hits == 0
    delta = spark.createDataFrame(
        [("r0", "a.txt", "c" * 40, "en", "spark join hash")],
        "repo string, path string, commit string, lang string,"
        " content string")
    assert conn.add(delta) == {"added": 1, "changed": 0, "skipped": 0}
    hit = conn.search("spark", rows=5)
    assert hit.hits == 1 and hit.docs[0]["doc_id"] == 0


def test_add_list_of_dicts_pysolr_shape(spark, tmp_path, corpus_df):
    """pysolr parity (round-6 verdict #3): ``add()`` accepts pysolr's
    list-of-dicts call shape — same ``incremental_add`` underneath,
    counts identical to the DataFrame path, commit/lang defaulted."""
    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog

    cat = ManifestParquetCatalog(str(tmp_path / "dict-add-idx"))
    IndexBuilder(cat, BuildConfig(n_buckets=4)).build(
        spark, "cx", corpus_df=corpus_df)
    conn = SolrConnection(spark, cat)
    docs = [
        {"repo": "dictrepo", "path": "a.py", "commit": "f" * 40,
         "lang": "en", "content": "spark dict upsert qqquniq"},
        {"repo": "dictrepo", "path": "b.py",
         "content": "another dict doc qqquniq"},     # commit/lang default
    ]
    assert conn.add(docs) == {"added": 2, "changed": 0, "skipped": 0}
    hits = conn.search("qqquniq", rows=5)
    assert hits.hits == 2
    assert all(d["repo"] == "dictrepo" for d in hits.docs)
    defaulted = [d for d in hits.docs if d["path"] == "b.py"]
    assert defaulted and defaulted[0]["commit"] == ""
    # re-add identical dicts: skipped (sha equality), nothing re-indexed
    assert conn.add(docs) == {"added": 0, "changed": 0, "skipped": 2}
    # change one: exactly that one re-indexes
    docs[1]["content"] += " rrruniq"
    assert conn.add(docs) == {"added": 0, "changed": 1, "skipped": 1}
    assert conn.search("rrruniq", rows=0).hits == 1
    # malformed dict raises before touching the index
    with pytest.raises(ValueError):
        conn.add([{"repo": "x", "content": "missing path"}])


def test_search_with_facets_single_wave(conn, searcher, monkeypatch):
    """Round-6 verdict #2: q + facet.field + rows>0 (the commonest Solr
    request shape) runs ONE kernel evaluation — the ranked page,
    numFound, and every facet field share the persisted match set.
    Job shape: exactly one postings scan is planned; results are
    bit-identical to the old two-wave path."""
    calls = []
    orig = Searcher._postings_scan

    def counting(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(Searcher, "_postings_scan", counting)
    res = conn.search("spark", rows=5, facet_field=["lang", "repo"],
                      facet_limit=4)
    assert len(calls) == 1, f"{len(calls)} kernel waves for q+facets"
    # page identical to the plain ranked path
    exp_df, exp_n = searcher.search("spark", k=5, with_count=True)
    assert res.docs == [r.asDict() for r in exp_df.collect()]
    assert res.hits == exp_n
    # facets identical to the facet_fields path
    exp_ff = searcher.facet_fields("spark", ["lang", "repo"], limit=4)
    for f in ("lang", "repo"):
        assert list(res.facets["facet_fields"][f].items()) == exp_ff[f], f


def test_search_with_facets_variants(conn, searcher):
    """The shared search+facets wave composes with fq, start offsets,
    field sorts, mincount/prefix, and match-all queries — identical to
    the separate paths in every case."""
    # fq + offset
    a = conn.search("spark", rows=3, start=2, fq="lang:en",
                    facet_field="repo", facet_limit=3)
    b = conn.search("lang:en AND spark", rows=3, start=2)
    assert a.docs == b.docs and a.hits == b.hits
    exp = searcher.facet_fields("lang:en AND spark", ["repo"], limit=3)
    assert list(a.facets["facet_fields"]["repo"].items()) == exp["repo"]
    # field sort override
    c = conn.search("spark", rows=4, sort="doc_len desc",
                    facet_field="lang")
    d = conn.search("spark", rows=4, sort="doc_len desc")
    assert c.docs == d.docs and c.hits == d.hits
    # mincount + prefix ride through
    e = conn.search("spark", rows=2, facet_field="path",
                    facet_limit=5, facet_mincount=1, facet_prefix="src")
    exp_p = searcher.facet("spark", "path", limit=5, prefix="src")
    assert list(e.facets["facet_fields"]["path"].items()) == \
        [(r[0], r["hits"]) for r in exp_p.collect()]
    # match-all + facets
    f_ = conn.search("[* TO *]", rows=3, facet_field="lang")
    g = conn.search("[* TO *]", rows=3)
    assert f_.docs == g.docs and f_.hits == g.hits
    exp_ma = searcher.facet_fields("[* TO *]", ["lang"], limit=100)
    assert list(f_.facets["facet_fields"]["lang"].items()) == exp_ma["lang"]
