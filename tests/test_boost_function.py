"""Function-query boosted ranking (round-6): Solr ``{!boost
b=recip(ms(NOW,ts),m,a,b)}`` — BM25 × recency multiplier over the typed
``ts`` date field, the canonical zeit.solr news-ranking shape."""

from datetime import datetime, timezone

import pytest

from zsolr.search import Searcher, UnsupportedQuery, parse_boost_function

NOW = "2021-06-01T00:00:00Z"
NOW_MS = int(datetime(2021, 6, 1, tzinfo=timezone.utc).timestamp() * 1000)


@pytest.fixture(scope="module")
def searcher(spark, built_index):
    cat, _ = built_index
    return Searcher(spark, cat)


def _brute_topk(searcher, q, m, a, b, k=10):
    """Driver-side oracle: full match set × python-computed multiplier."""
    scored = {r["doc_id"]: r["score"]
              for r in searcher.match_scores(q).collect()}
    ts = {r["doc_id"]: r["ts"] for r in
          searcher.docs.select("doc_id", "ts").collect()}
    out = []
    for d, s in scored.items():
        x_ms = NOW_MS - ts[d].replace(tzinfo=timezone.utc).timestamp() * 1000
        out.append((d, s * (a / (m * x_ms + b))))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_parse_boost_function():
    assert parse_boost_function("recip(ms(NOW,ts),3.16e-11,1,1)") == \
        ("ts", 3.16e-11, 1.0, 1.0)
    assert parse_boost_function("recip(ms(NOW, ts), 1e-9, 2, 0.5)") == \
        ("ts", 1e-9, 2.0, 0.5)
    for bad in ("linear(ts,1,2)", "recip(ms(NOW,ts),1,1)",
                "recip(ms(ts,NOW),1,1,1)", "recip(ms(NOW,ts),x,1,1)"):
        with pytest.raises(UnsupportedQuery):
            parse_boost_function(bad)


def test_constant_multiplier_preserves_bm25_order(searcher):
    """m=0 → multiplier a/b is constant: ranking identical to plain
    search, scores scaled by exactly a/b."""
    plain = searcher.search("spark", k=10, wand=False).collect()
    boosted = searcher.search_boosted(
        "spark", k=10, boost="recip(ms(NOW,ts),0,3,2)", now=NOW).collect()
    assert [r["doc_id"] for r in boosted] == [r["doc_id"] for r in plain]
    for p, b in zip(plain, boosted):
        assert b["score"] == pytest.approx(p["score"] * 1.5, abs=1e-12)


@pytest.mark.parametrize("q,m,a,b", [
    ("spark", 1e-9, 1.0, 1.0),          # strong recency pull
    ("hash AND join", 3.16e-11, 1.0, 1.0),   # Solr's documented constants
    ("stream OR batch", 1e-10, 2.0, 0.5),
])
def test_boosted_topk_matches_brute_force(searcher, q, m, a, b):
    exp = _brute_topk(searcher, q, m, a, b, k=10)
    got = searcher.search_boosted(
        q, k=10, boost=f"recip(ms(NOW,ts),{m},{a},{b})", now=NOW).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-12)


def test_recency_boost_actually_reranks(searcher):
    """The strong-m boost must produce a different order than raw BM25 —
    otherwise the fixture proves nothing."""
    plain = [r["doc_id"] for r in searcher.search("spark", k=10).collect()]
    boosted = [r["doc_id"] for r in searcher.search_boosted(
        "spark", k=10, boost="recip(ms(NOW,ts),1e-9,1,1)", now=NOW)
        .collect()]
    assert plain != boosted


def test_start_offset_and_count(searcher):
    full, hits = searcher.search_boosted(
        "spark", k=8, boost="recip(ms(NOW,ts),1e-9,1,1)", now=NOW,
        with_count=True)
    page2 = searcher.search_boosted(
        "spark", k=4, start=4, boost="recip(ms(NOW,ts),1e-9,1,1)", now=NOW)
    assert [tuple(r) for r in page2.collect()] == \
        [tuple(r) for r in full.collect()[4:8]]
    assert hits == searcher.match_scores("spark").count()


def test_now_formats_agree(searcher):
    b = "recip(ms(NOW,ts),1e-9,1,1)"
    iso = searcher.search_boosted("spark", k=5, boost=b, now=NOW).collect()
    dt = searcher.search_boosted(
        "spark", k=5, boost=b,
        now=datetime(2021, 6, 1, tzinfo=timezone.utc)).collect()
    epoch = searcher.search_boosted(
        "spark", k=5, boost=b, now=NOW_MS // 1000).collect()
    assert [tuple(r) for r in iso] == [tuple(r) for r in dt] \
        == [tuple(r) for r in epoch]


def test_non_timestamp_field_raises(searcher):
    with pytest.raises(UnsupportedQuery):
        searcher.search_boosted(
            "spark", boost="recip(ms(NOW,lang),1,1,1)", now=NOW)


def test_facade_boost(spark, built_index, searcher):
    from zsolr.connection import SolrConnection

    cat, _ = built_index
    conn = SolrConnection(spark, cat)
    res = conn.search("spark", rows=5, boost="recip(ms(NOW,ts),1e-9,1,1)",
                      now=NOW, fl="doc_id,score",
                      facet_field="lang")
    exp = _brute_topk(searcher, "spark", 1e-9, 1.0, 1.0, k=5)
    assert [d["doc_id"] for d in res.docs] == [d for d, _ in exp]
    assert all(set(d) == {"doc_id", "score"} for d in res.docs)
    assert res.hits == searcher.match_scores("spark").count()
    assert "lang" in res.facets["facet_fields"]
    with pytest.raises(UnsupportedQuery):
        conn.search("spark", boost="recip(ms(NOW,ts),1e-9,1,1)",
                    now=NOW, sort="path asc")


def test_boosted_grouping_matches_brute_force(spark, built_index, searcher):
    """group= + {!boost}= in one request (round-7): group heads and
    member ranks follow the BOOSTED score; matches/ngroups unchanged;
    equal to a driver-side regroup of the brute-force boosted scores."""
    from zsolr.connection import SolrConnection

    m, a, b = 1e-9, 1.0, 1.0
    boosted = dict(_brute_topk(searcher, "spark", m, a, b, k=10**9))
    lang = {r["doc_id"]: r["lang"] for r in
            searcher.docs.select("doc_id", "lang").collect()}
    by_g: dict = {}
    for d, s in boosted.items():
        by_g.setdefault(lang[d], []).append((d, s))
    exp_groups = {}
    for g, ds in by_g.items():
        ds.sort(key=lambda t: (-t[1], t[0]))
        exp_groups[g] = [d for d, _ in ds[:2]]
    heads = sorted(by_g, key=lambda g: (-by_g[g][0][1], by_g[g][0][0]))

    conn = SolrConnection(spark, built_index[0])
    res = conn.search("spark", group_field="lang", group_limit=2,
                      rows=3, group_ngroups=True,
                      boost=f"recip(ms(NOW,ts),{m},{a},{b})", now=NOW)
    sec = res.grouped["lang"]
    assert [g["groupValue"] for g in sec["groups"]] == heads[:3]
    for g in sec["groups"]:
        assert [d["doc_id"] for d in g["doclist"]["docs"]] == \
            exp_groups[g["groupValue"]]
        assert g["doclist"]["numFound"] == len(by_g[g["groupValue"]])
    assert sec["matches"] == len(boosted)
    assert sec["ngroups"] == len(by_g)
    # scores in the doclist are the boosted scores
    for g in sec["groups"]:
        for d in g["doclist"]["docs"]:
            assert abs(d["score"] - boosted[d["doc_id"]]) < 1e-9
