"""Typed date/timestamp field end-to-end (round-6 verdict #4).

zeit.solr converts CMS dates to Solr date fields (ISO-8601Z); here the
corpus carries a real TIMESTAMP ``ts`` column, the doc store indexes it,
and the Solr date-range syntax (``ts:[2020-02-01T00:00:00Z TO …]``)
parses to a pushed-down timestamp predicate.  The value derivation is
driver-oracle-checked (``filter_ts_range``); this ring covers the parser,
the filter semantics against an independent Catalyst filter, the
facade fq path, the range guard, and ISO-8601Z rendering."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from zsolr import parse as P
from zsolr import query as Q
from zsolr.search import Searcher, UnsupportedQuery

ISO_LO = "2020-02-01T00:00:00Z"
ISO_HI = "2020-06-01T00:00:00Z"


@pytest.fixture(scope="module")
def searcher(spark, built_index):
    cat, _ = built_index
    return Searcher(spark, cat)


def test_parse_iso_range_with_colons():
    # the lexer splits on ':'; range bounds re-join around the TO token
    ast = P.parse(f"ts:[{ISO_LO} TO {ISO_HI}]")
    assert ast == P.Range("ts", ISO_LO, ISO_HI)
    ast = P.parse(f"ts:[{ISO_LO} TO *]")
    assert ast == P.Range("ts", ISO_LO, None)
    # escaped colons (strict Lucene syntax) parse identically
    esc = ISO_LO.replace(":", "\\:")
    assert P.parse(f"ts:[{esc} TO *]") == P.Range("ts", ISO_LO, None)
    # whitespace inside a bound is still an error (two adjacent words)
    with pytest.raises(ValueError):
        P.parse("ts:[2020-01-01 junk TO *]")


def test_datetime_range_builder_parses_back():
    q = Q.datetime_range("ts", datetime(2020, 2, 1), datetime(2020, 6, 1))
    assert P.parse(q) == P.Range(
        "ts", "2020-02-01T00:00:00Z", "2020-06-01T00:00:00Z")


def _expected_ids(searcher, lo=None, hi=None):
    docs = searcher.docs.select("doc_id", "ts")
    if lo is not None:
        docs = docs.filter(F.col("ts") >= F.lit(
            datetime.fromisoformat(lo.replace("Z", "+00:00"))))
    if hi is not None:
        docs = docs.filter(F.col("ts") <= F.lit(
            datetime.fromisoformat(hi.replace("Z", "+00:00"))))
    return {r["doc_id"] for r in docs.collect()}


def test_ts_range_filter_only(searcher):
    got = {r["doc_id"] for r in
           searcher.search(f"ts:[{ISO_LO} TO {ISO_HI}]", k=None)
           .select("doc_id").collect()}
    exp = _expected_ids(searcher, ISO_LO, ISO_HI)
    assert got == exp and 0 < len(exp) < searcher.n_docs


def test_ts_range_open_bounds(searcher):
    lo_only = {r["doc_id"] for r in
               searcher.search(f"ts:[{ISO_LO} TO *]", k=None)
               .select("doc_id").collect()}
    assert lo_only == _expected_ids(searcher, ISO_LO, None)
    hi_only = {r["doc_id"] for r in
               searcher.search(f"ts:[* TO {ISO_HI}]", k=None)
               .select("doc_id").collect()}
    assert hi_only == _expected_ids(searcher, None, ISO_HI)
    assert lo_only | hi_only == set(range(searcher.n_docs))


def test_ts_range_with_scored_term(searcher):
    both = {r["doc_id"] for r in
            searcher.search(f"ts:[{ISO_LO} TO {ISO_HI}] AND spark",
                            k=None, wand=False).select("doc_id").collect()}
    term = {r["doc_id"] for r in
            searcher.search("spark", k=None, wand=False)
            .select("doc_id").collect()}
    assert both == term & _expected_ids(searcher, ISO_LO, ISO_HI)
    assert both  # non-degenerate


def test_ts_range_facade_fq(spark, built_index, searcher):
    from zsolr.connection import SolrConnection

    cat, _ = built_index
    conn = SolrConnection(spark, cat)
    res = conn.search("spark", rows=1000, fq=f"ts:[{ISO_LO} TO {ISO_HI}]")
    exp = {r["doc_id"] for r in
           searcher.search(f"ts:[{ISO_LO} TO {ISO_HI}] AND spark",
                           k=1000, wand=False).collect()}
    assert {d["doc_id"] for d in res.docs} == exp


def test_ts_bad_bound_raises_not_overmatches(searcher):
    # Q17 range-guard principle: a malformed date bound raises instead of
    # becoming a NULL cast that silently matches nothing (or everything)
    with pytest.raises(UnsupportedQuery):
        searcher.search("ts:[notadate TO *]", k=None).collect()
    with pytest.raises(UnsupportedQuery):
        searcher.search("ts:[2020-13-99T99:99:99Z TO *]", k=None).collect()


def test_ts_iso8601z_rendering(searcher):
    # I3 conversion semantics: dates render ISO-8601Z under the engine's
    # pinned-UTC sessions; epoch seconds are the tz-independent instant
    rows = (searcher.docs
            .select("doc_id", F.unix_timestamp("ts").alias("ts_s"),
                    F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
                    .alias("iso"))
            .limit(50).collect())
    for r in rows:
        exp = datetime.fromtimestamp(
            r["ts_s"], tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        assert r["iso"] == exp, r


def test_ts_pushdown_reaches_scan(searcher):
    plan = (searcher.search(f"ts:[{ISO_LO} TO {ISO_HI}]", k=None)
            ._jdf.queryExecution().executedPlan().toString())
    assert "ts" in plan and (
        "PushedFilters: [" in plan or "DataFilters: [" in plan)
    # the timestamp bounds must appear inside the parquet scan node
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any("ts#" in ln and "2020-02-01" in ln for ln in scan_lines), \
        scan_lines


def test_facet_range_date_brute_force(searcher):
    """+30DAYS buckets over [2020-01-01, 2021-01-01) vs a driver-side
    recount from the doc store."""
    rows = searcher.facet_range_date(
        "spark", "ts", "2020-01-01T00:00:00Z", "2021-01-01T00:00:00Z",
        "+7DAYS").collect()
    got = {r["bucket_start"]: r["hits"] for r in rows}

    matched = (searcher.search("spark", k=None, wand=False)
               .select("doc_id")
               .join(searcher.docs.select("doc_id", "ts"), "doc_id")
               .collect())
    s_ep = int(datetime(2020, 1, 1, tzinfo=timezone.utc).timestamp())
    e_ep = int(datetime(2021, 1, 1, tzinfo=timezone.utc).timestamp())
    gap = 7 * 86400
    exp: dict = {}
    for r in matched:
        ep = int(r["ts"].replace(tzinfo=timezone.utc).timestamp())
        if not (s_ep <= ep < e_ep):
            continue
        b = s_ep + ((ep - s_ep) // gap) * gap
        key = datetime.fromtimestamp(b, tz=timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ")
        exp[key] = exp.get(key, 0) + 1
    assert got == exp and len(got) > 3   # ts strides 8761s/doc -> ~8 weekly buckets


def test_facet_range_date_guards(searcher):
    with pytest.raises(UnsupportedQuery):   # malformed bound
        searcher.facet_range_date("spark", "ts", "2020-1-1", ISO_HI, "+1DAY")
    with pytest.raises(UnsupportedQuery):   # bogus unit
        searcher.facet_range_date("spark", "ts", ISO_LO, ISO_HI, "+1WEEK")
    with pytest.raises(UnsupportedQuery):   # calendar bucket-count bound
        searcher.facet_range_date("spark", "ts", "1000-01-01T00:00:00Z",
                                  "3000-01-01T00:00:00Z", "+1MONTH")
    with pytest.raises(UnsupportedQuery):   # start must precede end
        searcher.facet_range_date("spark", "ts", ISO_HI, ISO_LO, "+1MONTH")


def _addm(dt, n):
    """Independent clamped month add (the test's own oracle arithmetic)."""
    import calendar

    y = dt.year + (dt.month - 1 + n) // 12
    m = (dt.month - 1 + n) % 12 + 1
    return dt.replace(year=y, month=m,
                      day=min(dt.day, calendar.monthrange(y, m)[1]))


def test_facet_range_date_calendar_months(searcher):
    """+1MONTH buckets (round-6 verdict next #6): exact Solr
    DateMathParser semantics — the gap applies to each bucket's low
    bound in turn, month add clamps day-of-month (Jan 31 06:00 →
    Feb 29 06:00 → Mar 29 06:00 in 2020) — vs a driver-side recount."""
    start, end = "2020-01-31T06:00:00Z", "2020-07-01T00:00:00Z"
    rows = searcher.facet_range_date("spark", "ts", start, end,
                                     "+1MONTH").collect()
    got = {r["bucket_start"]: r["hits"] for r in rows}

    sdt = datetime(2020, 1, 31, 6, tzinfo=timezone.utc)
    edt = datetime(2020, 7, 1, tzinfo=timezone.utc)
    bounds = []
    cur = sdt
    while cur < edt:
        bounds.append(cur)
        cur = _addm(cur, 1)
    # leap-year clamp sticks (Solr's iterative add): 31 → 29 → 29 …
    assert [b.day for b in bounds[:3]] == [31, 29, 29]
    matched = (searcher.search("spark", k=None, wand=False)
               .select("doc_id")
               .join(searcher.docs.select("doc_id", "ts"), "doc_id")
               .collect())
    exp: dict = {}
    for r in matched:
        ts = r["ts"].replace(tzinfo=timezone.utc)
        if not (sdt <= ts < edt):
            continue
        b = max(b for b in bounds if b <= ts)
        key = b.strftime("%Y-%m-%dT%H:%M:%SZ")
        exp[key] = exp.get(key, 0) + 1
    assert exp, "fixture ts range must overlap the facet window"
    assert got == exp


def test_facet_range_date_calendar_years(searcher):
    """+1YEAR gap over [2020, 2021): one calendar bucket, hits = the
    exact in-window recount."""
    rows = searcher.facet_range_date(
        "spark", "ts", "2020-01-01T00:00:00Z", "2021-01-01T00:00:00Z",
        "+1YEAR").collect()
    matched = (searcher.search("spark", k=None, wand=False)
               .select("doc_id")
               .join(searcher.docs.select("doc_id", "ts"), "doc_id")
               .collect())
    lo = datetime(2020, 1, 1, tzinfo=timezone.utc)
    hi = datetime(2021, 1, 1, tzinfo=timezone.utc)
    n = sum(1 for r in matched
            if lo <= r["ts"].replace(tzinfo=timezone.utc) < hi)
    assert {r["bucket_start"]: r["hits"] for r in rows} == \
        ({"2020-01-01T00:00:00Z": n} if n else {})


def test_facet_range_date_window_filters(searcher):
    """Buckets outside [start, end) never appear, and hour gaps render
    with the time component."""
    rows = searcher.facet_range_date(
        "[* TO *]", "ts", "2020-01-01T00:00:00Z", "2020-01-02T00:00:00Z",
        "+6HOURS").collect()
    starts = sorted(r["bucket_start"] for r in rows)
    assert all(s.startswith("2020-01-01T") for s in starts)
    assert set(starts) <= {"2020-01-01T00:00:00Z", "2020-01-01T06:00:00Z",
                           "2020-01-01T12:00:00Z", "2020-01-01T18:00:00Z"}


def test_cli_jdump_renders_ts_iso():
    """CLI row output must survive the typed ts column (datetime is not
    JSON-serializable; Solr renders dates ISO-8601Z) — round-6 review."""
    import json

    from zsolr.cli import _jdump

    out = json.loads(_jdump({
        "group_val": datetime(2020, 7, 1, 12, 30, tzinfo=timezone.utc),
        "hits": 3}))
    assert out == {"group_val": "2020-07-01T12:30:00Z", "hits": 3}
