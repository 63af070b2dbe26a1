"""zsolr command-line interface — the spark-submit entry point
(north_rule: "run via spark-submit --py-files on a multi-executor cluster").

Usage (local dev):
    python -m zsolr build  --corpus-sf /root/testdata/sf0.001 --index /tmp/idx
    python -m zsolr search --index /tmp/idx 'hash AND join' -k 10
    python -m zsolr delete --index /tmp/idx --query dup
    python -m zsolr compact --index /tmp/idx

Cluster:
    zip -r zsolr.zip zsolr
    spark-submit --py-files zsolr.zip zsolr/cli.py build \\
        --corpus iceberg:catalog.db.corpus --index /warehouse/idx
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _jdump(obj) -> str:
    """json.dumps with ISO rendering for the typed ts date values that
    facet/group/select rows can carry (datetime is not JSON-serializable;
    Solr renders dates ISO-8601Z)."""
    def _default(v):
        iso = getattr(v, "isoformat", None)
        return (iso().replace("+00:00", "") + "Z") if iso else str(v)
    return json.dumps(obj, default=_default)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="zsolr")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--corpus", help="parquet dir or iceberg:<table> with "
                                    "(repo,path,commit,lang,content)")
    b.add_argument("--corpus-sf", help="synthesize corpus from this "
                                       "testdata sf dir (sandbox)")
    b.add_argument("--replicate", type=int, default=1)
    b.add_argument("--index", required=True, help="index catalog root")
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--resume-groups", type=int, default=1)
    b.add_argument("--scored-fields", default="content",
                   help="comma-separated analyzed+BM25-scored fields"
                        " (Solr schema indexed-text fields), e.g."
                        " content,path for edismax qf support")

    s = sub.add_parser("search", help="BM25 top-k search")
    s.add_argument("query")
    s.add_argument("--index", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--start", type=int, default=0)
    s.add_argument("--sort", default=None)
    s.add_argument("--no-wand", action="store_true")
    s.add_argument("--count", action="store_true")

    se = sub.add_parser("select", help="Solr /select via the pysolr-style"
                                       " facade (fq/fl/facet/rows)")
    se.add_argument("query")
    se.add_argument("--index", required=True)
    se.add_argument("--rows", type=int, default=10)
    se.add_argument("--start", type=int, default=0)
    se.add_argument("--sort", default=None)
    se.add_argument("--fl", default=None)
    se.add_argument("--fq", action="append", default=None)
    se.add_argument("--facet-field", action="append", default=None)
    se.add_argument("--facet-limit", type=int, default=100)
    se.add_argument("--facet-mincount", type=int, default=0)
    se.add_argument("--facet-prefix", default=None)
    se.add_argument("--facet-missing", action="store_true",
                    help="Solr facet.missing: NULL-field bucket per facet")
    se.add_argument("--cursor-mark", default=None,
                    help="'*' to start; pass nextCursorMark to continue")
    se.add_argument("--def-type", default=None, dest="def_type",
                    help="query parser: lucene (default) or edismax")
    se.add_argument("--qf", default=None,
                    help="edismax query fields, e.g. 'path^2 content'")
    se.add_argument("--pf", default=None,
                    help="edismax phrase fields, e.g. 'content^2'")
    se.add_argument("--tie", type=float, default=0.0,
                    help="edismax tiebreaker in [0,1]")
    se.add_argument("--mm", default=None,
                    help="edismax minimum-should-match: int or 'N%%'")
    se.add_argument("--boost", default=None,
                    help="Solr boost function, e.g."
                         " 'recip(ms(NOW,ts),3.16e-11,1,1)'")
    se.add_argument("--now", default=None,
                    help="pin Solr NOW (ISO-8601) for --boost")

    fc = sub.add_parser("facet", help="field / range facets over a query")
    fc.add_argument("query")
    fc.add_argument("--index", required=True)
    fc.add_argument("--field", required=True)
    fc.add_argument("--range", dest="frange", default=None,
                    help="start:end:gap for a range facet")
    fc.add_argument("--limit", type=int, default=None,
                    help="facet.limit: engine-side TakeOrdered in Solr's"
                         " facet.sort=count order (hits desc, value asc)")

    sg = sub.add_parser("suggest", help="term suggestions by prefix")
    sg.add_argument("prefix")
    sg.add_argument("--index", required=True)
    sg.add_argument("-n", type=int, default=10)

    st = sub.add_parser("stats", help="stats.field over a query match set")
    st.add_argument("query")
    st.add_argument("--index", required=True)
    st.add_argument("--field", default="doc_len")

    gp = sub.add_parser("group", help="result grouping (top-n per value)")
    gp.add_argument("query")
    gp.add_argument("--index", required=True)
    gp.add_argument("--field", required=True, action="append",
                    dest="fields", help="repeatable (Solr group.field)")
    gp.add_argument("--limit", type=int, default=1,
                    help="docs per group (Solr group.limit)")

    ml = sub.add_parser("mlt", help="MoreLikeThis: docs similar to one doc")
    ml.add_argument("doc_id", type=int)
    ml.add_argument("--index", required=True)
    ml.add_argument("-k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=8)

    sp = sub.add_parser("spellcheck", help="correction candidates for a word")
    sp.add_argument("word")
    sp.add_argument("--index", required=True)
    sp.add_argument("-n", type=int, default=5)
    sp.add_argument("--max-edits", type=int, default=2)

    ex = sub.add_parser("explain", help="per-term score breakdown for a doc")
    ex.add_argument("query")
    ex.add_argument("doc_id", type=int)
    ex.add_argument("--index", required=True)

    bq = sub.add_parser("batch", help="many queries in one kernel wave")
    bq.add_argument("queries", nargs="+")
    bq.add_argument("--index", required=True)
    bq.add_argument("-k", type=int, default=10)

    d = sub.add_parser("delete", help="delete by query or ids")
    d.add_argument("--index", required=True)
    d.add_argument("--query")
    d.add_argument("--ids", help="comma-separated doc ids")

    u = sub.add_parser("update", help="incremental re-index from a new "
                                      "corpus snapshot")
    u.add_argument("--index", required=True)
    u.add_argument("--corpus")
    u.add_argument("--corpus-sf")
    u.add_argument("--replicate", type=int, default=1)

    cp = sub.add_parser("compact", help="rewrite postings without "
                                        "tombstones (or merge dirs only)")
    cp.add_argument("--index", required=True)
    cp.add_argument("--layout-only", action="store_true",
                    help="merge posting data dirs without re-encoding")

    vc = sub.add_parser("vacuum", help="expire old snapshots + GC data dirs")
    vc.add_argument("--index", required=True)
    vc.add_argument("--table", default=None,
                    help="one table (default: all index tables)")
    vc.add_argument("--keep-last", type=int, default=2)

    args = p.parse_args(argv)

    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog
    from zsolr.corpus import read_corpus, synth_corpus
    from zsolr.session import get_spark

    spark = get_spark("zsolr-cli", master=args.master)
    cat = ManifestParquetCatalog(args.index)

    def load_corpus():
        if getattr(args, "corpus_sf", None):
            return (synth_corpus(spark, args.corpus_sf, args.replicate),
                    f"{args.corpus_sf}-x{args.replicate}")
        return read_corpus(spark, args.corpus), args.corpus

    if args.cmd == "build":
        corpus, loc = load_corpus()
        cfg = BuildConfig(n_buckets=args.buckets,
                          resume_groups=args.resume_groups,
                          scored_fields=tuple(
                              f.strip() for f in args.scored_fields.split(",")
                              if f.strip()))
        t0 = time.time()
        res = IndexBuilder(cat, cfg).build(spark, loc, corpus_df=corpus)
        print(json.dumps({"n_docs": res.n_docs, "avgdl": res.avgdl,
                          "wall_s": round(time.time() - t0, 2),
                          "resumed": res.resumed_stages,
                          "stages": res.stages}))
    elif args.cmd == "search":
        from zsolr.search import Searcher
        searcher = Searcher(spark, cat)
        if args.count:
            df, n = searcher.search(args.query, k=args.k, start=args.start,
                                    sort=args.sort, wand=not args.no_wand,
                                    with_count=True)
            rows = df.collect()
            print(json.dumps({"numFound": n}))
        else:
            rows = searcher.search(args.query, k=args.k, start=args.start,
                                   sort=args.sort,
                                   wand=not args.no_wand).collect()
        for r in rows:
            print(_jdump(r.asDict()))
    elif args.cmd == "select":
        from zsolr.connection import SolrConnection
        conn = SolrConnection(spark, cat)
        res = conn.search(args.query, rows=args.rows, start=args.start,
                          sort=args.sort, fl=args.fl, fq=args.fq,
                          facet_field=args.facet_field,
                          facet_limit=args.facet_limit,
                          facet_mincount=args.facet_mincount,
                          facet_prefix=args.facet_prefix,
                          facet_missing=args.facet_missing,
                          cursor_mark=args.cursor_mark,
                          boost=args.boost, now=args.now,
                          def_type=args.def_type, qf=args.qf,
                          pf=args.pf, tie=args.tie, mm=args.mm)
        out = {"responseHeader": {"status": 0},
               "response": {"numFound": res.hits, "start": args.start,
                            "docs": res.docs}}
        if res.facets:
            out["facet_counts"] = res.facets
        if res.nextCursorMark is not None:
            out["nextCursorMark"] = res.nextCursorMark
        print(_jdump(out))
    elif args.cmd in ("facet", "suggest", "stats", "group", "mlt",
                      "spellcheck", "explain"):
        from zsolr.search import Searcher
        searcher = Searcher(spark, cat)
        if args.cmd == "facet" and args.frange:
            start, end, gap = (float(x) for x in args.frange.split(":"))
            df = searcher.facet_range(args.query, args.field, start, end, gap)
        elif args.cmd == "facet":
            df = searcher.facet(args.query, args.field, limit=args.limit)
        elif args.cmd == "suggest":
            df = searcher.suggest(args.prefix, args.n)
        elif args.cmd == "stats":
            df = searcher.stats(args.query, args.field)
        elif args.cmd == "mlt":
            df = searcher.more_like_this(args.doc_id, k=args.k,
                                         max_terms=args.max_terms)
        elif args.cmd == "spellcheck":
            df = searcher.spellcheck(args.word, n=args.n,
                                     max_edits=args.max_edits)
        elif args.cmd == "explain":
            df = searcher.explain(args.query, args.doc_id)
        elif len(args.fields) > 1:
            # repeated --field (Solr group.field): one kernel wave, one
            # grouped section per field
            grouped = searcher.group_topn_multi(args.query, args.fields,
                                                n=args.limit)
            df = None
            for fld, gdf in grouped.items():
                for r in gdf.collect():
                    print(_jdump({"group.field": fld, **r.asDict()}))
        elif args.limit > 1:
            df = searcher.group_topn(args.query, args.fields[0],
                                     n=args.limit)
        else:
            df = searcher.group_top1(args.query, args.fields[0])
        if df is not None:
            for r in df.collect():
                print(_jdump(r.asDict()))
    elif args.cmd == "batch":
        from zsolr.search import Searcher
        searcher = Searcher(spark, cat)
        for q, df in zip(args.queries,
                         searcher.search_batch(list(args.queries), k=args.k)):
            for r in df.collect():
                print(_jdump({"query": q, **r.asDict()}))
    elif args.cmd == "delete":
        from zsolr.lifecycle import delete_by_ids, delete_by_query
        if args.query:
            delete_by_query(spark, cat, args.query)
        elif args.ids:
            delete_by_ids(spark, cat, [int(x) for x in args.ids.split(",")])
        print(json.dumps({"deleted": True}))
    elif args.cmd == "update":
        from zsolr.lifecycle import incremental_update
        corpus, _loc = load_corpus()
        stats = incremental_update(spark, cat, corpus)
        print(json.dumps(stats))
    elif args.cmd == "vacuum":
        tables = [args.table] if args.table else \
            ["docs", "tfs", "postings", "term_stats", "index_stats",
             "manifest", "tombstones"]
        stats = {t: cat.expire_snapshots(t, keep_last=args.keep_last)
                 for t in tables if cat.exists(t)}
        print(json.dumps(stats))
    elif args.cmd == "compact":
        from zsolr.lifecycle import compact, compact_layout
        if args.layout_only:
            compact_layout(spark, cat)
        else:
            compact(spark, cat)
        print(json.dumps({"compacted": True,
                          "layout_only": bool(args.layout_only)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
