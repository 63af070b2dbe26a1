"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (index
plane I*, query plane Q*, harness breadth D*, plus the training-data ops in
``zsolr.ops``); ``oracle_sql()`` gives the DuckDB twin for each
SQL-expressible one.  Column names/aliases match pairwise (the driver's
compare hashes values under sorted column names).

Index-backed queries build the inverted index once per (process, sf_dir)
into a temp catalog and reuse it (module-level cache) — the build itself is
exercised by ``docid_dense``/``doclen_stats``/``term_doc_tf`` etc.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zsolr import ops  # noqa: E402
from zsolr.analyze import tokenize_codegen  # noqa: E402
from zsolr.build import BuildConfig, IndexBuilder  # noqa: E402
from zsolr.catalog import ManifestParquetCatalog  # noqa: E402
from zsolr.corpus import CORPUS_ORACLE_CTE, convert_fields, synth_corpus  # noqa: E402
from zsolr.search import Searcher  # noqa: E402

_IDX_CACHE: dict[str, tuple] = {}


def _index(spark: SparkSession, sf_dir: str) -> tuple:
    """Build (once per sf_dir) and return (catalog, Searcher)."""
    key = sf_dir.rstrip("/")
    if key not in _IDX_CACHE:
        root = tempfile.mkdtemp(prefix="zsolr-idx-")
        cat = ManifestParquetCatalog(root)
        corpus = synth_corpus(spark, sf_dir)
        IndexBuilder(cat, BuildConfig(n_buckets=16)).build(
            spark, f"{key}/corpus", corpus_df=corpus)
        _IDX_CACHE[key] = (cat, Searcher(spark, cat))
    return _IDX_CACHE[key]


def _index_dismax(spark: SparkSession, sf_dir: str) -> tuple:
    """Index with path as a second scored field (edismax schema, Q44) —
    built once per sf_dir, separate from the classic index so every
    other driver row keeps its exact historical plan/bytes."""
    key = f"{sf_dir.rstrip('/')}#dismax"
    if key not in _IDX_CACHE:
        root = tempfile.mkdtemp(prefix="zsolr-idx-dm-")
        cat = ManifestParquetCatalog(root)
        corpus = synth_corpus(spark, sf_dir)
        IndexBuilder(cat, BuildConfig(
            n_buckets=16, scored_fields=("content", "path"))).build(
            spark, f"{key}/corpus", corpus_df=corpus)
        _IDX_CACHE[key] = (cat, Searcher(spark, cat))
    return _IDX_CACHE[key]


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------- entry -----

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end BM25 search ('hash AND join', rows=10) over
    the sf0.001 corpus through the zeit.solr call shape — the
    ``SolrConnection`` facade over the full inverted-index engine
    (round-4 verdict #8), returning the (doc_id, repo, path, commit,
    score) rows a pysolr caller would read off ``Results.docs``."""
    from zsolr.connection import SolrConnection

    cat, _searcher = _index(spark, "/root/testdata/sf0.001")
    res = SolrConnection(spark, cat).search("hash AND join", rows=10)
    return spark.createDataFrame(
        [(d["doc_id"], d["repo"], d["path"], d["commit"], d["score"])
         for d in res.docs],
        "doc_id long, repo string, path string, commit string,"
        " score double")


# -------------------------------------------------------------- queries ----

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- index-build plane (I1-I5) ----
    # (`scan_project` retired round-6 for the 50-row cap: convert_fields
    # reads the same scan and projects a superset — I1 stays covered by
    # that row + the pytest ring; its slot goes to `topk_recency`.)
    q["convert_fields"] = lambda spark, sf: convert_fields(
        synth_corpus(spark, sf)).withColumn(
            "n_chars", F.col("n_chars").cast("long"))

    q["tokenize_counts"] = lambda spark, sf: synth_corpus(spark, sf).select(
        "repo", "path",
        F.size(tokenize_codegen(F.col("content"))).cast("long")
        .alias("n_tokens"))

    def docid_dense(spark, sf):
        cat, _s = _index(spark, sf)
        return cat.read(spark, "docs").select("doc_id", "repo", "path", "commit")
    q["docid_dense"] = docid_dense

    def doclen_stats(spark, sf):
        cat, _s = _index(spark, sf)
        return cat.read(spark, "docs").select("doc_id", "doc_len")
    q["doclen_stats"] = doclen_stats

    def term_doc_tf(spark, sf):
        cat, _s = _index(spark, sf)
        # exclude zero-scored metadata field terms ('lang=en') and the
        # norms sidecar — the SQL oracle models analyzed content tokens only
        return (cat.read(spark, "tfs").select("term", "doc_id", "tf")
                .filter(~F.col("term").contains("=")
                        & ~F.col("term").startswith("\x00")))
    q["term_doc_tf"] = term_doc_tf

    def term_df_stats(spark, sf):
        cat, _s = _index(spark, sf)
        return (cat.read(spark, "term_stats")
                .select("term", "df", F.col("max_tf").cast("long").alias("max_tf"))
                .filter(~F.col("term").contains("=")
                        & ~F.col("term").startswith("\x00")))
    q["term_df_stats"] = term_df_stats

    def term_lookup(spark, sf):
        _cat, s = _index(spark, sf)
        return s.term_postings("spark")
    q["term_lookup"] = term_lookup

    def postings_roundtrip(spark, sf):
        # encoded-postings integrity: per content term, the sum of block
        # n_docs must equal the term's df (I6 roundtrip, SQL-verified)
        cat, _s = _index(spark, sf)
        return (cat.read(spark, "postings")
                .filter(~F.col("term").contains("=")
                        & ~F.col("term").startswith("\x00"))
                .groupBy("term")
                .agg(F.sum("n_docs").alias("df")))
    q["postings_roundtrip"] = postings_roundtrip

    # round-7 rotation: term_df_quantiles (I11 planning statistic) and
    # semi_anti_join retire to the pytest ring under the driver's 50-row
    # cap, making room for the round-6/7 grouping + json.facet surface
    # (round-6 verdict next #7)

    # ---- query plane (Q2-Q11) ----
    def filter_lang(spark, sf):
        _cat, s = _index(spark, sf)
        return s.search("lang:en", k=None).select("doc_id", "repo", "path")
    q["filter_lang"] = filter_lang

    def _match_ids(spark, sf, query):
        _cat, s = _index(spark, sf)
        return s.search(query, k=None, wand=False).select("doc_id")

    q["and_intersect"] = lambda spark, sf: _match_ids(spark, sf, "hash AND join")
    q["or_union"] = lambda spark, sf: _match_ids(spark, sf, "stream OR batch")
    q["not_except"] = lambda spark, sf: _match_ids(spark, sf, "query AND NOT slow")
    # round-2: metadata equality / complement legs inside OR (constant-score
    # legs; evaluated fully in the kernel via zero-scored field terms and
    # the shard live-doc universe)
    q["or_meta_term"] = lambda spark, sf: _match_ids(
        spark, sf, "lang:en OR spark")
    q["or_with_not"] = lambda spark, sf: _match_ids(
        spark, sf, "hash OR NOT join")
    # round-2: PrefixQuery (constant-score term expansion) + clause boosts
    q["prefix_search"] = lambda spark, sf: _match_ids(spark, sf, "st*")
    q["fuzzy_search"] = lambda spark, sf: _match_ids(spark, sf, "sparl~1")
    # round-3/4: general mid-token wildcard (Lucene WildcardQuery, SQL-LIKE
    # dictionary expansion).  `wildcard_search` (*or*) and `or_pure_meta`
    # retired to the pytest ring for the driver's 50-row cap — wildcard_mid
    # subsumes infix patterns; or_meta_term keeps the meta-inside-OR row.
    q["wildcard_mid"] = lambda spark, sf: _match_ids(spark, sf, "s?a*")

    def boosted_or(spark, sf):
        from pyspark.sql import Window

        _cat, s = _index(spark, sf)
        out = s.search("spark^2 OR join", k=10)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.select(F.row_number().over(w).cast("long").alias("rank"),
                          "doc_id")
    q["boosted_or"] = boosted_or

    def topk_recency(spark, sf):
        from pyspark.sql import Window

        _cat, s = _index(spark, sf)
        # round-6: Solr {!boost b=recip(ms(NOW,ts),m,a,b)} — BM25 ×
        # recency over the typed ts field, NOW pinned for determinism
        out = s.search_boosted("spark", k=10,
                               boost="recip(ms(NOW,ts),1e-9,1,1)",
                               now="2021-06-01T00:00:00Z")
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.select(F.row_number().over(w).cast("long").alias("rank"),
                          "doc_id")
    q["topk_recency"] = topk_recency

    def topk_bm25(spark, sf):
        from pyspark.sql import Window

        _cat, s = _index(spark, sf)
        out = s.search("spark", k=10)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.select(F.row_number().over(w).cast("long").alias("rank"),
                          "doc_id")
    q["topk_bm25"] = topk_bm25

    def search_e2e(spark, sf):
        _cat, s = _index(spark, sf)
        out = s.search("hash AND join", k=10)
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.select(F.row_number().over(w).cast("long").alias("rank"),
                          "repo", "path", "commit")
    q["search_e2e"] = search_e2e

    def page_sort(spark, sf):
        _cat, s = _index(spark, sf)
        return s.search("spark", k=10, start=5, sort="path").select(
            "doc_id", "path")
    q["page_sort"] = page_sort

    # round-4: Solr compound sort (Q28) — two keys + doc_id tiebreak,
    # offset applied after the executor-side cut; rank re-derived over the
    # returned page so the driver hash verifies ORDER, not just the set
    def sort_compound(spark, sf):
        from pyspark.sql import Window

        _cat, s = _index(spark, sf)
        out = s.search("spark", k=10, start=2, sort="repo desc, path")
        w = Window.orderBy(F.desc("repo"), F.asc("path"), F.asc("doc_id"))
        return out.select(F.row_number().over(w).cast("long").alias("rank"),
                          "doc_id", "repo", "path")
    q["sort_compound"] = sort_compound

    # round-5: Solr cursorMark (Q32) — page 2 of the ranking via the
    # strictly-after kernel filter; the oracle is the rank window rows
    # k+1..2k, so the cut logic (not just page 1) is hash-verified
    def search_after_page2(spark, sf):
        from pyspark.sql import Window

        _cat, s = _index(spark, sf)
        _df1, cur = s.search_after("stream OR batch", k=10)
        df2, _cur2 = s.search_after("stream OR batch", k=10, after=cur)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return df2.select(F.row_number().over(w).cast("long").alias("rank"),
                          "doc_id")
    q["search_after"] = search_after_page2

    # round-5: group.limit=n (Q33) — per-group top-n + hit counts in one
    # kernel pass (score column dropped: rank encodes the order and the
    # driver hash compares float-exact otherwise)
    def group_topn_lang(spark, sf):
        _cat, s = _index(spark, sf)
        return s.group_topn("spark", "lang", n=3).select(
            "group_val", "rank", "doc_id", "hits")
    q["group_topn"] = group_topn_lang

    # round-6: typed date field end-to-end (I3/Q17) — the corpus carries a
    # real TIMESTAMP commit-date; the Solr date-range syntax parses to a
    # pushed-down timestamp predicate on the doc store; output epoch
    # seconds are instant-based, so the row is timezone-independent
    def filter_ts_range(spark, sf):
        cat, s = _index(spark, sf)
        hits = s.search(
            "ts:[2020-02-01T00:00:00Z TO 2020-06-01T00:00:00Z] AND spark",
            k=None, wand=False).select("doc_id")
        return hits.join(
            cat.read(spark, "docs").select(
                "doc_id", F.unix_timestamp("ts").alias("ts_s")), "doc_id")
    q["filter_ts_range"] = filter_ts_range

    # round-6: MoreLikeThis (Q25) — doc 0's top tf·idf interesting terms
    # form the OR query, source excluded; the oracle recomputes the same
    # term selection (tie-break: term asc) and ranking in pure SQL
    def mlt_top(spark, sf):
        from pyspark.sql import Window

        _cat, s = _index(spark, sf)
        out = s.more_like_this(0, k=10)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.select(F.row_number().over(w).cast("long").alias("rank"),
                          "doc_id")
    q["mlt_top"] = mlt_top

    # round-6: debugQuery / Lucene Explanation (Q29) — the per-term BM25
    # breakdown for the top-1 doc of 'hash AND join'; doubles rounded to
    # 6 dp on both sides (ln() libm bit-identity across engines is not
    # guaranteed; the exact Σ==score invariant is pytest-gated at 1e-12)
    def explain_score(spark, sf):
        _cat, s = _index(spark, sf)
        top = s.search("hash AND join", k=1).collect()
        df = s.explain("hash AND join", int(top[0]["doc_id"]))
        return df.select(
            "term", "tf", "df",
            F.round("idf", 6).alias("idf_r"),
            F.round("tf_norm", 6).alias("tf_norm_r"),
            F.round("contribution", 6).alias("contrib_r"))
    q["explain_score"] = explain_score

    def facet_lang(spark, sf):
        _cat, s = _index(spark, sf)
        return s.facet("spark", "lang")
    q["facet_lang"] = facet_lang

    # round-4: Solr pivot facet (Q27) — one two-key hash agg, map-side
    # partials (never Solr's recursive per-value sub-queries)
    def facet_pivot(spark, sf):
        _cat, s = _index(spark, sf)
        return s.facet_pivot("spark", "lang", "repo")
    q["facet_pivot"] = facet_pivot

    # round-2 Solr components: suggester, stats.field, range facets,
    # result grouping
    def suggest_terms(spark, sf):
        _cat, s = _index(spark, sf)
        return s.suggest("s", 10)
    q["suggest_terms"] = suggest_terms

    def stats_doclen(spark, sf):
        _cat, s = _index(spark, sf)
        return s.stats("spark", "doc_len")
    q["stats_doclen"] = stats_doclen

    def facet_range_doclen(spark, sf):
        _cat, s = _index(spark, sf)
        return s.facet_range("spark", "doc_len", 0, 200, 25)
    q["facet_range_doclen"] = facet_range_doclen

    def topk_dismax(spark, sf):
        # Q44 — edismax qf multi-field ranking: per-field BM25 (content
        # vs path, each with its own df/dl/avgdl + per-field norms
        # sidecar) combined per term as DisjunctionMaxQuery, summed over
        # the OR.  Separate index build (scored_fields schema knob);
        # cached per sf like _index.  (group_top1_lang rotated to the
        # pytest ring under the 50-row cap — subsumed by group_topn /
        # group_topn_multi rows.)
        _cat, s = _index_dismax(spark, sf)
        out = s.search_dismax("dir3 OR spark",
                              qf={"path": 2.0, "content": 1.0},
                              tie=0.3, k=10)
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return (out.withColumn("rank", F.row_number().over(w))
                .select(F.col("rank").cast("long").alias("rank"),
                        "doc_id"))
    q["topk_dismax"] = topk_dismax

    # round-3: batched execution — 3 queries in ONE kernel wave + ONE doc
    # fetch (search_batch), bit-identical to serial search()
    def batch_search(spark, sf):
        from pyspark.sql import Window

        _cat, s = _index(spark, sf)
        qs = ["spark", "hash AND join", "stream OR batch"]
        dfs = s.search_batch(qs, k=10)
        parts = []
        for i, df in enumerate(dfs):
            w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
            parts.append(df.select(
                F.lit(i).cast("long").alias("qid"),
                F.row_number().over(w).cast("long").alias("rank"),
                "doc_id"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    q["batch_search"] = batch_search

    # ---- lifecycle demos (I9, I10) ----
    q["delete_antijoin"] = lambda spark, sf: _docs(spark, sf).join(
        _docs(spark, sf).filter(F.col("doc_id") % 17 == 0).select("doc_id"),
        "doc_id", "left_anti").select("doc_id")

    def incremental_diff(spark, sf):
        d = _docs(spark, sf)
        old = d.filter(F.col("doc_id") % 10 != 0).select(
            "doc_id", F.col("text").alias("old_text"))
        new = d.filter(F.col("doc_id") % 7 != 0).select(
            "doc_id",
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.col("text"), F.lit(" changed")))
            .otherwise(F.col("text")).alias("new_text"))
        j = old.join(new, "doc_id", "full_outer")
        return j.select(
            "doc_id",
            F.when(F.col("old_text").isNull(), F.lit("added"))
            .when(F.col("new_text").isNull(), F.lit("removed"))
            .when(F.col("old_text") != F.col("new_text"), F.lit("changed"))
            .otherwise(F.lit("unchanged")).alias("status"))
    q["incremental_diff"] = incremental_diff

    # ---- training-data ops (dedup / similarity / text / multimodal) ----
    q["dedup_exact"] = lambda spark, sf: ops.dedup_exact(_docs(spark, sf))
    # max_bucket=None EXPLICITLY (round-4 advice): the engine's default
    # skew guard (4096) has no oracle-side twin — at a scale where a band
    # bucket exceeded the cap the two sides would diverge by design, so
    # the driver row pins the exact variant on both sides
    q["dedup_minhash_lsh"] = lambda spark, sf: ops.minhash_lsh_pairs(
        _docs(spark, sf).filter(F.col("doc_id") % 10 == 0),
        max_bucket=None)
    # (simhash + events_windowed retired to the pytest ring round-5 for
    # the driver's 50-row cap, making room for search_after/group_topn —
    # the two newest cut paths; lang_id_heuristic likewise round-3)
    q["lang_id_ngram"] = lambda spark, sf: ops.lang_id_ngram(
        _docs(spark, sf).filter(F.col("doc_id") % 5 == 0))
    q["quality_score"] = lambda spark, sf: ops.quality_score(_docs(spark, sf))
    # (media_features stays pytest-covered — its driver row is retired for
    # the 50-row cap in favor of the round-3/4 query components; round 6
    # likewise retires doc_fingerprint, ngram_jaccard and token_count_bpe
    # — pure-codegen breadth with python-oracle pytest rings — for
    # filter_ts_range, mlt_top and explain_score, the round-6 cut paths)

    def dedup_emb_cosine(spark, sf):
        """Embedding near-dup pairs over the fixture augmented with scaled
        copies (vec_id+10000, 2·v): exact-direction duplicates collide in
        every LSH band, so the banded-candidate → exact-verify pipeline is
        provably complete here and the brute-force SQL oracle must agree."""
        emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
            "vec_id", "embedding")
        dup = emb.select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding",
                        lambda x: (x * F.lit(2.0)).cast("float"))
            .alias("embedding"))
        return ops.dedup_embedding_cosine(emb.unionByName(dup), tau=0.99)
    q["dedup_embedding_cosine"] = dedup_emb_cosine

    def ann_cosine(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
        return ops.cosine_topk(emb, qv, k=10)
    q["ann_cosine_topk"] = ann_cosine

    def ann_lsh(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
        return ops.lsh_bucket_topk(emb, qv, k=5)
    q["ann_lsh_bucketed"] = ann_lsh

    def ann_ivf(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
        return ops.ann_ivf_topk(emb, qv, k=5, n_cells=8, nprobe=2)
    q["ann_ivf_topk"] = ann_ivf

    # round-4: k-means-TRAINED IVF codebook (D4) — training is a
    # deterministic function of (data, seed), so the oracle reproduces the
    # identical codebook offline (same numpy Lloyd core via pyarrow) and
    # inlines it as literals
    def ann_ivf_trained(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
        cents = ops.train_ivf_centroids(emb, n_cells=8, iters=5, seed=7)
        return ops.ann_ivf_topk(emb, qv, k=5, n_cells=8, nprobe=2,
                                centroids=cents)
    q["ann_ivf_trained"] = ann_ivf_trained

    # ---- harness breadth (SURVEY §2.4, non-parity).  Round-3: the five
    # TPC-H-style generic-Spark entries (tpch_q1, topk_per_group,
    # broadcast_join_agg, cube/rollup) are retired from the driver list —
    # the driver caps CORRECTNESS at 50 rows and every §2-relevant entry
    # must get one (round-2 verdict #5); semi+anti merge into one entry
    # exercising both join types.
    # round-7: multi-field result grouping (Q41) — repeated group.field
    # params share ONE kernel evaluation; per-field two-level salted
    # top-n cut (score dropped like group_topn: rank encodes the order)
    def group_topn_multi_q(spark, sf):
        _cat, s = _index(spark, sf)
        multi = s.group_topn_multi("spark", ["lang", "repo"], n=2)
        out = None
        for fld in ("lang", "repo"):
            part = multi[fld].select(
                F.lit(fld).alias("gfield"),
                F.col("group_val").cast("string").alias("group_val"),
                "rank", "doc_id", "hits")
            out = part if out is None else out.unionByName(part)
        return out
    q["group_topn_multi"] = group_topn_multi_q

    # round-7: json.facet bucket stats (Q42) — per-bucket hit count plus
    # nested numeric aggregations in ONE hash agg (integer-exact stats so
    # the driver value-hash is summation-order-independent)
    def facet_stats_q(spark, sf):
        _cat, s = _index(spark, sf)
        return s.facet_stats("spark", "lang",
                             {"sum_len": ("sum", "doc_len"),
                              "max_len": ("max", "doc_len")})
    q["facet_stats"] = facet_stats_q

    def asof_join_events(spark, sf):
        """As-of join (Spark has no native one — SURVEY §2.4): for every
        'click', the most recent prior-or-equal 'view' ts by the same user.
        Union-tag + running last_value over an event-time window — one
        range-free sort-based pass, no per-row Python."""
        from pyspark.sql import Window

        e = spark.read.parquet(f"{sf}/events.parquet")
        clicks = e.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts").withColumn("side", F.lit(1))
        views = e.filter(F.col("event_type") == "view").select(
            F.lit(None).cast("long").alias("event_id"), "user_id",
            "ts").withColumn("side", F.lit(0))
        both = clicks.unionByName(views)
        # views sort before clicks at equal ts (side asc) so ts >= view_ts
        w = (Window.partitionBy("user_id").orderBy("ts", "side")
             .rowsBetween(Window.unboundedPreceding, 0))
        tagged = both.withColumn(
            "last_view_s",
            F.last(F.when(F.col("side") == 0,
                          F.unix_timestamp("ts")), ignorenulls=True).over(w))
        return (tagged.filter(F.col("side") == 1)
                .select("event_id", "user_id", "last_view_s"))
    q["asof_join_events"] = asof_join_events

    def sessionize(spark, sf):
        e = spark.read.parquet(f"{sf}/events.parquet")
        return ops.sessionize_events(e, gap_s=1800)
    q["sessionize_events"] = sessionize

    return q


# ----------------------------------------------------------- oracle SQL ----

# shared CTE chain: corpus → ids (row_number docIDs, identical to the
# engine's deterministic rank assignment) → tokens → tf → doc_len → stats
_BASE = f"""WITH {CORPUS_ORACLE_CTE.strip()},
ids AS (
  SELECT repo, path, "commit", lang, content, ts, ts_s,
         row_number() OVER (ORDER BY repo, path, "commit") - 1 AS doc_id
  FROM corpus
),
toks AS (
  SELECT doc_id, lang, repo, path, "commit",
         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'),
                     x -> x <> '') AS ts
  FROM ids
),
tf AS (
  SELECT doc_id, t.term AS term, count(*)::BIGINT AS tf
  FROM toks, unnest(ts) AS t(term)
  GROUP BY doc_id, t.term
),
dl AS (
  SELECT i.doc_id, COALESCE(s.doc_len, 0)::BIGINT AS doc_len
  FROM ids i LEFT JOIN (
    SELECT doc_id, sum(tf)::BIGINT AS doc_len FROM tf GROUP BY doc_id
  ) s USING (doc_id)
),
stats AS (
  SELECT (SELECT count(*) FROM ids)::DOUBLE AS n,
         (SELECT COALESCE(sum(tf), 0) FROM tf)::DOUBLE
           / (SELECT count(*) FROM ids) AS avgdl
),
tdf AS (
  SELECT term, count(*)::BIGINT AS df, max(tf)::BIGINT AS max_tf
  FROM tf GROUP BY term
)"""

# BM25 per-(term, doc) score mirroring the kernel's float expression tree
_SCORE = ("ln(1 + (st.n - tdf.df + 0.5)/(tdf.df + 0.5)) * tf.tf * (1.2 + 1.0)"
          " / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doc_len / st.avgdl))")

_DOC_TOKS = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
             " x -> x <> '')")


def _ann_lsh_oracle(k: int = 5, n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB twin of ops.lsh_bucket_topk: the seeded hyperplanes are
    inlined as literal doubles; projections are written as the same
    left-associative double sums the Spark fold computes, so sign bits are
    bit-identical; the Hamming-≤1 multi-probe is a character-distance
    filter against the query's bucket computed from the same data."""
    planes = ops.lsh_planes(n_planes, dim)

    def bucket(col: str) -> str:
        bits = []
        for p in planes:
            s = " + ".join(f"({col}[{i + 1}]::DOUBLE * {float(x)!r})"
                           for i, x in enumerate(p))
            bits.append(f"CASE WHEN 0.0 + {s} >= 0 THEN '1' ELSE '0' END")
        return "concat(" + ", ".join(bits) + ")"

    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
b AS (SELECT vec_id, embedding, {bucket('embedding')} AS bucket
      FROM embeddings),
qb AS (SELECT {bucket('qv')} AS bucket FROM q),
cand AS (
  SELECT b.vec_id, b.embedding FROM b, qb
  WHERE len(list_filter(range(1, {n_planes + 1}),
        i -> substr(b.bucket, i::INTEGER, 1)
             <> substr(qb.bucket, i::INTEGER, 1))) <= 1),
sz AS (SELECT count(*)::BIGINT AS bucket_size FROM cand),
sims AS (SELECT vec_id,
                list_cosine_similarity(embedding, (SELECT qv FROM q)) AS cos
         FROM cand)
SELECT row_number() OVER (ORDER BY cos DESC, vec_id)::BIGINT AS rank, vec_id,
       (SELECT bucket_size FROM sz) AS bucket_size
FROM sims ORDER BY cos DESC, vec_id LIMIT {k}"""


def _trained_cents(n_cells: int = 8, iters: int = 5, seed: int = 7,
                   sample: int = 65536):
    """Offline twin of ops.train_ivf_centroids: the identical id-ordered
    sample read via pyarrow (no Spark) through the SAME numpy Lloyd core
    (ops.lloyd_spherical), so the codebook literals inlined into the
    DuckDB oracle are bit-identical to what the engine trains.  The sf
    dir comes from ZSOLR_ORACLE_SF_DIR, defaulting to the driver's
    correctness scale (sf0.01)."""
    import numpy as np
    import pyarrow.parquet as pq

    sf = os.environ.get("ZSOLR_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    embs = t.column("embedding").to_pylist()
    order = np.argsort(vid, kind="stable")[:sample]
    x = np.asarray([embs[i] for i in order], dtype=np.float64)
    return ops.lloyd_spherical(x, n_cells, iters, seed)


def _ann_ivf_oracle(k: int = 5, n_cells: int = 8, nprobe: int = 2,
                    dim: int = 64, cents=None) -> str:
    """DuckDB twin of ops.ann_ivf_topk: centroids inlined as literals;
    cell = 0-based first-index-of-max over the same left-associative dot
    sums (list_position + list_aggregate max ↔ Spark array_position +
    array_max — identical tie rule); probes computed in numpy here since
    the centroids are seeded (or deterministically trained) constants."""
    import numpy as np

    if cents is None:
        cents = ops.ivf_centroids(n_cells, dim)

    def dot(col: str, c) -> str:
        return "0.0 + " + " + ".join(
            f"({col}[{i + 1}]::DOUBLE * {float(x)!r})"
            for i, x in enumerate(c))

    dots = "list_value(" + ", ".join(
        dot("embedding", c) for c in cents) + ")"
    # probes for the vec_id=0 query are data-dependent; but cells are a
    # pure function of the embedding, so filter by recomputed cell ranks
    # of the QUERY vector done via a scalar subquery on the same dots list
    qdots = "list_value(" + ", ".join(
        dot("qv", c) for c in cents) + ")"
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qd AS (SELECT {qdots} AS l FROM q),
probes AS (
  SELECT j - 1 AS cell
  FROM qd, range(1, {n_cells + 1}) t(j)
  ORDER BY l[j::INTEGER] DESC, j LIMIT {nprobe}),
b AS (
  SELECT vec_id, embedding,
         (list_position({dots},
                        list_aggregate({dots}, 'max')) - 1) AS cell
  FROM embeddings),
cand AS (SELECT b.* FROM b WHERE cell IN (SELECT cell FROM probes)),
sz AS (SELECT count(*)::BIGINT AS n_cand FROM cand),
sims AS (SELECT vec_id,
                list_cosine_similarity(embedding, (SELECT qv FROM q)) AS cos
         FROM cand)
SELECT row_number() OVER (ORDER BY cos DESC, vec_id)::BIGINT AS rank, vec_id,
       (SELECT n_cand FROM sz) AS n_cand
FROM sims ORDER BY cos DESC, vec_id LIMIT {k}"""


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    # NOW=2021-06-01T00:00:00Z → 1622505600000 epoch ms; multiplier =
    # a/(m·(NOW_ms − ts_ms)+b) with Solr recip semantics (ms(NOW,ts))
    o["topk_recency"] = f"""{_BASE},
scored AS (
  SELECT tf.doc_id, {_SCORE} AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term = 'spark'),
boosted AS (
  SELECT s.doc_id,
         s.score * (1.0 / (1e-9 * (1622505600000.0 - i.ts_s * 1000.0)
                           + 1.0)) AS score
  FROM scored s JOIN ids i USING (doc_id))
SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
       doc_id
FROM boosted ORDER BY score DESC, doc_id LIMIT 10"""

    o["convert_fields"] = f"""{_BASE}
SELECT repo, path, "commit", lang, sha256(content) AS content_sha256,
       length(content)::BIGINT AS n_chars, ts_s
FROM corpus"""

    o["tokenize_counts"] = f"""{_BASE}
SELECT repo, path, len(ts)::BIGINT AS n_tokens FROM toks"""

    o["docid_dense"] = f"""{_BASE}
SELECT doc_id, repo, path, "commit" FROM ids"""

    o["doclen_stats"] = f"""{_BASE}
SELECT doc_id, doc_len FROM dl"""

    o["term_doc_tf"] = f"""{_BASE}
SELECT term, doc_id, tf FROM tf"""

    o["term_df_stats"] = f"""{_BASE}
SELECT term, df, max_tf FROM tdf"""

    o["term_lookup"] = f"""{_BASE}
SELECT doc_id, tf FROM tf WHERE term = 'spark'"""

    o["postings_roundtrip"] = f"""{_BASE}
SELECT term, df FROM tdf"""


    o["filter_lang"] = f"""{_BASE}
SELECT doc_id, repo, path FROM ids WHERE lang = 'en'"""

    o["and_intersect"] = f"""{_BASE}
SELECT doc_id FROM tf WHERE term = 'hash'
INTERSECT SELECT doc_id FROM tf WHERE term = 'join'"""

    o["or_union"] = f"""{_BASE}
SELECT doc_id FROM tf WHERE term = 'stream'
UNION SELECT doc_id FROM tf WHERE term = 'batch'"""

    o["not_except"] = f"""{_BASE}
SELECT doc_id FROM tf WHERE term = 'query'
EXCEPT SELECT doc_id FROM tf WHERE term = 'slow'"""

    o["or_meta_term"] = f"""{_BASE}
SELECT doc_id FROM ids WHERE lang = 'en'
UNION SELECT doc_id FROM tf WHERE term = 'spark'"""

    o["or_with_not"] = f"""{_BASE}
SELECT doc_id FROM tf WHERE term = 'hash'
UNION (SELECT doc_id FROM ids
       EXCEPT SELECT doc_id FROM tf WHERE term = 'join')"""

    o["prefix_search"] = f"""{_BASE}
SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'st%'"""

    o["fuzzy_search"] = f"""{_BASE}
SELECT DISTINCT doc_id FROM tf WHERE levenshtein(term, 'sparl') <= 1"""

    o["wildcard_mid"] = f"""{_BASE}
SELECT DISTINCT doc_id FROM tf WHERE term LIKE 's_a%'"""

    o["boosted_or"] = f"""{_BASE},
scored AS (
  SELECT tf.doc_id,
         sum((CASE WHEN tf.term = 'spark' THEN 2.0 ELSE 1.0 END)
             * {_SCORE}) AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term IN ('spark', 'join')
  GROUP BY tf.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank, doc_id
FROM scored ORDER BY score DESC, doc_id LIMIT 10"""

    o["topk_bm25"] = f"""{_BASE},
scored AS (
  SELECT tf.doc_id, {_SCORE} AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term = 'spark')
SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank, doc_id
FROM scored ORDER BY score DESC, doc_id LIMIT 10"""

    o["search_e2e"] = f"""{_BASE},
scored AS (
  SELECT tf.doc_id, sum({_SCORE}) AS score, count(*) AS nt
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term IN ('hash', 'join')
  GROUP BY tf.doc_id HAVING count(*) = 2),
top AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
         doc_id
  FROM scored ORDER BY score DESC, doc_id LIMIT 10)
SELECT top.rank, i.repo, i.path, i."commit"
FROM top JOIN ids i USING (doc_id)"""

    o["page_sort"] = f"""{_BASE},
matches AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT i.doc_id, i.path
FROM matches JOIN ids i USING (doc_id)
ORDER BY i.path, i.doc_id LIMIT 10 OFFSET 5"""

    o["sort_compound"] = f"""{_BASE},
matches AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark'),
page AS (
  SELECT i.doc_id, i.repo, i.path
  FROM matches JOIN ids i USING (doc_id)
  ORDER BY i.repo DESC, i.path ASC, i.doc_id LIMIT 10 OFFSET 2)
SELECT row_number() OVER (ORDER BY repo DESC, path ASC, doc_id)::BIGINT
         AS rank,
       doc_id, repo, path
FROM page"""

    # round-5: cursorMark page 2 = rows k+1..2k of the full ranking (the
    # cursor itself is data-dependent; the RESULT is pure SQL)
    o["search_after"] = f"""{_BASE},
scored AS (
  SELECT tf.doc_id, sum({_SCORE}) AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term IN ('stream', 'batch')
  GROUP BY tf.doc_id),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
  FROM scored)
SELECT (rn - 10)::BIGINT AS rank, doc_id
FROM ranked WHERE rn BETWEEN 11 AND 20"""

    # round-5: group.limit=n — per-group rank + hit counts over the full
    # match set
    o["group_topn"] = f"""{_BASE},
scored AS (
  SELECT tf.doc_id, {_SCORE} AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term = 'spark'),
ranked AS (
  SELECT i.lang, s.doc_id,
         row_number() OVER (PARTITION BY i.lang
                            ORDER BY s.score DESC, s.doc_id) AS rn,
         count(*) OVER (PARTITION BY i.lang) AS hits
  FROM scored s JOIN ids i USING (doc_id))
SELECT lang AS group_val, rn::BIGINT AS rank, doc_id, hits::BIGINT AS hits
FROM ranked WHERE rn <= 3"""

    # round-6: typed date range — real TIMESTAMP comparison in the oracle
    # (WHERE ts BETWEEN), epoch seconds as the tz-independent compared value
    o["filter_ts_range"] = f"""{_BASE},
matches AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT i.doc_id, i.ts_s
FROM matches JOIN ids i USING (doc_id)
WHERE i.ts BETWEEN TIMESTAMP '2020-02-01 00:00:00'
               AND TIMESTAMP '2020-06-01 00:00:00'"""

    # round-6: MoreLikeThis — interesting-term selection (top-8 by tf·idf,
    # term-asc tie-break) + OR ranking, source doc 0 excluded
    o["mlt_top"] = f"""{_BASE},
interesting AS (
  SELECT tf.term,
         tf.tf * ln(1 + (st.n - tdf.df + 0.5)/(tdf.df + 0.5)) AS ti
  FROM tf JOIN tdf USING (term) CROSS JOIN stats st
  WHERE tf.doc_id = 0
  ORDER BY ti DESC, tf.term LIMIT 8),
scored AS (
  SELECT tf.doc_id, sum({_SCORE}) AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term IN (SELECT term FROM interesting) AND tf.doc_id <> 0
  GROUP BY tf.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank, doc_id
FROM scored ORDER BY score DESC, doc_id LIMIT 10"""

    # round-6: explain breakdown for the top-1 'hash AND join' doc —
    # weight is 1.0 for every leg of a plain AND, so the compared columns
    # are the per-term stats + rounded idf/tf_norm/contribution
    o["explain_score"] = f"""{_BASE},
scored AS (
  SELECT tf.doc_id, sum({_SCORE}) AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term IN ('hash', 'join')
  GROUP BY tf.doc_id HAVING count(*) = 2),
top1 AS (SELECT doc_id FROM scored ORDER BY score DESC, doc_id LIMIT 1)
SELECT tf.term, tf.tf, tdf.df,
       round(ln(1 + (st.n - tdf.df + 0.5)/(tdf.df + 0.5)), 6) AS idf_r,
       round(tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doc_len / st.avgdl)),
             6) AS tf_norm_r,
       round({_SCORE}, 6) AS contrib_r
FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
WHERE tf.doc_id = (SELECT doc_id FROM top1)
  AND tf.term IN ('hash', 'join')"""

    o["facet_lang"] = f"""{_BASE},
matches AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT i.lang, count(*)::BIGINT AS hits
FROM matches JOIN ids i USING (doc_id) GROUP BY i.lang"""

    o["facet_pivot"] = f"""{_BASE},
matches AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT i.lang AS pivot_a, i.repo AS pivot_b, count(*)::BIGINT AS hits
FROM matches JOIN ids i USING (doc_id) GROUP BY 1, 2"""

    o["suggest_terms"] = f"""{_BASE}
SELECT term, df FROM tdf WHERE term LIKE 's%'
ORDER BY df DESC, term LIMIT 10"""

    o["stats_doclen"] = f"""{_BASE},
matches AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT count(*)::BIGINT AS n, min(doc_len)::BIGINT AS min_v,
       max(doc_len)::BIGINT AS max_v, sum(doc_len)::BIGINT AS sum_v,
       avg(doc_len) AS mean_v
FROM matches JOIN dl USING (doc_id)"""

    o["facet_range_doclen"] = f"""{_BASE},
matches AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT (floor(doc_len / 25) * 25)::BIGINT AS bucket_start,
       count(*)::BIGINT AS hits
FROM matches JOIN dl USING (doc_id)
WHERE doc_len >= 0 AND doc_len < 200
GROUP BY 1"""

    o["batch_search"] = f"""{_BASE},
s0 AS (
  SELECT tf.doc_id, {_SCORE} AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term = 'spark'),
t0 AS (
  SELECT 0::BIGINT AS qid,
         row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
         doc_id
  FROM s0 ORDER BY score DESC, doc_id LIMIT 10),
s1 AS (
  SELECT tf.doc_id, sum({_SCORE}) AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term IN ('hash', 'join')
  GROUP BY tf.doc_id HAVING count(*) = 2),
t1 AS (
  SELECT 1::BIGINT AS qid,
         row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
         doc_id
  FROM s1 ORDER BY score DESC, doc_id LIMIT 10),
s2 AS (
  SELECT tf.doc_id, sum({_SCORE}) AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term IN ('stream', 'batch')
  GROUP BY tf.doc_id),
t2 AS (
  SELECT 2::BIGINT AS qid,
         row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
         doc_id
  FROM s2 ORDER BY score DESC, doc_id LIMIT 10)
SELECT * FROM t0 UNION ALL SELECT * FROM t1 UNION ALL SELECT * FROM t2"""

    # Q44 edismax twin: per-field BM25 (path tokenized with the same
    # normative analyzer; per-field df/dl/avgdl) combined per (doc, term)
    # as greatest + tie·(sum − greatest) — 0-filled contributions are
    # sound because BM25 parts are non-negative — then summed over the OR
    o["topk_dismax"] = f"""{_BASE},
pt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(path), '[^a-z0-9]+'),
                     x -> x <> '') AS pts
  FROM ids),
ptf AS (
  SELECT doc_id, t.term AS term, count(*)::BIGINT AS tf
  FROM pt, unnest(pts) AS t(term) GROUP BY doc_id, t.term),
pdl AS (SELECT doc_id, len(pts)::BIGINT AS doc_len FROM pt),
pstats AS (
  SELECT (SELECT count(*) FROM ids)::DOUBLE AS n,
         (SELECT avg(len(pts)) FROM pt)::DOUBLE AS avgdl),
ptdf AS (SELECT term, count(*)::BIGINT AS df FROM ptf GROUP BY term),
cpart AS (
  SELECT tf.doc_id, tf.term, {_SCORE} AS sc
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term IN ('dir3', 'spark')),
ppart AS (
  SELECT ptf.doc_id, ptf.term,
         2.0 * ln(1 + (st.n - ptdf.df + 0.5)/(ptdf.df + 0.5)) * ptf.tf
             * (1.2 + 1.0)
             / (ptf.tf + 1.2 * (1 - 0.75 + 0.75 * pdl.doc_len / st.avgdl))
           AS sc
  FROM ptf JOIN ptdf USING (term) JOIN pdl USING (doc_id)
       CROSS JOIN pstats st
  WHERE ptf.term IN ('dir3', 'spark')),
parts AS (
  SELECT doc_id, COALESCE(c.sc, 0) AS c, COALESCE(p.sc, 0) AS p
  FROM cpart c FULL OUTER JOIN ppart p USING (doc_id, term)),
scored AS (
  SELECT doc_id,
         sum(greatest(c, p) + 0.3 * (c + p - greatest(c, p))) AS score
  FROM parts GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
       doc_id
FROM scored ORDER BY score DESC, doc_id LIMIT 10"""

    o["delete_antijoin"] = """
SELECT doc_id FROM documents WHERE doc_id NOT IN (
  SELECT doc_id FROM documents WHERE doc_id % 17 = 0)"""

    o["incremental_diff"] = """
WITH old AS (SELECT doc_id, text AS old_text FROM documents
             WHERE doc_id % 10 <> 0),
new AS (SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' changed'
                    ELSE text END AS new_text
        FROM documents WHERE doc_id % 7 <> 0)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'removed'
            WHEN old_text <> new_text THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new USING (doc_id)"""

    o["dedup_exact"] = """
SELECT sha256(text) AS text_sha, min(doc_id) AS keeper,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY sha256(text)"""

    # universal-hash family (round-4): ONE md5 base per token, then
    # h_k = (a_k·lo + b_k·hi + c_k) mod 2^61−1 — constants single-sourced
    # from zsolr.ops so engine and oracle cannot drift
    _mh_case = " ".join(
        f"WHEN {k} THEN ({ops._MH_A[k]} * (base & {ops._MH_MASK}) "
        f"+ {ops._MH_B[k]} * (base >> 28) + {ops._MH_C[k]}) % {ops._MH_P}"
        for k in range(8))
    o["dedup_minhash_lsh"] = f"""
WITH sub AS (SELECT doc_id, {_DOC_TOKS} AS ts FROM documents
             WHERE doc_id % 10 = 0),
tok_set AS (SELECT DISTINCT doc_id, t.term AS term
            FROM sub, unnest(ts) AS t(term)),
based AS (SELECT doc_id,
                 ('0x' || substr(md5(term), 1, 15))::BIGINT AS base
          FROM tok_set),
hashes AS (
  SELECT doc_id, k.k, (CASE k.k {_mh_case} END)::BIGINT AS h
  FROM based CROSS JOIN (SELECT unnest(range(8)) AS k) k),
sig AS (SELECT doc_id, k, min(h) AS mh FROM hashes GROUP BY doc_id, k),
bands AS (
  SELECT doc_id, (k // 2)::INTEGER AS band,
         min(CASE WHEN k % 2 = 0 THEN mh END) AS h0,
         min(CASE WHEN k % 2 = 1 THEN mh END) AS h1
  FROM sig GROUP BY doc_id, (k // 2)::INTEGER)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.h0 = b.h0 AND a.h1 = b.h1
 AND a.doc_id < b.doc_id"""

    def _tri_hits(lang: str) -> str:
        lits = ", ".join(
            "'" + g.replace("'", "''") + "'" for g in ops.LANG_TRIGRAMS[lang])
        return (f"len(list_filter(list_transform("
                f"range(1, greatest(length(lower(text)) - 2, 0) + 1),"
                f" i -> substr(lower(text), i::INTEGER, 3)),"
                f" t -> t IN ({lits})))::BIGINT")

    o["lang_id_ngram"] = f"""
WITH h AS (
  SELECT doc_id, {_tri_hits('de')} AS de_hits, {_tri_hits('en')} AS en_hits,
         {_tri_hits('fr')} AS fr_hits
  FROM documents WHERE doc_id % 5 = 0)
SELECT doc_id, en_hits, de_hits, fr_hits,
       CASE WHEN de_hits >= en_hits AND de_hits >= fr_hits THEN 'de'
            WHEN en_hits > de_hits AND en_hits >= fr_hits THEN 'en'
            ELSE 'fr' END AS pred_lang
FROM h"""

    o["quality_score"] = f"""
WITH t AS (SELECT doc_id, text, {_DOC_TOKS} AS ts FROM documents)
SELECT doc_id, length(text)::BIGINT AS n_chars, len(ts)::BIGINT AS n_tokens,
       round(list_sum(list_transform(ts, x -> length(x)))::DOUBLE
             / greatest(len(ts), 1), 6) AS avg_token_len,
       round(len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE
             / greatest(len(ts), 1), 6) AS stop_ratio
FROM t"""

    o["dedup_embedding_cosine"] = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000,
         list_transform(embedding, x -> CAST(x * 2 AS REAL))
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(a.embedding, b.embedding) AS cos
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, round(cos, 6) AS cos FROM pairs WHERE cos >= 0.99"""

    o["ann_cosine_topk"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id, list_cosine_similarity(embedding, (SELECT qv FROM q)) AS cos
  FROM embeddings)
SELECT row_number() OVER (ORDER BY cos DESC, vec_id)::BIGINT AS rank, vec_id
FROM sims ORDER BY cos DESC, vec_id LIMIT 10"""

    o["ann_lsh_bucketed"] = _ann_lsh_oracle(k=5)

    o["ann_ivf_topk"] = _ann_ivf_oracle(k=5, n_cells=8, nprobe=2)
    o["ann_ivf_trained"] = _ann_ivf_oracle(k=5, n_cells=8, nprobe=2,
                                           cents=_trained_cents())

    # round-7: multi-field grouping — one window cut per group field over
    # the same scored match set, UNION ALL tagged by field
    o["group_topn_multi"] = f"""{_BASE},
scored AS (
  SELECT tf.doc_id, {_SCORE} AS score
  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats st
  WHERE tf.term = 'spark'),
rl AS (
  SELECT 'lang' AS gfield, i.lang AS group_val, s.doc_id,
         row_number() OVER (PARTITION BY i.lang
                            ORDER BY s.score DESC, s.doc_id) AS rn,
         count(*) OVER (PARTITION BY i.lang) AS hits
  FROM scored s JOIN ids i USING (doc_id)),
rr AS (
  SELECT 'repo' AS gfield, i.repo AS group_val, s.doc_id,
         row_number() OVER (PARTITION BY i.repo
                            ORDER BY s.score DESC, s.doc_id) AS rn,
         count(*) OVER (PARTITION BY i.repo) AS hits
  FROM scored s JOIN ids i USING (doc_id))
SELECT gfield, group_val, rn::BIGINT AS rank, doc_id, hits::BIGINT AS hits
FROM rl WHERE rn <= 2
UNION ALL
SELECT gfield, group_val, rn::BIGINT AS rank, doc_id, hits::BIGINT AS hits
FROM rr WHERE rn <= 2"""

    # round-7: json.facet bucket stats — hits + nested integer aggs per
    # non-null lang bucket over the match set
    o["facet_stats"] = f"""{_BASE},
matches AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT i.lang, count(*)::BIGINT AS hits,
       sum(d.doc_len)::BIGINT AS sum_len, max(d.doc_len)::BIGINT AS max_len
FROM matches JOIN ids i USING (doc_id) JOIN dl d USING (doc_id)
WHERE i.lang IS NOT NULL
GROUP BY i.lang"""

    o["asof_join_events"] = """
WITH clicks AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'),
views AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT c.event_id, c.user_id, floor(epoch(v.ts))::BIGINT AS last_view_s
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts"""

    o["sessionize_events"] = """
WITH e AS (SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS t
           FROM events),
lagged AS (
  SELECT user_id, event_id, t,
         lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt
  FROM e),
sess AS (
  SELECT user_id, t,
         sum(CASE WHEN pt IS NULL OR t - pt > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY t, event_id) AS session_no
  FROM lagged)
SELECT user_id, session_no::BIGINT AS session_no, count(*)::BIGINT AS n_events,
       min(t) AS start_s, max(t) AS end_s
FROM sess GROUP BY user_id, session_no"""

    # round 2: every queries() entry has a DuckDB twin (zero rows-only
    # checks); BM25 *scores* are additionally verified to atol 1e-9 against
    # the pure-Python oracle in tests/ (the driver compare is rank-based).
    return o
