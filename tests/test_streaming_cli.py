"""Streaming incremental indexing + spark-submit --py-files packaging
(north_rule: 'run via spark-submit --py-files')."""

import json
import os
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

from zsolr.build import BuildConfig, IndexBuilder
from zsolr.catalog import ManifestParquetCatalog
from zsolr.search import Searcher
from zsolr.streaming import stream_index

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_streaming_incremental_index(tmp_path, spark, corpus_df):
    base = corpus_df.limit(80).cache()
    cat = ManifestParquetCatalog(str(tmp_path / "idx"))
    cfg = BuildConfig(n_buckets=8)
    IndexBuilder(cat, cfg).build(spark, "m", corpus_df=base)
    n0 = cat.read(spark, "docs").count()

    drop = str(tmp_path / "drop")
    # snapshot 1: base + 3 new docs (streamed corpus snapshots are cumulative
    # per incremental_update's diff semantics)
    extra = spark.createDataFrame(
        [(f"srcS", f"s/new_{i}.py", "e" * 40, "en",
          f"streamed doc {i} spark stream zzstreamterm") for i in range(3)],
        "repo string, path string, commit string, lang string, content string"
    ).withColumn("ts", F.to_timestamp(F.lit("2020-07-01 00:00:00")))
    base.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        f"{drop}/snap1")

    q = stream_index(spark, cat, f"{drop}/snap1",
                     str(tmp_path / "ckpt1"), cfg)
    q.awaitTermination(120)

    assert cat.read(spark, "docs").count() == n0 + 3
    s = Searcher(spark, cat)
    df, n = s.search("zzstreamterm", k=10, with_count=True)
    assert n == 3
    assert all(r["repo"] == "srcS" for r in df.collect())


def test_streaming_add_upserts_idempotent(tmp_path, spark, corpus_df):
    """Round-5 stream_add: micro-batches are PARTIAL Solr <add> deltas
    (absent docs untouched), and replaying the same deltas through a
    fresh checkpoint is a no-op (sha-equal upserts skip) — idempotent
    exactly-once on top of atomic catalog commits."""
    from zsolr.streaming import stream_add

    base = corpus_df.limit(60).cache()
    cat = ManifestParquetCatalog(str(tmp_path / "addidx"))
    cfg = BuildConfig(n_buckets=8)
    IndexBuilder(cat, cfg).build(spark, "m", corpus_df=base)
    n0 = cat.read(spark, "docs").count()

    drop = str(tmp_path / "drop-add")
    new = spark.createDataFrame(
        [("srcA", f"a/add_{i}.py", "f" * 40, "en",
          f"added doc {i} zzaddterm") for i in range(4)],
        "repo string, path string, commit string, lang string,"
        " content string")
    changed = base.limit(1).select(
        "repo", "path", "commit", "lang",
        F.concat(F.col("content"), F.lit(" zzchangedterm")).alias("content"))
    new.coalesce(1).write.mode("append").parquet(drop)
    changed.coalesce(1).write.mode("append").parquet(drop)

    q = stream_add(spark, cat, drop, str(tmp_path / "ckpt-a1"), cfg)
    q.awaitTermination(120)

    s = Searcher(spark, cat)
    assert s.search("zzaddterm", k=10, with_count=True)[1] == 4
    assert s.search("zzchangedterm", k=10, with_count=True)[1] == 1
    n1 = cat.read(spark, "docs").count()
    assert n1 == n0 + 5        # 4 new + the changed doc's new version
    assert s.search("[* TO *]", k=1, with_count=True)[1] == n0 + 4  # live
    # replay the SAME deltas via a fresh checkpoint: all sha-equal → no-op
    q2 = stream_add(spark, cat, drop, str(tmp_path / "ckpt-a2"), cfg)
    q2.awaitTermination(120)
    assert cat.read(spark, "docs").count() == n1
    s2 = Searcher(spark, cat)
    assert s2.search("zzaddterm", k=10, with_count=True)[1] == 4


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    """Package zsolr as a zip and run build+search through spark-submit."""
    zpath = tmp_path / "zsolr.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "zsolr")
        for fn in os.listdir(pkg):
            if fn.endswith(".py"):
                z.write(os.path.join(pkg, fn), f"zsolr/{fn}")
    idx = str(tmp_path / "idx")
    spark_submit = os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}

    def run(*cli_args):
        cmd = [spark_submit, "--master", "local[4]",
               "--py-files", str(zpath),
               os.path.join(REPO, "zsolr", "cli.py"), *cli_args]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                             env=env)
        assert out.returncode == 0, out.stderr[-2000:]
        return [json.loads(line) for line in out.stdout.splitlines()
                if line.startswith("{")]

    built = run("build", "--corpus-sf", "/root/testdata/sf0.001",
                "--index", idx, "--buckets", "4")
    assert built[-1]["n_docs"] == 500
    hits = run("search", "hash AND join", "--index", idx, "-k", "3")
    assert len(hits) == 3 and hits[0]["score"] > 0
    sugg = run("suggest", "s", "--index", idx, "-n", "3")
    assert len(sugg) == 3 and all(r["term"].startswith("s") for r in sugg)
    stats = run("stats", "spark", "--index", idx)
    assert stats[0]["n"] > 0 and stats[0]["min_v"] <= stats[0]["max_v"]
    grp = run("group", "spark", "--index", idx, "--field", "lang")
    assert {r["group_val"] for r in grp} <= {"en", "de", "fr", "es", "zh"}
    fr = run("facet", "spark", "--index", idx, "--field", "doc_len",
             "--range", "0:200:25")
    assert sum(r["hits"] for r in fr) > 0
    # round-3 subcommands through the same spark-submit packaging
    sc = run("spellcheck", "sparl", "--index", idx, "-n", "3")
    assert sc and all("term" in r and r["df"] > 0 for r in sc)
    mlt = run("mlt", str(hits[0]["doc_id"]), "--index", idx, "-k", "3")
    assert len(mlt) == 3 and all(r["doc_id"] != hits[0]["doc_id"]
                                 for r in mlt)
    ex = run("explain", "hash AND join", str(hits[0]["doc_id"]),
             "--index", idx)
    assert abs(sum(r["contribution"] for r in ex)
               - hits[0]["score"]) < 1e-9
    bt = run("batch", "spark", "hash AND join", "--index", idx, "-k", "2")
    assert len(bt) == 4 and {r["query"] for r in bt} == \
        {"spark", "hash AND join"}
    # round-4: the pysolr facade through spark-submit — Solr /select shape
    sel = run("select", "spark", "--index", idx, "--rows", "3",
              "--fq", "lang:en", "--fl", "repo,path",
              "--facet-field", "lang")
    resp = sel[-1]
    assert resp["responseHeader"]["status"] == 0
    assert resp["response"]["numFound"] > 0
    assert len(resp["response"]["docs"]) == 3
    assert all(set(d) == {"repo", "path"} for d in resp["response"]["docs"])
    assert set(resp["facet_counts"]["facet_fields"]["lang"]) == {"en"}
    # cursorMark protocol end-to-end: page 1 then page 2, no overlap
    p1 = run("select", "spark", "--index", idx, "--rows", "2",
             "--cursor-mark", "*")[-1]
    assert p1["nextCursorMark"] != "*"
    p2 = run("select", "spark", "--index", idx, "--rows", "2",
             "--cursor-mark", p1["nextCursorMark"])[-1]
    ids1 = {d["doc_id"] for d in p1["response"]["docs"]}
    ids2 = {d["doc_id"] for d in p2["response"]["docs"]}
    assert len(ids1) == 2 and len(ids2) == 2 and not ids1 & ids2


def test_streaming_windowed_agg(tmp_path, spark, sf_dir):
    """Event-time window + watermark over the events fixture, checked
    against the equivalent batch aggregation."""
    from pyspark.sql import functions as F
    from zsolr.streaming import windowed_event_counts

    src = str(tmp_path / "events_in")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    # event-time-ordered files (range partition on ts → lexicographic file
    # order == time order): with update mode, no row is ever later than the
    # watermark, so the last update per key equals the batch aggregate
    batch.repartitionByRange(8, "ts").sortWithinPartitions("ts") \
        .write.mode("overwrite").parquet(src)

    q = windowed_event_counts(spark, src, str(tmp_path / "ck"))
    q.awaitTermination(120)
    got = {(r["window"]["start"], r["event_type"]): (r["n"], round(r["total"], 6))
           for r in spark.sql("SELECT * FROM win_counts").collect()}
    exp = {(r["window"]["start"], r["event_type"]): (r["n"], round(r["total"], 6))
           for r in batch.groupBy(F.window("ts", "1 hour"), "event_type")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
           .collect()}
    assert got == exp and len(got) > 10


def test_stateful_sessionization(tmp_path, spark, sf_dir):
    """applyInPandasWithState sessionizer: emitted sessions equal the
    batch sessionization — every data-closed session after the first
    drain (event-time timeouts may legitimately flush more), and FULL
    equality (including each user's final open session) after the
    sentinel flush (round-2 verdict #8), with no session emitted twice."""
    from zsolr.ops import sessionize_events
    from zsolr.streaming import flush_open_sessions, sessionize_stream

    src = str(tmp_path / "sess_in")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch.repartitionByRange(8, "ts").sortWithinPartitions("ts") \
        .write.mode("overwrite").parquet(src)

    out = str(tmp_path / "sess_out")
    q = sessionize_stream(spark, src, str(tmp_path / "sess_ck"), gap_s=1800,
                          out_dir=out)
    q.awaitTermination(180)
    rows1 = spark.read.parquet(out).collect()
    got1 = {(r["user_id"], r["session_no"]): (r["n_events"], r["start_s"],
                                              r["end_s"])
            for r in rows1}
    assert len(rows1) == len(got1)              # no duplicate emissions
    exp_all = {(r["user_id"], r["session_no"]): (r["n_events"], r["start_s"],
                                                 r["end_s"])
               for r in sessionize_events(batch, gap_s=1800).collect()}
    # drop each user's final (open) session from the expectation
    last_by_user = {}
    for (u, sn) in exp_all:
        last_by_user[u] = max(last_by_user.get(u, 0), sn)
    exp_closed = {k: v for k, v in exp_all.items()
                  if k[1] != last_by_user[k[0]]}
    # every data-closed session emitted with correct stats; timeouts may
    # add (correctly) flushed sessions on top, never wrong ones
    assert set(exp_closed) <= set(got1) <= set(exp_all)
    assert all(exp_all[k] == v for k, v in got1.items())

    # sentinel flush: watermark passes every open session → stream drains
    # to FULL batch equality, each remaining session emitted exactly once
    q2 = flush_open_sessions(spark, src, str(tmp_path / "sess_ck"),
                             gap_s=1800, out_dir=out)
    q2.awaitTermination(180)
    rows2 = spark.read.parquet(out).collect()
    combined = {(r["user_id"], r["session_no"]): (r["n_events"], r["start_s"],
                                                  r["end_s"])
                for r in rows2}
    assert len(rows2) == len(combined)          # each session exactly once
    assert combined == exp_all
    assert len(exp_closed) > 20  # the fixture actually exercises sessions

    # round-4 advice: the flush sentinel must NOT pollute the caller's
    # events dir — batch consumers over src see exactly the input events
    after = spark.read.parquet(src)
    assert after.count() == batch.count()
    assert after.agg(F.min("user_id")).collect()[0][0] >= 0
    # and a SECOND flush re-derives the same sentinel ts (no stacking)
    # and emits nothing new
    q3 = flush_open_sessions(spark, src, str(tmp_path / "sess_ck"),
                             gap_s=1800, out_dir=out)
    q3.awaitTermination(180)
    rows3 = spark.read.parquet(out).collect()
    assert len(rows3) == len(rows2)
