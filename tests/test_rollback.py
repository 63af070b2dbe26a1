"""Snapshot rollback (I23): single-table pointer rollback + history, and
rollback_last_op — the op-stamped multi-table undo of the most recent
lifecycle operation, atomic via the same intent-file protocol as the
forward transaction."""

import json
import os

import pytest

from zsolr.build import BuildConfig, IndexBuilder
from zsolr.catalog import CommitConflict, ManifestParquetCatalog
from zsolr.connection import SolrConnection
from zsolr.lifecycle import (atomic_update, delete_by_ids, incremental_add,
                             rollback_last_op)
from zsolr.search import Searcher


@pytest.fixture()
def small_corpus(spark):
    rows = [
        ("r0", "a.py", "c0", "en", "spark join window"),
        ("r0", "b.py", "c1", "en", "spark hash batch"),
        ("r1", "c.js", "c2", "de", "stream window spark"),
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
              " content string")


def _fresh(tmp_path, spark, corpus, name):
    cat = ManifestParquetCatalog(str(tmp_path / name))
    IndexBuilder(cat, BuildConfig(n_buckets=4)).build(
        spark, name, corpus_df=corpus)
    return cat


def _state(spark, cat):
    s = Searcher(spark, cat)
    hits = sorted(r["doc_id"] for r in s.search("spark", k=100).collect())
    return s.n_docs_total, hits


def test_single_table_rollback_and_history(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "h")
    s0 = cat.current_snapshot("docs")["snapshot_id"]
    cat.write(cat.read(spark, "docs").limit(1), "docs", mode="append")
    assert cat.current_snapshot("docs")["snapshot_id"] != s0
    hist = cat.history("docs")
    assert hist[0]["parent"] == s0 and hist[1]["snapshot_id"] == s0
    back = cat.rollback("docs", 1)
    assert back == s0
    assert cat.current_snapshot("docs")["snapshot_id"] == s0
    with pytest.raises(ValueError, match="steps"):
        cat.rollback("docs", 0)


def test_rollback_undoes_delete(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "d")
    before = _state(spark, cat)
    delete_by_ids(spark, cat, [0, 1])
    n, hits = _state(spark, cat)
    assert n == 1 and len(hits) < len(before[1])
    res = rollback_last_op(spark, cat)
    assert res["op"] == "delete"
    assert set(res["tables"]) == {"tombstones", "term_stats",
                                  "index_stats"}
    assert _state(spark, cat) == before


def test_rollback_undoes_add(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "a")
    before = _state(spark, cat)
    delta = spark.createDataFrame(
        [("r2", "d.py", "c9", "en", "spark vector")],
        "repo string, path string, commit string, lang string,"
        " content string")
    incremental_add(spark, cat, delta)
    assert _state(spark, cat)[0] == before[0] + 1
    res = rollback_last_op(spark, cat)
    assert res["op"] == "add"
    assert {"tfs", "docs", "postings"} <= set(res["tables"])
    assert _state(spark, cat) == before
    assert not Searcher(spark, cat).search("vector", k=5).collect()


def test_rollback_undoes_atomic_update(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "u")
    atomic_update(spark, cat,
                  [{"repo": "r0", "path": "a.py", "lang": {"set": "de"}}],
                  corpus_df=small_corpus)
    s = Searcher(spark, cat)
    assert {r["path"] for r in s.search("spark AND lang:de",
                                        k=10).collect()} \
        == {"a.py", "c.js"}
    res = rollback_last_op(spark, cat)
    assert res["op"] == "atomic_update"
    s = Searcher(spark, cat)
    assert {r["path"] for r in s.search("spark AND lang:de",
                                        k=10).collect()} == {"c.js"}


def test_rollback_stack_walks_back(tmp_path, spark, small_corpus):
    """Repeated rollback = an undo stack over committed ops."""
    cat = _fresh(tmp_path, spark, small_corpus, "s")
    s0 = _state(spark, cat)
    delete_by_ids(spark, cat, [0])
    s1 = _state(spark, cat)
    delete_by_ids(spark, cat, [1])
    assert _state(spark, cat)[0] == 1
    rollback_last_op(spark, cat)
    assert _state(spark, cat) == s1
    rollback_last_op(spark, cat)
    assert _state(spark, cat) == s0
    with pytest.raises(ValueError, match="nothing to roll back"):
        rollback_last_op(spark, cat)


def test_facade_rollback(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "f")
    conn = SolrConnection(spark, cat, corpus_df=small_corpus)
    n0 = conn.search("spark", rows=0).hits
    conn.delete(q="spark AND lang:de")
    assert conn.search("spark", rows=0).hits < n0
    res = conn.rollback()
    assert res["op"] == "delete"
    assert conn.search("spark", rows=0).hits == n0


def test_crashed_rollback_rolls_forward(tmp_path, spark, small_corpus):
    """A rollback that crashed after its intent file published must
    complete (to the fully rolled-back state) at the next catalog
    entry — same recovery rule as the forward transaction."""
    cat = _fresh(tmp_path, spark, small_corpus, "c")
    before = _state(spark, cat)
    delete_by_ids(spark, cat, [0])
    # simulate: build the rollback targets by hand, write the intent,
    # flip only ONE of the three tables, then "crash"
    cur = {t: cat.current_snapshot(t)
           for t in ("tombstones", "term_stats", "index_stats")}
    txn_dir = os.path.join(cat.root, "_TXN")
    os.makedirs(txn_dir, exist_ok=True)
    intent = {"tables": {t: {"parent": s["snapshot_id"],
                             "snapshot": s["parent"]}
                         for t, s in cur.items()}}
    with open(os.path.join(txn_dir, "9999999999999-dead.json"), "w") as f:
        json.dump(intent, f)
    # partial application before the "crash": one table already flipped
    # (term_stats has a build-time parent; tombstones' rollback target is
    # pointer REMOVAL — that leg must complete via recovery)
    cat._flip_pointer("term_stats", cur["term_stats"]["parent"])
    # any catalog entry point runs recovery → remaining flips complete
    assert _state(spark, cat) == before
    for t, s in cur.items():
        now = cat.current_snapshot(t)
        if s["parent"] is None:     # created-by-op → pointer removed
            assert now is None and not cat.exists(t)
        else:
            assert now["snapshot_id"] == s["parent"]


def test_flip_multi_cas_conflict(tmp_path, spark, small_corpus):
    cat = _fresh(tmp_path, spark, small_corpus, "x")
    delete_by_ids(spark, cat, [0])
    s = cat.current_snapshot("tombstones")
    # a concurrent writer advances tombstones between read and flip
    cat.write(cat.read(spark, "tombstones"), "tombstones", mode="append")
    with pytest.raises(CommitConflict):
        cat.flip_multi({"tombstones": (s["snapshot_id"], s["parent"])})
