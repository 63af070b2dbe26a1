"""WAND effectiveness bench (round-4 verdict #4).

The reference fixture's 31-word vocabulary is tf/df-UNIFORM: every
block's max-tf ties, so block-max WAND never prunes in bench.py numbers
and was only ever correctness-tested.  This tool synthesizes the
distribution WAND exists for — a DETERMINISTIC zipf-vocabulary corpus
(FIXTURES.md style: seeded, reproducible byte-for-byte) — then measures,
per query shape:

* wall time WAND on vs WAND off (best of N reps, same warm index), and
* the phase-2 block skip rate via the kernel's accumulator telemetry
  (``Searcher.enable_wand_stats``).

Results are recorded in BENCH/BASELINE.md ("WAND effectiveness").

Usage:  python tools/bench_wand.py [n_docs] [vocab] [reps]
Env:    ZSOLR_WAND_CPUS (default 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zipf_corpus(spark, n_docs: int, vocab_size: int, seed: int = 42,
                n_clusters: int = 20):
    """Deterministic zipf corpus with REPO-CLUSTERED hot identifiers —
    the distribution block-max pruning exploits, and the one real
    source-code corpora actually have:

    * base text: term i drawn with p ∝ 1/(i+1)^1.1 (global df/tf zipf);
    * per repo r, a hot identifier ``h{r}`` repeats 15-60× in ~half the
      repo's docs (identifier vocabulary clusters by repo, and docIDs
      sort by (repo, path) so the cluster is CONTIGUOUS in docID space
      → contiguous posting blocks carry the high block_max_tf);
    * the same identifier leaks into other repos with tf 1-2 (df spans
      every shard, but those blocks' max_tf is tiny — exactly the
      blocks WAND's θ bound should skip).

    An unclustered zipf draw defeats block-max by construction: every
    128-doc block then contains a near-max tf for every head term, all
    block upper bounds tie, and nothing can prune (measured: skip rate
    0.0) — same reason the 31-word uniform fixture never pruned."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = 1.0 / ranks ** 1.1
    p /= p.sum()
    vocab = np.array([f"t{i:04d}" for i in range(vocab_size)])
    lens = rng.integers(30, 301, size=n_docs)
    per = n_docs // n_clusters
    rows = []
    for i in range(n_docs):
        toks = vocab[rng.choice(vocab_size, size=lens[i], p=p)].tolist()
        r = min(i // per, n_clusters - 1)
        if rng.random() < 0.5:
            toks += [f"h{r:02d}"] * int(rng.integers(15, 61))
        # broad low-tf leakage: ~8 foreign identifiers per doc with tf
        # 1-2, so each h-term's posting list spans MANY blocks whose
        # block_max_tf is tiny (df ≈ 0.4·N) while its high-tf mass
        # stays contiguous — without this the term has too few blocks
        # for pruning to be even possible
        for o in rng.choice(n_clusters, size=8, replace=False):
            if int(o) != r:
                toks += [f"h{int(o):02d}"] * int(rng.integers(1, 3))
        rows.append((f"r{r:02d}", f"d/{i:07d}.py", f"{i:040d}", "en",
                     " ".join(toks)))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
              " content string")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("ZSOLR_WAND_CPUS", "8"))

    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog
    from zsolr.search import Searcher
    from zsolr.session import get_spark

    spark = get_spark("zsolr-wand-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    root = tempfile.mkdtemp(prefix="zsolr-wand-")
    try:
        corpus_path = os.path.join(root, "corpus")
        zipf_corpus(spark, n_docs, vocab).write.parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        cat = ManifestParquetCatalog(root)
        IndexBuilder(cat, BuildConfig(n_buckets=max(16, cpus))).build(
            spark, corpus_path, corpus_df=corpus)
        s = Searcher(spark, cat)

        # skewed query shapes: clustered identifiers alone / OR'd with
        # each other and with zipf head terms (the classic WAND target:
        # one clause's best blocks dominate θ, the other's low-max_tf
        # blocks prune), plus an unclustered head-term control where
        # pruning CANNOT fire (uniform block UBs — expect skip ≈ 0)
        queries = ["h05", "h11", "h05 OR h11", "h05 OR t0100",
                   "h05 OR t0010", "h03 OR h07 OR h11",
                   "h05 AND t0001", "t0000"]
        out = []
        for q in queries:
            # warm both paths once (parquet footers, JVM)
            s.search(q, k=10, wand=False).collect()
            best_off = min(
                _t(lambda: s.search(q, k=10, wand=False).collect())
                for _ in range(reps))
            acc = s.enable_wand_stats()
            rows_on = None
            best_on = None
            for _ in range(reps):
                acc[0].value = 0
                acc[1].value = 0
                dt, rows_on = _t2(lambda: s.search(q, k=10).collect())
                best_on = dt if best_on is None else min(best_on, dt)
            s._wand_acc = None
            cand, dec = int(acc[0].value), int(acc[1].value)
            rows_off = s.search(q, k=10, wand=False).collect()
            assert [tuple(r) for r in rows_on] == \
                [tuple(r) for r in rows_off], f"WAND != exhaustive: {q}"
            out.append({
                "q": q, "wand_ms": round(best_on * 1000, 1),
                "exhaustive_ms": round(best_off * 1000, 1),
                "speedup": round(best_off / best_on, 2),
                "blocks_candidate": cand, "blocks_decoded": dec,
                "skip_rate": round(1 - dec / cand, 3) if cand else None,
            })
        # ---- dismax arm (round-7): same skewed shapes through
        # search_dismax over a two-scored-field index.  The dismax WAND
        # bounds are the SUM-based cross-term bounds (sum ≥ max+tie·rest),
        # i.e. looser than the exact combination — this measures how much
        # pruning survives.  qf path terms have no postings here (paths
        # are synthetic), so the measurement isolates the DisMax node +
        # per-field-norms machinery on the content field.
        dm_root = tempfile.mkdtemp(prefix="zsolr-wand-dm-")
        try:
            dm_cat = ManifestParquetCatalog(dm_root)
            IndexBuilder(dm_cat, BuildConfig(
                n_buckets=max(16, cpus),
                scored_fields=("content", "path"))).build(
                spark, corpus_path + "#dm", corpus_df=corpus)
            ds = Searcher(spark, dm_cat)
            qf = {"path": 1.0, "content": 1.0}
            dm_out = []
            for q in ["h05", "h05 OR t0010", "h05 AND t0001",
                      "h05 OR h11"]:
                ds.search_dismax(q, qf=qf, tie=0.2, k=10,
                                 wand=False).collect()
                acc = ds.enable_wand_stats()
                rows_on = None
                for _ in range(reps):
                    acc[0].value = 0
                    acc[1].value = 0
                    rows_on = ds.search_dismax(q, qf=qf, tie=0.2,
                                               k=10).collect()
                ds._wand_acc = None
                cand, dec = int(acc[0].value), int(acc[1].value)
                rows_off = ds.search_dismax(q, qf=qf, tie=0.2, k=10,
                                            wand=False).collect()
                assert [tuple(r) for r in rows_on] == \
                    [tuple(r) for r in rows_off], \
                    f"dismax WAND != exhaustive: {q}"
                dm_out.append({
                    "q": q, "blocks_candidate": cand,
                    "blocks_decoded": dec,
                    "skip_rate": round(1 - dec / cand, 3) if cand
                    else None})
        finally:
            shutil.rmtree(dm_root, ignore_errors=True)

        print(json.dumps({"n_docs": n_docs, "vocab": vocab, "cpus": cpus,
                          "queries": out, "dismax": dm_out}))
        print("\n| query | cand blocks | decoded | skip rate | WAND ms |"
              " exhaustive ms | speedup |")
        print("| --- | --- | --- | --- | --- | --- | --- |")
        for r in out:
            print(f"| `{r['q']}` | {r['blocks_candidate']} |"
                  f" {r['blocks_decoded']} | {r['skip_rate']} |"
                  f" {r['wand_ms']} | {r['exhaustive_ms']} |"
                  f" {r['speedup']}× |")
        print("\n| dismax query | cand blocks | decoded | skip rate |")
        print("| --- | --- | --- | --- |")
        for r in dm_out:
            print(f"| `{r['q']}` | {r['blocks_candidate']} |"
                  f" {r['blocks_decoded']} | {r['skip_rate']} |")
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


def _t(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def _t2(fn):
    t0 = time.time()
    r = fn()
    return time.time() - t0, r


if __name__ == "__main__":
    main()
