"""Training-data ops vs plain-Python references (zsolr.ops; these are also
DuckDB-oracle-checked by the driver — here we verify semantics locally)."""

import hashlib
import math
import re

import numpy as np
import pytest

from zsolr import ops


@pytest.fixture(scope="module")
def docs_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_py(docs_df):
    return [r.asDict() for r in docs_df.collect()]


def _tokens(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def test_dedup_exact(spark, docs_df, docs_py):
    got = {r["text_sha"]: (r["keeper"], r["n_copies"])
           for r in ops.dedup_exact(docs_df).collect()}
    exp = {}
    for d in docs_py:
        h = hashlib.sha256(d["text"].encode()).hexdigest()
        k, n = exp.get(h, (d["doc_id"], 0))
        exp[h] = (min(k, d["doc_id"]), n + 1)
    assert got == exp


def test_minhash_lsh_pairs_symmetric_and_plausible(spark, docs_df):
    sub = docs_df.filter("doc_id % 10 = 0")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in ops.minhash_lsh_pairs(sub).collect()}
    assert all(a < b for a, b in pairs)
    docs = {d["doc_id"]: set(_tokens(d["text"]))
            for d in [r.asDict() for r in sub.collect()]}
    # precision side (loose — LSH admits false positives by design):
    # candidates still need real overlap
    for a, b in list(pairs)[:100]:
        inter = docs[a] & docs[b]
        union = docs[a] | docs[b]
        assert len(inter) / len(union) > 0.05, (a, b)
    # recall side: near-identical token sets MUST be candidates
    ids = sorted(docs)
    hits = misses = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(docs[a] & docs[b]) / len(docs[a] | docs[b])
            if j >= 0.95:
                if (a, b) in pairs:
                    hits += 1
                else:
                    misses += 1
    assert misses == 0 or hits / (hits + misses) > 0.9


def test_ngram_jaccard_matches_python(spark, docs_df, docs_py):
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ops.ngram_jaccard_adjacent(docs_df).collect()}
    by_id = {d["doc_id"]: set(_tokens(d["text"])) for d in docs_py}
    for (a, b), j in list(got.items())[:100]:
        exp = len(by_id[a] & by_id[b]) / len(by_id[a] | by_id[b])
        assert abs(j - round(exp, 6)) < 1e-9


def test_simhash_matches_python(spark, docs_df, docs_py):
    sub = docs_df.filter("doc_id % 20 = 0")
    got = {r["doc_id"]: r["simhash"] for r in ops.simhash32(sub).collect()}
    for d in docs_py:
        if d["doc_id"] % 20:
            continue
        terms = set(_tokens(d["text"]))
        sums = [0] * 32
        for t in terms:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for j in range(32):
                sums[j] += ((h >> j) & 1) * 2 - 1
        exp = sum(1 << j for j in range(32) if sums[j] > 0)
        assert got[d["doc_id"]] == exp


def test_cosine_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[ids.tolist().index(0)]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:10]
    exp = ids[order].tolist()
    got = [r["vec_id"] for r in ops.cosine_topk(emb, q.tolist(), 10)
           .orderBy("rank").collect()]
    assert got == exp


def test_lsh_bucket_topk_subset_of_bruteforce_bucket(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in
         emb.filter("vec_id = 0").collect()[0]["embedding"]]
    out = ops.lsh_bucket_topk(emb, q, k=5).collect()
    assert out, "query's own bucket can never be empty"
    assert out[0]["vec_id"] == 0  # self-similarity = 1.0 ranks first
    assert 0 < out[0]["bucket_size"] <= emb.count()


def test_lsh_multiprobe_recall_on_planted_clusters(spark):
    """Multi-probe (Hamming-1) LSH recall ≥ 0.9 where the geometry supports
    it: 10 planted near-duplicates (cos ≈ 0.995) of the query among 500
    random distractors.  (The sf fixtures' embeddings are uniform-random —
    cosine top-10 ≈ 0.3 — where no sign-LSH can achieve high recall with
    real pruning; the planted fixture tests the mechanism honestly.)"""
    rng = np.random.default_rng(11)
    dim = 64
    q = rng.standard_normal(dim)
    q /= np.linalg.norm(q)
    near = [q + 0.012 * rng.standard_normal(dim) for _ in range(10)]
    far = [rng.standard_normal(dim) for _ in range(500)]
    vecs = near + far
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = [r["vec_id"] for r in
             ops.cosine_topk(emb, q.tolist(), 10).collect()]
    assert set(exact) == set(range(10))  # sanity: planted dups ARE top-10
    out = ops.lsh_bucket_topk(emb, q.tolist(), k=10, n_planes=8,
                              probe_hamming=1).collect()
    got = {r["vec_id"] for r in out}
    recall = len(got & set(exact)) / 10
    assert recall >= 0.9, recall
    assert out[0]["bucket_size"] < 300  # pruning is real, not a full scan


def test_quality_and_langid(spark, docs_df, docs_py):
    q = {r["doc_id"]: r for r in ops.quality_score(docs_df).collect()}
    lid = {r["doc_id"]: r["en_ratio"]
           for r in ops.lang_id_heuristic(docs_df).collect()}
    for d in docs_py[:100]:
        toks = _tokens(d["text"])
        row = q[d["doc_id"]]
        assert row["n_chars"] == len(d["text"])
        assert row["n_tokens"] == len(toks)
        stops = sum(1 for t in toks if t in ("the", "a"))
        assert abs(row["stop_ratio"] - round(stops / max(1, len(toks)), 6)) < 1e-9
        assert abs(lid[d["doc_id"]] - round(stops / max(1, len(toks)), 6)) < 1e-9


def test_token_count_bpe_matches_python(spark, docs_df, docs_py):
    """Python-regex oracle for the BPE-ish token counter (its driver row
    retired to this ring round-6 for the 50-row cap)."""
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in ops.token_count_bpe(docs_df).collect()}
    for d in docs_py:
        exp = len(re.findall(r"[a-z]{1,4}|[0-9]{1,3}", d["text"].lower()))
        assert got[d["doc_id"]] == exp, d["doc_id"]


def test_doc_fingerprint_deterministic_and_order_sensitive(spark, docs_df):
    sub = docs_df.filter("doc_id % 20 = 0")
    a = {r["doc_id"]: r["fingerprint"]
         for r in ops.doc_fingerprint(sub).collect()}
    b = {r["doc_id"]: r["fingerprint"]
         for r in ops.doc_fingerprint(sub).collect()}
    assert a == b and len(set(a.values())) > 1


def test_doc_fingerprint_matches_python_oracle(spark, docs_df):
    """The codegen Horner fold equals an independent pure-Python rolling
    hash (md5 28-bit token hashes, mod 2^31-1)."""
    import hashlib
    import re

    sub = docs_df.filter("doc_id % 20 = 0")
    got = {r["doc_id"]: r["fingerprint"]
           for r in ops.doc_fingerprint(sub).collect()}
    for d in [r.asDict() for r in sub.collect()]:
        acc = 0
        for t in re.findall(r"[a-z0-9]+", d["text"].lower()):
            h = int(hashlib.md5(t.encode()).hexdigest()[:7], 16)
            acc = (acc * ops.FP_BASE + h) % ops.FP_MOD
        assert got[d["doc_id"]] == acc, d["doc_id"]


def test_media_features_stub(spark, docs_df):
    out = {r["doc_id"]: r for r in ops.media_features(docs_df).collect()}
    for d in [r.asDict() for r in docs_df.limit(20).collect()]:
        row = out[d["doc_id"]]
        n = len(d["text"].encode())
        assert (row["n_bytes"], row["width"], row["height"]) == \
            (n, n % 512, (n // 7) % 512)
    with pytest.raises(NotImplementedError):
        ops.media_decode_stub(b"\x89PNG")


def test_dedup_embedding_cosine_planted(spark):
    """Banded-LSH candidate pairs + exact cosine verify: every reported
    pair really is >= tau (precision, numpy-checked) and >=90% of planted
    noisy near-dups are recovered (recall)."""
    rng = np.random.default_rng(17)
    dim = 64
    rows = []
    for i in range(30):
        v = rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i,
                     [float(x) for x in v + 0.012 * rng.standard_normal(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ops.dedup_embedding_cosine(emb, tau=0.98).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in out}
    m = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}

    def cosine(a, b):
        return m[a] @ m[b] / (np.linalg.norm(m[a]) * np.linalg.norm(m[b]))

    for a, b in pairs:
        assert cosine(a, b) >= 0.98 - 1e-9, (a, b)
    planted = {(i, 1000 + i) for i in range(30) if cosine(i, 1000 + i) >= 0.98}
    assert planted, "fixture sanity: planted dups exist"
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.9, recall


def test_dedup_embedding_bucket_cap_bounds_pairs(spark):
    """Round-2 verdict #4: the max_bucket skew guard.  A planted
    degenerate bucket (many identical-direction vectors collide in EVERY
    band) must be dropped when it exceeds the cap — candidate pairs are
    bounded — while an uncapped run would report the full quadratic pair
    set.  Auto n_planes scales with input size."""
    rng = np.random.default_rng(23)
    dim = 64
    base = rng.standard_normal(dim)
    rows = [(i, [float(x) for x in base * (1.0 + 0.5 * i)])
            for i in range(40)]                  # 40 colinear vectors
    rows += [(100 + i, [float(x) for x in rng.standard_normal(dim)])
             for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = ops.dedup_embedding_cosine(emb, tau=0.99, n_planes=8,
                                      max_bucket=None).count()
    assert full == 40 * 39 // 2                  # quadratic blow-up, uncapped
    capped = ops.dedup_embedding_cosine(emb, tau=0.99, n_planes=8,
                                        max_bucket=16).count()
    assert capped == 0                            # hot bucket dropped
    # cap above the bucket size: nothing dropped
    kept = ops.dedup_embedding_cosine(emb, tau=0.99, n_planes=8,
                                      max_bucket=64).count()
    assert kept == full
    # auto planes: ⌈log₂50⌉+2 = 8 here; still recall 1.0 for exact dups
    auto = ops.dedup_embedding_cosine(emb, tau=0.99, dim=dim,
                                      max_bucket=64).count()
    assert auto == full


def test_ann_ivf_matches_bruteforce_on_probed_cells(spark, sf_dir):
    """IVF: Spark cell assignment == numpy argmax assignment; top-k inside
    the probed cells == numpy brute force over the same candidate set;
    pruning is real (n_cand < N)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[ids.tolist().index(0)]
    cents = ops.ivf_centroids(8, 64)
    cells = np.argmax(mat @ cents.T, axis=1)
    probes = np.argsort(-(cents @ q))[:2]
    cand_mask = np.isin(cells, probes)
    cm, ci = mat[cand_mask], ids[cand_mask]
    cos = (cm @ q) / (np.linalg.norm(cm, axis=1) * np.linalg.norm(q))
    exp = ci[np.lexsort((ci, -cos))[:5]].tolist()
    out = ops.ann_ivf_topk(emb, q.tolist(), k=5, n_cells=8, nprobe=2) \
        .orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == exp
    assert out[0]["n_cand"] == int(cand_mask.sum()) < len(ids)


def test_ann_ivf_recall_on_planted_clusters(spark):
    """Planted near-dups of the query land in the query's cell → IVF with
    nprobe=2 recovers ≥0.9 of the true top-10."""
    rng = np.random.default_rng(23)
    dim = 64
    qv = rng.standard_normal(dim)
    qv /= np.linalg.norm(qv)
    rows = [(i, [float(x) for x in qv + 0.012 * rng.standard_normal(dim)])
            for i in range(10)]
    rows += [(100 + i, [float(x) for x in rng.standard_normal(dim)])
             for i in range(500)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ops.ann_ivf_topk(emb, qv.tolist(), k=10, n_cells=8, nprobe=2) \
        .collect()
    got = {r["vec_id"] for r in out}
    assert len(got & set(range(10))) / 10 >= 0.9
    assert out[0]["n_cand"] < 350  # pruning, not a full scan


def test_lang_id_ngram_matches_python(spark, docs_df, docs_py):
    got = {r["doc_id"]: (r["en_hits"], r["de_hits"], r["fr_hits"],
                         r["pred_lang"])
           for r in ops.lang_id_ngram(
               docs_df.filter("doc_id % 5 = 0")).collect()}
    for d in docs_py:
        if d["doc_id"] % 5:
            continue
        t = d["text"].lower()
        tris = [t[i:i + 3] for i in range(len(t) - 2)]
        hits = {lang: sum(1 for x in tris if x in set(g))
                for lang, g in ops.LANG_TRIGRAMS.items()}
        # argmax, ties → lexicographically first language
        pred = sorted(hits, key=lambda s: (-hits[s], s))[0]
        assert got[d["doc_id"]] == (hits["en"], hits["de"], hits["fr"],
                                    pred), d["doc_id"]


def test_minhash_max_bucket_guard(spark, docs_df):
    """The skew guard drops degenerate buckets: capped output is a subset
    of the uncapped pairs and strictly smaller on this tiny-vocab fixture
    (where buckets are pathologically hot)."""
    sub = docs_df.filter("doc_id % 10 = 0")
    full = {(r["doc_a"], r["doc_b"])
            for r in ops.minhash_lsh_pairs(sub, max_bucket=None).collect()}
    capped = {(r["doc_a"], r["doc_b"])
              for r in ops.minhash_lsh_pairs(sub, max_bucket=5).collect()}
    assert capped <= full
    assert len(capped) < len(full)


def test_minhash_guard_default_on(spark):
    """Round-3 verdict #3: the skew guard must be active through the
    DEFAULT path (max_bucket=4096, matching dedup_embedding_cosine).  A
    planted degenerate bucket of 5000 identical docs — one signature,
    every band — yields ZERO candidate pairs by default (instead of the
    12.5M-pair quadratic blow-up), while distinct near-dup docs outside
    the hot bucket still pair up."""
    import inspect

    assert inspect.signature(
        ops.minhash_lsh_pairs).parameters["max_bucket"].default == 4096
    rows = [(i, "the same exact tiny document text") for i in range(5000)]
    rows += [(10000, "alpha beta gamma delta epsilon zeta"),
             (10001, "alpha beta gamma delta epsilon zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in ops.minhash_lsh_pairs(docs).collect()}
    assert pairs == {(10000, 10001)}


def _union_find(pairs):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dedup_components_vs_union_find(spark):
    """Connected-components clustering == a Python union-find oracle on a
    planted graph mixing cliques, a LONG PATH (exercises multi-round
    propagation), bridges, and isolated pairs."""
    pairs = ([(0, 1), (1, 2), (0, 2)]                 # clique
             + [(i, i + 1) for i in range(10, 22)]    # 13-node path
             + [(30, 31), (31, 40), (40, 41)]         # bridged pairs
             + [(100, 200)])                          # isolated pair
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["canonical"]
           for r in ops.dedup_components(df).collect()}
    assert got == _union_find(pairs)
    assert got[21] == 10 and got[41] == 30 and got[200] == 100


def test_dedup_components_log_diameter_convergence(spark):
    """Round-4 advice: pointer doubling makes convergence O(log d) — a
    48-node path (diameter 47, far past pure min-propagation's reach in
    8 rounds) converges with max_iter=8, and a genuinely-too-low
    max_iter raises instead of silently mislabeling."""
    pairs = [(i, i + 1) for i in range(100, 147)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["canonical"]
           for r in ops.dedup_components(df, max_iter=8).collect()}
    assert got == {i: 100 for i in range(100, 148)}
    with pytest.raises(RuntimeError, match="did not converge"):
        ops.dedup_components(df, max_iter=2).collect()


def test_dedup_components_on_minhash_pairs(spark, docs_df):
    """End-to-end pipeline: MinHash-LSH candidate pairs → components;
    canonical labels equal union-find over the same pairs, and every
    cluster's keeper is its min doc_id."""
    sub = docs_df.filter("doc_id % 10 = 0")
    pairs_df = ops.minhash_lsh_pairs(sub)
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert pairs, "fixture sanity: near-dups exist"
    got = {r["doc_id"]: r["canonical"]
           for r in ops.dedup_components(pairs_df).collect()}
    assert got == _union_find(pairs)
    assert all(got[c] == c for c in set(got.values()))  # keepers canonical


def test_dedup_keep_drops_only_non_canonical(spark, docs_df):
    """docs → pairs → components → keep: survivors are exactly the
    union-find keepers plus every unpaired doc."""
    sub = docs_df.filter("doc_id % 10 = 0")
    pairs_df = ops.minhash_lsh_pairs(sub)
    uf = _union_find([(r["doc_a"], r["doc_b"])
                      for r in pairs_df.collect()])
    all_ids = {r["doc_id"] for r in sub.select("doc_id").collect()}
    exp = (all_ids - set(uf)) | {x for x, root in uf.items() if x == root}
    kept = {r["doc_id"] for r in
            ops.dedup_keep(sub, pairs_df).select("doc_id").collect()}
    assert kept == exp
    assert len(kept) < len(all_ids)   # fixture actually deduplicates


def test_dedup_pipeline_on_embedding_pairs(spark, sf_dir):
    """End-to-end dedup over the EMBEDDING modality (round-5 breadth):
    cosine near-dup pairs → connected components → keep — the same
    pipeline shape as the MinHash path, over dedup_embedding_cosine's
    candidate pairs on the scaled-duplicate-augmented fixture."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    dup = emb.select((F.col("vec_id") + 10000).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: (x * F.lit(2.0)).cast("float"))
                     .alias("embedding"))
    aug = emb.unionByName(dup)
    pairs = (ops.dedup_embedding_cosine(aug, tau=0.999999)
             .select(F.col("vec_a").alias("doc_a"),
                     F.col("vec_b").alias("doc_b")))
    plist = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert plist, "scaled copies must collide at tau~1"
    uf = _union_find(plist)
    kept = {r["vec_id"] for r in
            ops.dedup_keep(aug, pairs, id_col="vec_id")
            .select("vec_id").collect()}
    all_ids = {r["vec_id"] for r in aug.select("vec_id").collect()}
    exp = (all_ids - set(uf)) | {x for x, root in uf.items() if x == root}
    assert kept == exp
    # every (v, v+10000) scaled pair keeps only the original
    for a, b in plist:
        if b == a + 10000:
            assert a in kept and b not in kept


def test_minhash_family_cross_engine_property(spark):
    """Hypothesis property: the universal-hash MinHash family computes
    IDENTICAL values in all three engines that must agree — the Spark
    codegen expression (_mh_k over _hash60), the DuckDB oracle formula
    string, and a pure-Python reference — on arbitrary terms.  This is
    the single most fragile cross-engine contract in the dedup oracle."""
    import hashlib

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    con = duckdb.connect()

    def py_ref(term: str, k: int) -> int:
        base = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
        return (ops._MH_A[k] * (base & ops._MH_MASK)
                + ops._MH_B[k] * (base >> 28) + ops._MH_C[k]) % ops._MH_P

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.text(alphabet=st.characters(
        min_codepoint=33, max_codepoint=0x2FF), min_size=1, max_size=24),
        min_size=1, max_size=8, unique=True),
        st.integers(min_value=0, max_value=7))
    def check(terms, k):
        exp = {t: py_ref(t, k) for t in terms}
        sdf = spark.createDataFrame([(t,) for t in terms], "term string")
        got_spark = {r["term"]: r["h"] for r in sdf.select(
            "term",
            ops._mh_k(ops._hash60(F.col("term")), k).alias("h")).collect()}
        assert got_spark == exp
        ph = (f"({ops._MH_A[k]} * (base & {ops._MH_MASK}) "
              f"+ {ops._MH_B[k]} * (base >> 28) + {ops._MH_C[k]})"
              f" % {ops._MH_P}")
        got_duck = dict(con.execute(
            "SELECT term, " + ph + " FROM (SELECT term,"
            " ('0x' || substr(md5(term), 1, 15))::BIGINT AS base"
            " FROM (SELECT unnest(?) AS term))", [terms]).fetchall())
        assert got_duck == exp

    check()


def test_trained_cents_oracle_twin_identical(spark, sf_dir, monkeypatch):
    """The driver oracle's pyarrow-based offline trainer must reproduce
    ops.train_ivf_centroids BIT-identically (same id-ordered sample, same
    shared numpy Lloyd core) — the inlined codebook literals in the
    ann_ivf_trained DuckDB twin depend on it."""
    monkeypatch.setenv("ZSOLR_ORACLE_SF_DIR", sf_dir)
    import __spark_entry__ as entrymod

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = ops.train_ivf_centroids(emb, n_cells=8, iters=5, seed=7)
    b = entrymod._trained_cents(n_cells=8, iters=5, seed=7)
    assert np.array_equal(a, b)


def test_trained_ivf_improves_recall(spark, sf_dir):
    """k-means-trained IVF codebook (round-2 verdict #10): training is
    deterministic, drops into the unchanged assignment/probe machinery,
    and recall@10 vs brute force on the fixture is at least the seeded-
    random codebook's (strictly better on average cell balance)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in
          emb.filter("vec_id = 0").collect()[0]["embedding"]]
    c1 = ops.train_ivf_centroids(emb, n_cells=8, iters=5, seed=7)
    c2 = ops.train_ivf_centroids(emb, n_cells=8, iters=5, seed=7)
    assert np.array_equal(c1, c2)                 # deterministic

    exact = [r["vec_id"]
             for r in ops.cosine_topk(emb, qv, k=10).collect()]

    def recall(cents):
        got = [r["vec_id"] for r in
               ops.ann_ivf_topk(emb, qv, k=10, nprobe=2,
                                centroids=cents).collect()]
        return len(set(got) & set(exact)) / len(exact)

    seeded = recall(ops.ivf_centroids(8, len(qv), 7))
    trained = recall(c1)
    assert trained >= seeded, (trained, seeded)
    assert trained >= 0.5                          # sane absolute floor


def test_sessionize_native_equals_numbered(spark, sf_dir):
    """The built-in F.session_window twin produces the same session SET
    (user, start, end, n) as the numbered lag/running-sum implementation
    on the events fixture (which has no exact-gap boundary pairs — the
    one documented semantic difference)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    num = {(r["user_id"], r["start_s"], r["end_s"], r["n_events"])
           for r in ops.sessionize_events(e, gap_s=1800).collect()}
    nat = {(r["user_id"], r["start_s"], r["end_s"], r["n_events"])
           for r in ops.sessionize_native(e, gap_s=1800).collect()}
    assert num == nat and len(num) > 50
