"""Corpus source + document conversion (SURVEY.md §2.1 I1, I3).

The engine's mandated input is an Iceberg-shaped table of source-code
repositories with columns ``(repo, path, commit, lang, content)``
(BASELINE.json input_hint).  In the sandbox we synthesize it
deterministically from the driver fixture ``documents.parquet`` per
FIXTURES.md §1 — no RNG beyond the fixture's own seed; every column is a
pure function of the fixture row, so the corpus is identical across runs
and parallelism levels.

Conversion (zeit.solr's ``ISolrConverter.convert`` analogue — content object
→ typed field bag) is pure Catalyst: projection + ``sha2(content, 256)``;
the sha256 column carries the end-to-end per-row invariant
(BASELINE.json input_hint: "content sha256 equality").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# lang → source-file extension, FIXTURES.md §1
LANG_EXT = {"en": "py", "de": "java", "fr": "go", "es": "rs", "zh": "c"}

# commit timestamp derivation (FIXTURES.md §1): a pseudo-uniform instant
# inside calendar year 2020, pure function of the fixture doc_id —
# TS_EPOCH0 = 2020-01-01T00:00:00Z, the multiplier spreads consecutive ids
# across the year.  Stored as a real TIMESTAMP column (instant semantics);
# oracle comparisons use epoch seconds, which are timezone-independent.
TS_EPOCH0 = 1577836800
TS_MULT = 8761
TS_YEAR_S = 31536000

# DuckDB-oracle twin of the corpus derivation (shared by __spark_entry__):
CORPUS_ORACLE_CTE = f"""
corpus AS (
  SELECT
    source AS repo,
    'dir' || CAST(doc_id % 13 AS VARCHAR) || '/file_' || CAST(doc_id AS VARCHAR)
      || '.' || CASE lang WHEN 'en' THEN 'py' WHEN 'de' THEN 'java'
                          WHEN 'fr' THEN 'go' WHEN 'es' THEN 'rs' ELSE 'c' END
      AS path,
    substr(sha256(source || '/dir' || CAST(doc_id % 13 AS VARCHAR) || '/file_'
      || CAST(doc_id AS VARCHAR) || '.'
      || CASE lang WHEN 'en' THEN 'py' WHEN 'de' THEN 'java'
                   WHEN 'fr' THEN 'go' WHEN 'es' THEN 'rs' ELSE 'c' END
      || '@' || CAST(doc_id AS VARCHAR)), 1, 40) AS "commit",
    lang,
    text AS content,
    (TIMESTAMP '2020-01-01 00:00:00'
       + ((doc_id * {TS_MULT}) % {TS_YEAR_S}) * INTERVAL '1 second') AS ts,
    ({TS_EPOCH0} + (doc_id * {TS_MULT}) % {TS_YEAR_S})::BIGINT AS ts_s
  FROM documents
)
"""


def synth_corpus(spark: SparkSession, sf_dir: str,
                 replicate: int = 1) -> DataFrame:
    """documents.parquet → corpus(repo, path, commit, lang, content).

    Deterministic column derivations only (FIXTURES.md §1): repo=source,
    path=f"dir{doc_id%13}/file_{doc_id}.{ext(lang)}",
    commit=sha256(f"{repo}/{path}@{doc_id}")[:40], content=text.
    All expressions are Catalyst built-ins → whole-stage codegen, no UDFs.

    ``replicate`` > 1 scales the corpus deterministically for benchmarks
    (FIXTURES.md §1: replica-prefixed paths, re-hashed commits; content —
    and thus vocabulary statistics — unchanged).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        docs = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        ).withColumn(
            "doc_id", F.col("doc_id") * replicate + F.col("rep")
        ).withColumn(
            "source", F.concat(F.col("source"), F.lit("_r"),
                               F.col("rep").cast("string"))
        ).drop("rep")
        # the fixture is one small parquet file → without this the whole
        # replicated corpus funnels through 1-2 upstream tasks; a real
        # 10^12-file table arrives already split across many files
        docs = docs.repartition(
            spark.sparkContext.defaultParallelism * 2)
    ext = F.element_at(
        F.create_map(*[F.lit(x) for kv in LANG_EXT.items() for x in kv]),
        F.col("lang"),
    )
    path = F.concat(
        F.lit("dir"), (F.col("doc_id") % 13).cast("string"),
        F.lit("/file_"), F.col("doc_id").cast("string"),
        F.lit("."), ext,
    )
    return docs.select(
        F.col("source").alias("repo"),
        path.alias("path"),
        F.substring(
            F.sha2(
                F.concat(F.col("source"), F.lit("/"), path, F.lit("@"),
                         F.col("doc_id").cast("string")),
                256,
            ),
            1, 40,
        ).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        # typed commit-date field (SURVEY I3: zeit.solr converts CMS
        # dates to Solr date fields) — timestamp_seconds builds the
        # INSTANT from epoch arithmetic, so the value is identical in
        # every session timezone
        F.timestamp_seconds(
            F.lit(TS_EPOCH0)
            + (F.col("doc_id") * TS_MULT) % TS_YEAR_S).alias("ts"),
    )


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """I1 — corpus scan.  ``location`` is a parquet dir (sandbox) or an
    Iceberg table name when the runtime has the Iceberg catalog configured.
    Columnar vectorized scan; Catalyst prunes columns/pushes predicates."""
    if location.startswith("iceberg:"):
        return spark.read.format("iceberg").load(location[len("iceberg:"):])
    return spark.read.parquet(location)


def convert_fields(corpus: DataFrame) -> DataFrame:
    """I3 — document conversion: project typed fields + content sha256.

    zeit.solr's converter turns a CMS object into Solr ``<field>`` values
    (dates → ISO-8601Z, bools → 'true'/'false'); here the typed field bag is
    the DataFrame schema itself and the computed field is the invariant
    sha256.  When the corpus carries the typed ``ts`` date field, the
    conversion emits its instant as ``ts_s`` epoch seconds (the
    timezone-independent comparable; ISO-8601Z *rendering* is
    ``date_format`` under the engine's pinned-UTC sessions)."""
    cols = [
        "repo", "path", "commit", "lang",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.length("content").alias("n_chars"),
    ]
    if "ts" in corpus.columns:
        cols.append(F.unix_timestamp("ts").alias("ts_s"))
    return corpus.select(*cols)
