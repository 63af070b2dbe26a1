"""zsolr — a PySpark-native inverted-index + BM25 full-text engine.

From-scratch reimplementation of the query and data-processing capabilities
of ``cutoffthetop/zeit.solr`` (a CMS↔Solr client layer; see SURVEY.md §0 for
provenance — the reference checkout is empty, so parity targets come from
BASELINE.json's north_star/north_rule).  zeit.solr's update path
(``ISolrConverter``/``IUpdater`` → Solr HTTP) becomes a DataFrame index-build
pipeline; its query path (``SolrConnection.search`` → Lucene/BM25) becomes a
distributed posting-list + block-max-WAND top-k engine.

Module map (SURVEY.md §7):
  codec    — delta + varint / bit-packed posting-block codec (numpy)
  corpus   — corpus synthesis + scan + field conversion (I1-I3)
  docids   — deterministic dense docID assignment (I2)
  analyze  — tokenizer (I4)
  build    — index build: tf agg, posting build/merge, stats, persist (I5-I8, I11-I12)
  catalog  — manifest-parquet catalog with atomic snapshot commit (Iceberg stand-in)
  query    — zeit.solr-style query-string builders (§2.3)
  parse    — Lucene-subset query parser → AST (Q1)
  search   — BM25 top-k query engine (Q2-Q34)
  connection — pysolr-style SolrConnection facade (search/fq/fl/facets/
             cursorMark/spellcheck/highlighting, add-upsert, delete)
  lifecycle— delete / incremental update + <add> upsert (I9-I10)
  streaming— Structured Streaming updater + stateful sessionization
  ops      — training-data ops (dedup/ANN/lang-id/quality/clustering)
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
BLOCK_SIZE = 128  # docs per posting block (block-max WAND granularity)
