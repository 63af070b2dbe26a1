"""Deterministic dense docID assignment (SURVEY.md §2.1 I2).

Solr/Lucene assign internal docIDs at segment-write time; rank-identity of
BM25 results across runs and cluster sizes (BASELINE.json north_rule)
requires OUR docIDs to be a pure function of the corpus, independent of
parallelism.  docID := global rank of the unique sort key
``(repo, path, commit)``.

Scalable pattern (no global single-partition window, no
``monotonically_increasing_id``):

  1. ``repartitionByRange`` on the key → partitions hold ordered,
     disjoint key ranges; ``sortWithinPartitions`` orders rows inside.
  2. One tiny job counts rows per partition; the driver prefix-sums the
     counts (P integers — O(partitions), not O(rows)).
  3. ``mapInArrow`` adds ``offset[pid] + local_position`` per Arrow batch
     (vectorized ``np.arange``; partition id via TaskContext).

Cost: one range shuffle + one cheap counting job over the cached shuffle
output.  At 10^12 files this is the standard distributed dense-rank; the
driver state stays O(partitions).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

SORT_KEY = ["repo", "path", "commit"]


def assign_doc_ids(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """corpus → corpus + ``doc_id:long`` (dense 0..N-1, rank by sort key)."""
    spark = corpus.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    part = (
        corpus.repartitionByRange(num_partitions, *SORT_KEY)
        .sortWithinPartitions(*SORT_KEY)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        part.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = StructType(list(corpus.schema.fields)).add("doc_id", LongType(), False)

    def add_ids(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId()
        if pid not in bc.value:
            raise RuntimeError(
                f"docid assignment executed in a renumbered stage (pid={pid},"
                f" expected 0..{len(bc.value) - 1}): a consumer recomputed the"
                " lineage instead of reading the materialized result")
        base = bc.value[pid]
        for batch in batches:
            n = batch.num_rows
            ids = pa.array(np.arange(base, base + n, dtype=np.int64), type=pa.int64())
            base += n
            yield batch.append_column("doc_id", ids)

    out = part.mapInArrow(add_ids, out_schema)
    # TaskContext.partitionId() is STAGE-relative: if a downstream plan
    # fuses this map into a union/coalesced stage, partition ids renumber
    # and the offsets are wrong.  Materializing here pins the stage to the
    # linear lineage (shuffle-read → sort → map), where stage partition ids
    # == range partition ids; consumers then read the cached result.
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    n_out = out.count()
    assert n_out == sum(by_pid.values())
    part.unpersist()
    return out
