"""Streaming corpus ingestion with cross-batch near-duplicate dedup.

The batch engine already dedups a delta against a materialized
fingerprint table without rescanning the corpus
(:func:`feathr_spark.operators.dedup.minhash_incremental_dedup`, the
snapshot ⊕ delta pattern). This module runs that SAME kernel inside
``foreachBatch``, so a live document stream lands in the corpus already
near-dup-free — against everything previously ingested AND within its
own micro-batch — with identical semantics online and offline (the
train/serve-skew guarantee, same stance as
:mod:`feathr_spark.streaming.enrich`).

Exactly-once discipline without a transactional sink: each epoch writes
its kept documents AND their fingerprints into ``__epoch=<id>``
partitions via dynamic partition overwrite. A replayed epoch
(foreachBatch is at-least-once on retry) overwrites only its own
partitions — and the fingerprint read EXCLUDES the current epoch's
partition, so a half-written failed attempt can never make the retry
dedup a batch against its own fingerprints and drop everything.

Scale notes: per-epoch cost is O(batch) — one signature pass over the
batch, banding joins where the corpus side is a column-pruned scan of
the stored signature table (no corpus text is ever re-read), pair
shuffles carry ids only. At 10^12 sequences the fingerprint table is
the only state, it lives in storage (not executor memory), and it
grows only by kept rows.

Storage note: epoch discovery on ``fp_path`` runs through the Hadoop
FileSystem API (:mod:`feathr_spark.fsio`), resolved from the path's
scheme — ``corpus_path`` / ``fp_path`` may be local, ``hdfs://`` or
``s3a://`` alike, the same contract as
:mod:`feathr_spark.sources.shards` manifest I/O (reference analogue:
offline/util/HdfsUtils.scala).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feathr_spark import fsio


def stream_dedup_ingest(
    stream_df: DataFrame,
    corpus_path: str,
    fp_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    annotate_path: Optional[str] = None,
    trigger_available_now: bool = True,
    query_name: str = "feathr_stream_dedup",
):
    """Start a streaming query ingesting ``stream_df`` documents into
    ``corpus_path`` with cross-batch MinHash near-dup dedup.

    Per micro-batch: sign the batch, band it against the accumulated
    fingerprint table under ``fp_path`` (all epochs except the current
    one), verify candidates, cluster new×new edges, and keep one
    representative per never-seen-before cluster
    (:func:`minhash_incremental_dedup` semantics). Kept documents land
    under ``corpus_path/__epoch=<id>/``; their signatures under
    ``fp_path/__epoch=<id>/``; with ``annotate_path`` every batch row
    is also written with its ``cluster_rep`` / ``dup_of_corpus`` /
    ``keep`` annotation (audit trail).

    Returns the started ``StreamingQuery``; the default
    ``availableNow`` trigger drains the backlog then stops.
    """
    from feathr_spark.operators.dedup import (minhash_incremental_dedup,
                                              minhash_signature)

    def _ingest(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        epoch = int(epoch_id)
        if any(d.startswith("__epoch=")
               for d in fsio.listdir(fp_path, spark)):
            existing = (spark.read.option("basePath", fp_path)
                        .parquet(fp_path)
                        # retry-safety: never dedup against our own
                        # (possibly half-written) failed attempt
                        .where(F.col("__epoch") != epoch)
                        .select(id_col, "minhash"))
        else:
            existing = (minhash_signature(batch.limit(0), text_col,
                                          num_hashes, shingle_n,
                                          id_col=id_col)
                        .select(id_col, "minhash"))
        annotated = minhash_incremental_dedup(
            batch, existing, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            threshold=threshold, verify="estimate", max_bucket=max_bucket)
        annotated = annotated.persist()
        try:
            if annotate_path is not None:
                (annotated.withColumn("__epoch", F.lit(epoch))
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("__epoch").parquet(annotate_path))
            kept = annotated.where("keep") \
                            .drop("cluster_rep", "dup_of_corpus", "keep")
            (kept.withColumn("__epoch", F.lit(epoch))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("__epoch").parquet(corpus_path))
            # sign ONLY the kept rows (batch-sized, one Arrow pass) and
            # append under this epoch's partition
            fp_kept = minhash_signature(kept, text_col, num_hashes,
                                        shingle_n, id_col=id_col) \
                .select(id_col, "minhash")
            (fp_kept.withColumn("__epoch", F.lit(epoch))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("__epoch").parquet(fp_path))
        finally:
            annotated.unpersist()

    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .foreachBatch(_ingest)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def load_ingested(spark, corpus_path: str) -> DataFrame:
    """Read the deduped corpus back (all epochs), epoch column dropped."""
    return spark.read.option("basePath", corpus_path) \
        .parquet(corpus_path).drop("__epoch")
