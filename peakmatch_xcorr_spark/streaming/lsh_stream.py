"""Continuously-maintained LSH near-duplicate index over a transcript
stream.

The batch refresh (``operators/lsh_index.lsh_index_refresh``) brings
the match table up to date given the FULL current corpus feature
frame; this module feeds it from Structured Streaming micro-batches so
a 10^9-conversation corpus ingesting appends keeps its near-dup index
current without ever re-running the monolithic tier.  Per micro-batch
(``foreachBatch``):

1. featurize the batch's conversations (Arrow kernel, batch-local),
2. append the feature rows to a warehouse ``features`` table — the
   persistent payload store the refresh draws old-side series from
   when a new conversation lands in an existing bucket,
3. run ``lsh_index_refresh`` against the feature table's new snapshot;
   it anti-joins the signature index to find the batch, scores only
   touched buckets, and appends the match delta.

Exactly-once across restarts comes from the pairing of the streaming
checkpoint with two idempotence layers: a replayed micro-batch
anti-joins away against the payload store's id set before appending
(so the store stays duplicate-free by construction), and the
signature-index anti-join inside the refresh independently guarantees
no conversation is ever scored twice — either layer alone already
prevents duplicate match rows.

Contract: each micro-batch must carry WHOLE conversations (the stream
is of finished transcripts, e.g. one file per ingest drop — the same
append unit the reference's directory scan assumes,
EventFolderProcessor.java:31-54).  A conversation whose turns straddle
two batches would be featurized from its first fragment and indexed
as-is; late turns for an already-indexed conversation are ignored, by
the same rule that makes the batch refresh idempotent.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from peakmatch_xcorr_spark.config import PeakmatchConf
from peakmatch_xcorr_spark.operators.features import conversation_features
from peakmatch_xcorr_spark.operators.lsh_index import lsh_index_refresh
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable


def make_lsh_batch_handler(
    spark: SparkSession,
    features_table: WarehouseTable,
    index: WarehouseTable,
    matches: WarehouseTable,
    conf: PeakmatchConf,
    bucket: str = "1 minute",
    curve_len: int = 256,
    n_planes: int = 128,
    bands: int = 8,
    max_bucket: int = 2048,
    spec_bins: int = 64,
    prune_pair_knee: int = 250_000,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` handler, exposed for direct unit testing
    (call it with a batch frame + epoch id) and for embedding in a
    caller-owned ``writeStream``."""

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        feats = conversation_features(
            batch_df, conf, bucket=bucket, curve_len=curve_len
        )
        # keep the payload store duplicate-free BY CONSTRUCTION: a
        # replayed micro-batch (restart between this append and the
        # checkpoint commit) or a source-level re-drop anti-joins away
        # against an id-only, column-pruned scan of the store — tens of
        # bytes per conversation, the same class of linear cost as the
        # refresh's own new-conversation anti-join.  The alternative
        # (dedup on read) would shuffle every payload every batch.
        if features_table.current_version() is not None:
            known = features_table.read(spark).select("conv_id")
            feats = feats.join(known, "conv_id", "left_anti")
        if feats.limit(1).count() == 0:
            return
        features_table.append(feats, job_id=f"lsh_stream_epoch_{epoch_id}")
        lsh_index_refresh(
            spark, features_table.read(spark), index, matches, conf,
            n_planes=n_planes, bands=bands, max_bucket=max_bucket,
            spec_bins=spec_bins, prune_pair_knee=prune_pair_knee,
        )

    return on_batch


def lsh_index_stream(
    spark: SparkSession,
    transcript_stream: DataFrame,
    features_table: WarehouseTable,
    index: WarehouseTable,
    matches: WarehouseTable,
    conf: PeakmatchConf,
    checkpoint_dir: str,
    available_now: bool = True,
    **handler_kwargs,
):
    """Start the maintenance query.  ``available_now=True`` drains the
    currently-available input (respecting the source's
    ``maxFilesPerTrigger``, so each ingest drop refreshes separately)
    and stops — the test/batch-catchup mode; ``False`` runs
    continuously."""
    handler = make_lsh_batch_handler(
        spark, features_table, index, matches, conf, **handler_kwargs
    )
    writer = (
        transcript_stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
