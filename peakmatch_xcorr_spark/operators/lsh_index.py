"""Incremental LSH near-duplicate index: score only pairs that touch
NEW conversations.

This is the LSH-tier analogue of the reference's ``xcorr.saved``
skip-cached refresh (AnalyseProcessor.java:166-258, re-expressed for
the blocked path in ``operators/analyse.refresh_saved_xcorr``): at
10^9 conversations a corpus grows by appends, and re-running the full
``lsh_scoped_matches`` over 100 TB because 1% arrived is the wrong
cost model.  The index persists each conversation's band signatures
in a warehouse table; a refresh

* featurizes and signs ONLY the new conversations,
* rebuilds bucket fills over old ∪ new signatures (a linear groupBy
  over small rows — fills must reflect the combined corpus so
  eligibility and ownership stay consistent),
* scores only buckets containing >= 1 new member, and inside them only
  pairs with >= 1 new side (``_score_buckets(new_only=True)``);
  old x old verdicts are already in the matches table and xcorr is
  pair-intrinsic, so they can never change,
* star-scores new members of over-cap buckets against the bucket's
  stable representative (min OLD conv id when one exists, so new
  arrivals chain into the existing cluster component),
* appends the new signatures and the match delta.

Incremental vs full-run parity: on the same final corpus the result
equals ``lsh_scoped_matches`` EXCEPT where a bucket crossed the
``max_bucket`` cap between refreshes (the standard incremental-ANN
boundary effect: members pairwise-scored while the bucket was in-cap
keep those verdicts; a full re-run would star-score them instead).
``tests/test_lsh_index.py`` pins exact parity when no cap crossing
occurs and cluster connectivity when one does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.config import PeakmatchConf
from peakmatch_xcorr_spark.operators.pairs import (
    _score_buckets,
    _spectral_band_sigs,
    _tile_members,
    lsh_scoped_matches,
)
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable

_MATCH_SCHEMA = "id_a string, id_b string, score double, xcorr double"


def lsh_index_refresh(
    spark: SparkSession,
    features: DataFrame,
    index: WarehouseTable,
    matches: WarehouseTable,
    conf: PeakmatchConf,
    n_planes: int = 128,
    bands: int = 8,
    max_bucket: int = 2048,
    spec_bins: int = 64,
    prune_pair_knee: int = 250_000,
    tile_chunk: int | None = None,
) -> DataFrame:
    """Bring ``matches`` up to date with ``features`` (the full current
    corpus feature frame) and return the full match table.

    ``index`` persists (conv_id, band, sig) rows for every
    already-scored conversation; conversations present in ``features``
    but absent from the index are the new batch.  Cost scales with the
    membership of buckets the new batch touches, never with N²/2 or
    with the old corpus size."""
    if index.current_version() is None:
        # cold start: the full tier IS the delta
        kw = {} if tile_chunk is None else {"tile_chunk": tile_chunk}
        delta = lsh_scoped_matches(
            features, conf, n_planes, bands, max_bucket, spec_bins,
            prune_pair_knee, **kw,
        )
        sigs = _spectral_band_sigs(features, spec_bins, n_planes, bands)
        index.append(sigs, job_id="lsh_index_refresh")
        matches.append(delta, job_id="lsh_index_refresh")
        return matches.read(spark)

    old_sigs = index.read(spark).select("conv_id", "band", "sig")
    old_ids = old_sigs.select("conv_id").distinct()
    new_feats = features.join(old_ids, "conv_id", "left_anti")
    if new_feats.limit(1).count() == 0:
        return matches.read(spark)
    new_sigs = _spectral_band_sigs(
        new_feats, spec_bins, n_planes, bands
    ).localCheckpoint(eager=False)

    all_sigs = (
        old_sigs.withColumn("is_new", F.lit(False))
        .unionByName(new_sigs.withColumn("is_new", F.lit(True)))
        .localCheckpoint(eager=False)
    )
    # fills over the COMBINED corpus: eligibility (in-cap vs over-cap)
    # and the min-band ownership rule must agree across old and new
    # members, exactly as a full run over the final corpus would see
    all_counts = all_sigs.groupBy("band", "sig").count()
    counts = all_counts.filter(
        (F.col("count") > 1) & (F.col("count") <= max_bucket)
    )
    # only buckets with >= 1 new member can contain a scorable pair
    # (every pair must have a new side); a new x old pair's owner
    # bucket contains the new side by construction, so restricting to
    # hot buckets never orphans a pair's owner
    new_buckets = (
        all_sigs.filter("is_new").select("band", "sig").distinct()
    )
    hot = counts.select("band", "sig").join(new_buckets, ["band", "sig"], "left_semi")
    over_hot = (
        all_counts.filter(F.col("count") > max_bucket)
        .select("band", "sig")
        .join(new_buckets, ["band", "sig"], "left_semi")
    )

    # eligible-sig vectors for every conversation participating in a
    # hot bucket (in-cap or over-cap): linear rows, delta-sized
    participants = (
        all_sigs.join(
            hot.unionByName(over_hot), ["band", "sig"], "left_semi"
        )
        .select("conv_id")
        .distinct()
    )
    flagged = all_sigs.join(participants, "conv_id", "left_semi").join(
        counts.select("band", "sig", F.lit(True).alias("in_cap")),
        ["band", "sig"],
        "left",
    )
    esigs = (
        flagged.groupBy("conv_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("band"),
                            F.when(F.col("in_cap"), F.col("sig"))
                            .otherwise(F.lit(-1))
                            .alias("esig"),
                        )
                    )
                ),
                lambda s: s["esig"],
            ).alias("esigs")
        )
        .localCheckpoint(eager=False)
    )

    # semi-join the payload down to participants BEFORE the member
    # join: otherwise the sort-merge shuffles the FULL feature table
    # (linear in corpus, ~2 KB/conv) where only touched-bucket members
    # are needed.  The remaining linear terms are the payload scan and
    # the old∪new signature groupBy — tens of bytes per conv, the same
    # class of cost as refresh_saved_xcorr's anti-join
    part_feats = features.join(participants, "conv_id", "left_semi")
    slim = (
        all_sigs.join(hot, ["band", "sig"], "left_semi")
        .join(esigs, "conv_id")
    )
    # tile skewed buckets payload-free (same tiling as the full tier —
    # the combined-corpus counts keep full-run/incremental agreement),
    # then join the series payload once
    members = _tile_members(
        slim, counts, **({} if tile_chunk is None else {"tile_chunk": tile_chunk})
    ).join(part_feats, "conv_id")
    bucket_delta = _score_buckets(
        members, bands, conf.sampling_stride, conf.candidate_threshold,
        conf.final_threshold, prune_pair_knee, new_only=True,
    )

    # over-cap hot buckets: star-score each NEW member against the
    # bucket's stable representative — min OLD conv id when the bucket
    # has old members (their cluster already chains through earlier
    # verdicts), else min new — O(new members) exact kernels per bucket
    over_m = all_sigs.join(over_hot, ["band", "sig"], "left_semi")
    reps = over_m.groupBy("band", "sig").agg(
        F.coalesce(
            F.min(F.when(~F.col("is_new"), F.col("conv_id"))),
            F.min("conv_id"),
        ).alias("rep")
    )
    star = (
        over_m.filter("is_new")
        .join(reps, ["band", "sig"])
        .filter(F.col("conv_id") != F.col("rep"))
        .select(
            F.least("rep", "conv_id").alias("id_a"),
            F.greatest("rep", "conv_id").alias("id_b"),
        )
        .distinct()
        # score-once vs the bucket path: drop pairs whose eligible-sig
        # vectors share a scorable slot (the bucket path owns those)
        .join(
            esigs.select(F.col("conv_id").alias("id_a"), F.col("esigs").alias("ea")),
            "id_a",
        )
        .join(
            esigs.select(F.col("conv_id").alias("id_b"), F.col("esigs").alias("eb")),
            "id_b",
        )
        .filter(
            ~F.exists(
                F.zip_with("ea", "eb", lambda x, y: (x == y) & (x != F.lit(-1))),
                lambda v: v,
            )
        )
        .select("id_a", "id_b")
    )
    from peakmatch_xcorr_spark.operators.features import fft_precache
    from peakmatch_xcorr_spark.operators.pairs import exact_pair_scores

    star_ids = star.select(F.col("id_a").alias("conv_id")).union(
        star.select("id_b")
    ).distinct()
    needed = features.join(star_ids, "conv_id", "left_semi")
    star_scored = (
        exact_pair_scores(star, fft_precache(needed))
        .filter(F.col("xcorr") > conf.final_threshold)
        .withColumn("score", F.lit(None).cast("double"))
        .select("id_a", "id_b", "score", "xcorr")
    )
    delta = bucket_delta.unionByName(star_scored)

    index.append(new_sigs, job_id="lsh_index_refresh")
    matches.append(delta, job_id="lsh_index_refresh")
    return matches.read(spark)
