"""spark-submit entrypoint: ``spark-submit --py-files pxs.zip -m ...``
or ``python -m peakmatch_xcorr_spark <mode> ...``.

Modes mirror the reference's dispatch (XCorrProcessor.java:141-160)
re-expressed as engine jobs:

  peakmatch   transcripts -> featurize -> blocked prune -> candidates table
  postprocess candidates + event_fft -> verified matches table
  fused       prune+verify in one pass -> matches table (the scale path)
  analyse     accuracy report (FP/FN/prune rates) on a sample
  dedup       matches -> connected components -> deduped transcripts
  rollup      full 1m/1h/1d cascade refresh (incremental, resumable)
  xcorr       exact xcorr of two conversations (parity oracle CLI,
              XCorrProcessor.java:93-106)
  bruteforce  exact xcorr over ALL pairs above final-threshold
              (BruteForceProcessor.java:36-101)
  fftdom      FFTDOMINANTFREQ per-event features -> table, or stdout
              lines with --events (DominantFreqProcessor.java:142-159)
  cluster     band features -> KNN graph -> connected components
              (ClusteringProcessor.java)
  downsample  activity curve -> m4 / lttb / ewma / holt / holtwinters /
              sax table (engine addition: shape-preserving downsample
              family)
  maintain    warehouse table maintenance: --action compact (small
              files -> target partitions), expire (drop old
              snapshots + physically delete unreferenced files),
              delete (row-level COW purge by key set — the
              right-to-be-forgotten job; compose with expire to
              remove the pre-delete files from disk), bloom
              (metadata-only commit attaching per-file Bloom
              filters for --key-col point-lookup file skipping)

completing the reference's 9-mode dispatch (PLOT1D/PLOT2D are debug
console formatters; PLOT2D exists as spectrogram_table).

Build the artifact:  python tools/package.py   (deterministic dist/pxs.zip;
                     tests/test_package_zip.py proves run-from-zip)
Run on a cluster:    spark-submit --py-files dist/pxs.zip run_job.py rollup ...
(run_job.py = ``from peakmatch_xcorr_spark.__main__ import main; main()``)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="peakmatch_xcorr_spark")
    p.add_argument("mode", choices=[
        "peakmatch", "postprocess", "fused", "analyse", "dedup",
        "rollup", "xcorr", "bruteforce", "fftdom", "cluster", "plot",
        "downsample", "convstats", "maintain", "fromconf",
    ])
    p.add_argument("--conf", default=None,
                   help="reference xcorr.conf file: its knobs seed the "
                        "engine conf; with mode 'fromconf' its mode= "
                        "line also picks the job to run")
    p.add_argument("--action",
                   choices=["compact", "expire", "delete", "orphans",
                            "bloom", "ndv", "history"],
                   default="compact", help="maintain mode action")
    p.add_argument("--older-than-hours", type=float, default=1.0,
                   help="maintain orphans: minimum file age to sweep")
    p.add_argument("--table", default="transcripts",
                   help="maintain mode warehouse table name")
    p.add_argument("--keep-last", type=int, default=5,
                   help="maintain expire: snapshots to retain")
    p.add_argument("--target-partitions", type=int, default=1,
                   help="maintain compact: output file count")
    p.add_argument("--zorder-keys", nargs=2, default=None, metavar=("A", "B"),
                   help="maintain compact: re-cluster along the (A, B) "
                        "Z-curve while rewriting")
    p.add_argument("--delete-keys", nargs="+", default=None,
                   help="maintain delete: key values to purge")
    p.add_argument("--key-col", default="conv_id",
                   help="maintain delete/bloom: key column (delete "
                        "values cast to its table type)")
    p.add_argument("--method",
                   choices=["m4", "lttb", "ewma", "holt", "holtwinters",
                            "sax"],
                   default="m4",
                   help="downsample mode: M4 buckets / LTTB budget / EWMA "
                        "/ Holt level+trend / Holt-Winters seasonal / SAX "
                        "symbolic words")
    p.add_argument("--out-bucket", default="1 hour",
                   help="downsample m4 pixel-bucket width")
    p.add_argument("--n-out", type=int, default=100,
                   help="downsample lttb point budget per conversation")
    p.add_argument("--alpha", type=float, default=0.2,
                   help="downsample ewma/holt smoothing factor")
    p.add_argument("--beta", type=float, default=0.3,
                   help="downsample holt trend factor")
    p.add_argument("--gamma", type=float, default=0.4,
                   help="downsample holtwinters seasonal factor")
    p.add_argument("--period", type=int, default=24,
                   help="downsample holtwinters seasonal period (buckets)")
    p.add_argument("--word-len", type=int, default=8,
                   help="downsample sax word length")
    p.add_argument("--alphabet", type=int, default=4,
                   help="downsample sax alphabet size (3-6)")
    p.add_argument("--stat",
                   choices=["transitions", "latency", "entropy", "ngrams"],
                   default="transitions",
                   help="convstats mode statistic")
    p.add_argument("--role-col", default="role",
                   help="convstats: the turn-label column to analyse "
                        "(role, tool, ...) — the operators are generic "
                        "over the label alphabet")
    p.add_argument("--from-role", default="user",
                   help="convstats latency: the prompting role")
    p.add_argument("--to-role", default="assistant",
                   help="convstats latency: the responding role")
    p.add_argument("--ngram-n", type=int, default=3,
                   help="convstats ngrams: sequence length")
    p.add_argument("--style", choices=["1d", "2d", "tiny"], default="1d",
                   help="plot mode style (XCorrProcessor.java:78-91)")
    p.add_argument("--plot-bucket-sec", type=float, default=0.64,
                   help="2d plot tumbling bucket duration (seconds)")
    p.add_argument("--input", help="transcripts parquet path / warehouse table")
    p.add_argument("--warehouse", default="/tmp/pxs_warehouse")
    p.add_argument("--output", help="output table name", default=None)
    p.add_argument("--blocks", type=int, default=64)
    p.add_argument("--curve-len", type=int, default=256)
    p.add_argument("--bucket", default="1 minute")
    p.add_argument("--events", nargs="+", help="conv_ids for xcorr (2) / fftdom modes")
    p.add_argument("--sample-rate", type=int, default=100, help="spectral sample rate (fftdom/cluster)")
    p.add_argument("--bands", nargs="+", default=None, metavar="[LO-HI]",
                   help="mean-amplitude hz bands for fftdom, reference "
                        "syntax eg [1-5] [5-8.5] [8.5-10] "
                        "(dominantfreq.mean-frequency-amplitude-bands, "
                        "xcorr.conf:58); default = the reference defaults")
    p.add_argument("--cores", default=None, help="local[N] when set; else use spark-submit master")
    args = p.parse_args(argv)
    ref_conf = None
    if args.conf:
        from peakmatch_xcorr_spark.config import (
            REFERENCE_MODES,
            load_reference_conf,
        )

        try:
            token, ref_conf, ref_extras = load_reference_conf(args.conf)
        except (OSError, ValueError) as e:
            p.error(str(e))
        if args.mode == "fromconf":
            cli_mode, implied = REFERENCE_MODES[token]
            args.mode = cli_mode
            for k, v in implied.items():
                setattr(args, k, v)
            # reference plot sub-knobs ride along (xcorr.conf:66-72)
            if token == "PLOT1D" and ref_extras.get("plot.1d.tiny") == "true":
                args.style = "tiny"
            if token == "PLOT2D" and "plot.2d.bucket-duration-sec" in ref_extras:
                args.plot_bucket_sec = float(
                    ref_extras["plot.2d.bucket-duration-sec"]
                )
    elif args.mode == "fromconf":
        p.error("fromconf mode requires --conf")
    if args.mode == "xcorr" and len(args.events or []) != 2:
        p.error("xcorr mode requires exactly 2 --events conv_ids")
    if args.mode == "maintain" and args.action == "delete" and not args.delete_keys:
        p.error("maintain --action delete requires --delete-keys")

    from pyspark.sql import SparkSession

    from peakmatch_xcorr_spark.config import EngineConf, PeakmatchConf, RollupConf

    if args.cores:
        from peakmatch_xcorr_spark.session import get_spark

        spark = get_spark(cores=args.cores, app_name=f"pxs-{args.mode}")
    else:
        spark = SparkSession.builder.appName(f"pxs-{args.mode}").getOrCreate()
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    if ref_conf is not None:
        import dataclasses

        from peakmatch_xcorr_spark.config import ClusterConf, SpectralConf

        # the conf file's knobs win (thresholds, stride, crop,
        # normalise, expected-file-line-count for raw event ingest);
        # the transcript activity-curve length stays a CLI concern
        conf = dataclasses.replace(
            ref_conf, rollup=RollupConf(activity_curve_len=args.curve_len)
        )
        base_spectral = conf.spectral
        base_cluster = conf.cluster
    else:
        from peakmatch_xcorr_spark.config import ClusterConf, SpectralConf

        conf = EngineConf(
            peakmatch=PeakmatchConf(expected_len=args.curve_len),
            rollup=RollupConf(activity_curve_len=args.curve_len),
        )
        base_spectral = SpectralConf(sample_rate=args.sample_rate)
        base_cluster = ClusterConf()

    from peakmatch_xcorr_spark.operators.features import (
        conversation_features,
        fft_precache,
    )
    from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable

    def load_transcripts():
        return spark.read.parquet(args.input)

    def table(name: str) -> WarehouseTable:
        return WarehouseTable(args.warehouse, name)

    if args.mode == "xcorr":
        from peakmatch_xcorr_spark.kernels.xcorr import fft_xcorr_best

        feats = conversation_features(
            load_transcripts(), conf.peakmatch, args.bucket, args.curve_len
        )
        rows = {
            r["conv_id"]: r["series"]
            for r in feats.filter(feats.conv_id.isin(list(args.events)))
            .select("conv_id", "series").collect()
        }
        import numpy as np

        a, b = (np.asarray(rows[e]) for e in args.events)
        # 3-decimal print for reference CLI parity (Util.NF, Util.java:28)
        print(f"{fft_xcorr_best(a, b):.3f}")
        return

    if args.mode == "peakmatch":
        from peakmatch_xcorr_spark.operators.pairs import peakmatch_candidates

        feats = conversation_features(
            load_transcripts(), conf.peakmatch, args.bucket, args.curve_len
        ).cache()
        cands = peakmatch_candidates(feats, conf.peakmatch, args.blocks)
        snap = table(args.output or "candidates").overwrite(cands, job_id="peakmatch")
        fft_tbl = table("event_fft")
        fft_tbl.overwrite(fft_precache(feats), job_id="fftprecache")
        print(json.dumps({"candidates": snap.metrics.get("rows")}))
        return

    if args.mode == "postprocess":
        from peakmatch_xcorr_spark.operators.pairs import postprocess_verify

        cands = table("candidates").read(spark)
        ffts = table("event_fft").read(spark)
        matches = postprocess_verify(cands, ffts, conf.peakmatch)
        snap = table(args.output or "matches").overwrite(matches, job_id="postprocess")
        print(json.dumps({"matches": snap.metrics.get("rows")}))
        return

    if args.mode == "fused":
        from peakmatch_xcorr_spark.operators.pairs import fused_prune_verify

        feats = conversation_features(
            load_transcripts(), conf.peakmatch, args.bucket, args.curve_len
        ).cache()
        matches = fused_prune_verify(feats, conf.peakmatch, args.blocks)
        snap = table(args.output or "matches").overwrite(matches, job_id="fused")
        print(json.dumps({"matches": snap.metrics.get("rows")}))
        return

    if args.mode == "analyse":
        from peakmatch_xcorr_spark.operators.analyse import analyse_accuracy

        feats = conversation_features(
            load_transcripts(), conf.peakmatch, args.bucket, args.curve_len
        ).cache()
        rep = analyse_accuracy(spark, feats, conf.peakmatch, n_blocks=args.blocks)
        print(rep.toPandas().iloc[0].to_json())
        return

    if args.mode == "dedup":
        from peakmatch_xcorr_spark.operators.dedup import dedup_transcripts

        matches = table("matches").read(spark)
        deduped = dedup_transcripts(load_transcripts(), matches)
        snap = table(args.output or "transcripts_deduped").overwrite(
            deduped, job_id="dedup"
        )
        print(json.dumps({"rows": snap.metrics.get("rows")}))
        return

    if args.mode == "plot":
        # console debug plots (-plot {1d,2d,tiny}, XCorrProcessor.java:78-91)
        import numpy as np

        from peakmatch_xcorr_spark.config import SpectralConf
        from peakmatch_xcorr_spark.plot import plot1d_event, plot2d_event

        feats = conversation_features(
            load_transcripts(), conf.peakmatch, args.bucket, args.curve_len
        )
        if args.events:
            feats = feats.filter(feats.conv_id.isin(list(args.events)))
        spectral = base_spectral
        for r in feats.select("conv_id", "series").toLocalIterator():
            s = np.asarray(r["series"])
            if args.style == "2d":
                print(plot2d_event(r["conv_id"], s, args.plot_bucket_sec, spectral))
            else:
                print(plot1d_event(r["conv_id"], s, spectral,
                                   tiny=args.style == "tiny"))
        return

    if args.mode == "bruteforce":
        # exact FFT xcorr over ALL pairs, keep above final-threshold
        # (BruteForceProcessor.java:36-101: the end-to-end oracle mode)
        from peakmatch_xcorr_spark.operators.pairs import peakmatch_scores

        feats = conversation_features(
            load_transcripts(), conf.peakmatch, args.bucket, args.curve_len
        ).cache()
        exact = peakmatch_scores(feats, conf.peakmatch, args.blocks, exact=True)
        matches = exact.filter(exact.score > conf.peakmatch.final_threshold)
        snap = table(args.output or "bruteforce").overwrite(
            matches, job_id="bruteforce"
        )
        print(json.dumps({"matches": snap.metrics.get("rows")}))
        return

    if args.mode == "fftdom":
        # FFTDOMINANTFREQ (DominantFreqProcessor.java:142-159): table
        # sink by default; with --events, per-event stdout lines like
        # the reference CLI (XCorrProcessor.java:107-117)
        from peakmatch_xcorr_spark.config import SpectralConf
        from peakmatch_xcorr_spark.operators.spectral_ops import (
            dominant_freq_table,
        )

        feats = conversation_features(
            load_transcripts(), conf.peakmatch, args.bucket, args.curve_len
        )
        if args.bands is None:
            spectral = base_spectral
        else:
            import dataclasses

            from peakmatch_xcorr_spark.config import parse_band_spec

            try:
                bands = parse_band_spec(args.bands)
            except ValueError as e:
                p.error(str(e))
            spectral = dataclasses.replace(
                base_spectral, mean_amplitude_bands=bands
            )
        if args.events:
            feats = feats.filter(feats.conv_id.isin(list(args.events)))
        dom = dominant_freq_table(feats, spectral)
        if args.events:
            for r in dom.collect():
                freqs = " ".join(f"{f:.3f}" for f in r["top_freqs"])
                bands = "\t".join(f"{b:.3f}" for b in r["band_mean_amps"])
                print(f"{r['id']}\t{freqs}\t{r['peak_amp']:.3f}\t"
                      f"{r['stddev']:.3f}\t{bands}")
            return
        snap = table(args.output or "dominantfreq").overwrite(dom, job_id="fftdom")
        print(json.dumps({"events": snap.metrics.get("rows")}))
        return

    if args.mode == "cluster":
        # CLUSTER mode (ClusteringProcessor.java): band-feature vectors
        # -> blocked all-pairs distances -> KNN-under-eta edges ->
        # connected components with a deterministic size cap
        from peakmatch_xcorr_spark.operators.clustering import (
            band_features,
            cluster_members,
            knn_edges,
            pair_distances,
        )

        feats = conversation_features(
            load_transcripts(), conf.peakmatch, args.bucket, args.curve_len
        )
        bf = band_features(feats, base_spectral)
        cconf = base_cluster
        dists = pair_distances(bf, n_blocks=max(2, min(args.blocks, 16)))
        members = cluster_members(knn_edges(dists, cconf), cconf)
        snap = table(args.output or "clusters").overwrite(members, job_id="cluster")
        print(json.dumps({"clusters": snap.metrics.get("rows")}))
        return

    if args.mode == "maintain":
        from pyspark.sql import functions as F

        t = table(args.table)
        if t.current_version() is None:
            print(json.dumps({"error": f"table {args.table!r} has no snapshots"}))
            sys.exit(2)
        if args.action == "compact":
            snap = t.compact(
                spark,
                target_partitions=args.target_partitions,
                zorder_keys=tuple(args.zorder_keys) if args.zorder_keys else None,
            )
            print(json.dumps({"version": snap.version, **snap.metrics}))
        elif args.action == "expire":
            print(json.dumps(t.expire_snapshots(keep_last=args.keep_last)))
        elif args.action == "orphans":
            print(json.dumps(
                t.remove_orphans(older_than_s=args.older_than_hours * 3600)
            ))
        elif args.action == "bloom":
            from peakmatch_xcorr_spark.operators.bloomindex import (
                build_bloom_index,
            )

            snap = build_bloom_index(t, spark, args.key_col)
            print(json.dumps({"version": snap.version, **snap.metrics}))
        elif args.action == "history":
            rows = [r.asDict() for r in t.history(spark).collect()]
            print(json.dumps({"snapshots": rows}))
        elif args.action == "ndv":
            from peakmatch_xcorr_spark.operators.ndvindex import (
                approx_distinct_from_manifest,
                build_ndv_index,
            )

            snap = build_ndv_index(t, spark, args.key_col)
            est = approx_distinct_from_manifest(t, args.key_col)
            print(json.dumps(
                {"version": snap.version, **snap.metrics, **est}
            ))
        else:  # delete
            from peakmatch_xcorr_spark.operators.merge import delete_rows

            col_type = dict(t.read(spark).dtypes).get(args.key_col)
            if col_type is None:
                print(json.dumps({
                    "error": f"column {args.key_col!r} not in table {args.table!r}"
                }))
                sys.exit(2)
            keys = spark.createDataFrame(
                [(k,) for k in args.delete_keys], f"{args.key_col} string"
            ).select(F.col(args.key_col).cast(col_type).alias(args.key_col))
            snap = delete_rows(t, spark, keys, [args.key_col])
            print(json.dumps({"version": snap.version, **snap.metrics}))
        return

    if args.mode == "rollup":
        from peakmatch_xcorr_spark.operators.refresh import ContinuousAggregate

        src = table(args.output or "transcripts")
        if src.current_version() is None:
            src.append(load_transcripts(), job_id="ingest")
        agg = ContinuousAggregate(
            args.warehouse, src, keys=["conv_id"], ts_col="ts", value_col=None
        )
        print(json.dumps(agg.refresh(spark)))
        return

    if args.mode == "downsample":
        # shape-preserving downsample of the per-conversation activity
        # curve (engine addition; operators/downsample.py)
        from pyspark.sql import functions as F

        from peakmatch_xcorr_spark.operators.downsample import (
            ewma_smooth,
            holt_smooth,
            lttb_downsample,
            m4_downsample,
            sax_symbols,
        )
        from peakmatch_xcorr_spark.operators.rollup import tumbling_rollup

        curve = tumbling_rollup(
            load_transcripts(), ["conv_id"], "ts", None, args.bucket
        ).withColumn("turns", F.col("turns").cast("double"))
        if args.method == "m4":
            out = m4_downsample(
                curve, ["conv_id"], "bucket_start", "turns", args.out_bucket
            )
        elif args.method == "lttb":
            out = lttb_downsample(
                curve, ["conv_id"], "bucket_start", "turns", args.n_out
            )
        elif args.method == "holt":
            out = holt_smooth(
                curve, ["conv_id"], "bucket_start", "turns",
                args.alpha, args.beta,
            )
        elif args.method == "holtwinters":
            from peakmatch_xcorr_spark.operators.downsample import (
                holt_winters_smooth,
            )

            out = holt_winters_smooth(
                curve, ["conv_id"], "bucket_start", "turns",
                args.alpha, args.beta, args.gamma, args.period,
            )
        elif args.method == "sax":
            # curve values are integer counts: scale 1 keeps the
            # power sums exact
            out = sax_symbols(
                curve, ["conv_id"], "bucket_start", "turns",
                args.word_len, args.alphabet, value_scale=1,
            )
        else:
            out = ewma_smooth(
                curve, ["conv_id"], "bucket_start", "turns", args.alpha
            )
        snap = table(args.output or f"downsample_{args.method}").overwrite(
            out, job_id=f"downsample_{args.method}"
        )
        print(json.dumps({"rows": snap.metrics.get("rows")}))
        return

    if args.mode == "convstats":
        # conversation-structure analytics (engine addition;
        # operators/transcripts.py): one conv-window exchange shared
        # by every statistic
        from peakmatch_xcorr_spark.operators.transcripts import (
            behavior_entropy,
            ordered_turns,
            response_latency_stats,
            role_ngrams,
            role_transitions,
        )

        src = load_transcripts()
        if args.role_col != "role":
            # null labels (non-tool turns) carry no transition info
            src = src.filter(src[args.role_col].isNotNull())
        turns = ordered_turns(
            src,
            conv_col="conv_id",
            role_col=args.role_col,
            ts_col="ts",
            tiebreak="turn_idx",
        )
        if args.stat == "latency":
            out = response_latency_stats(
                turns, args.from_role, args.to_role, bucket=args.bucket
            )
        elif args.stat == "entropy":
            out = behavior_entropy(turns)
        elif args.stat == "ngrams":
            out = role_ngrams(turns, n=args.ngram_n)
        else:
            out = role_transitions(turns)
        snap = table(args.output or f"convstats_{args.stat}").overwrite(
            out, job_id=f"convstats_{args.stat}"
        )
        print(json.dumps({"rows": snap.metrics.get("rows")}))
        return


if __name__ == "__main__":
    main()
