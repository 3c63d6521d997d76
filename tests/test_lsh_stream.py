"""Streaming LSH index maintenance (streaming/lsh_stream.py): the
foreachBatch handler applied to successive whole-conversation batches
must converge to the monolithic tier's match set, replays must be
idempotent, and the real Structured Streaming query (file source, one
file per micro-batch, availableNow) must drive the same path."""

from __future__ import annotations

import pandas as pd
import pytest

from peakmatch_xcorr_spark.config import EngineConf, PeakmatchConf, RollupConf
from peakmatch_xcorr_spark.operators.features import conversation_features
from peakmatch_xcorr_spark.operators.pairs import lsh_scoped_matches
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable
from peakmatch_xcorr_spark.streaming.activity import read_transcript_stream
from peakmatch_xcorr_spark.streaming.lsh_stream import (
    lsh_index_stream,
    make_lsh_batch_handler,
)
from peakmatch_xcorr_spark.synth import SynthConf, generate_transcripts

CONF = EngineConf(
    peakmatch=PeakmatchConf(expected_len=256),
    rollup=RollupConf(activity_curve_len=256),
)
LSH_KW = dict(n_planes=16, bands=8)


@pytest.fixture(scope="module")
def batches(spark):
    """Three whole-conversation batches; the '-dup' copies sort last so
    the later batches carry one side of several planted pairs."""
    res = generate_transcripts(SynthConf(n_convs=28, n_dup_pairs=6))
    tdf = res.transcripts
    ids = sorted(tdf["conv_id"].unique())
    cuts = [ids[: len(ids) - 8], ids[len(ids) - 8 : len(ids) - 4], ids[len(ids) - 4 :]]
    parts = [tdf[tdf["conv_id"].isin(c)].reset_index(drop=True) for c in cuts]
    return parts, res.dup_pairs


def _tables(tmp_path):
    wh = str(tmp_path / "wh")
    return (
        WarehouseTable(wh, "features"),
        WarehouseTable(wh, "lsh_index"),
        WarehouseTable(wh, "lsh_matches"),
    )


def _pairs(df):
    return {
        (r.id_a, r.id_b): r.xcorr
        for r in df.select("id_a", "id_b", "xcorr").collect()
    }


def test_handler_converges_to_full_run_and_replay_is_idempotent(
    spark, batches, tmp_path
):
    parts, dup_pairs = batches
    feats_tbl, index, matches = _tables(tmp_path)
    handler = make_lsh_batch_handler(
        spark, feats_tbl, index, matches, CONF.peakmatch, **LSH_KW
    )
    for epoch, part in enumerate(parts):
        handler(spark.createDataFrame(part), epoch)

    full_feats = conversation_features(
        spark.createDataFrame(
            pd.concat(parts, ignore_index=True)
        ),
        CONF.peakmatch, "1 minute", 256,
    )
    want = _pairs(lsh_scoped_matches(full_feats, CONF.peakmatch, **LSH_KW))
    got = _pairs(matches.read(spark))
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)
    # planted pairs whose sides arrived in different micro-batches were
    # still recovered (the new x old delta path)
    owners = {
        cid: i
        for i, part in enumerate(parts)
        for cid in part["conv_id"].unique()
    }
    split = [p for p in dup_pairs if owners[p[0]] != owners[p[1]]]
    assert split
    assert sum(p in got for p in split) / len(split) >= 0.8

    # replay of the last batch (restart between append and checkpoint
    # commit): feature rows may duplicate, but nothing is re-scored and
    # the match table gains no rows
    v_before = matches.current_version()
    handler(spark.createDataFrame(parts[-1]), epoch_id=99)
    assert matches.current_version() == v_before
    out = matches.read(spark)
    assert out.count() == out.select("id_a", "id_b").distinct().count()
    assert _pairs(out) == got


def test_streaming_query_drives_per_file_refreshes(spark, batches, tmp_path):
    parts, _ = batches
    feats_tbl, index, matches = _tables(tmp_path)
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, part in enumerate(parts):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(drop_dir / f"drop_{i}.parquet"),
        )

    stream = read_transcript_stream(spark, str(drop_dir))
    q = lsh_index_stream(
        spark, stream, feats_tbl, index, matches, CONF.peakmatch,
        checkpoint_dir=str(tmp_path / "ckpt"), **LSH_KW,
    )
    q.awaitTermination(timeout=300)
    assert not q.isActive

    # one refresh per ingest drop (maxFilesPerTrigger=1): the index
    # advanced once per batch that carried new conversations
    assert index.current_version() is not None
    assert len(index.versions()) == len(parts)
    n_convs = sum(part["conv_id"].nunique() for part in parts)
    feats = feats_tbl.read(spark)
    # every featurizable conversation landed in the payload store
    full_feats = conversation_features(
        spark.createDataFrame(
            pd.concat(parts, ignore_index=True)
        ),
        CONF.peakmatch, "1 minute", 256,
    )
    assert feats.count() == full_feats.count() <= n_convs
    want = _pairs(lsh_scoped_matches(full_feats, CONF.peakmatch, **LSH_KW))
    assert _pairs(matches.read(spark)) == pytest.approx(want, rel=1e-12)
