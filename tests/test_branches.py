"""Write-audit-publish branches + snapshot tags on the warehouse.

The reference engine's phases communicate only through committed files
(SURVEY §2 S5-S11); the WAP branch extends that contract to *audited*
commits: unvetted rows are invisible to main readers until a
metadata-only fast-forward publish, and a failed audit is a pure
metadata drop whose data files the normal orphan GC collects."""

from __future__ import annotations

import pandas as pd
import pytest

from peakmatch_xcorr_spark.sources.warehouse import (
    ConcurrentCommitError,
    WarehouseTable,
)


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "warehouse")


def _df(spark, lo: int, hi: int):
    return spark.createDataFrame(
        pd.DataFrame({"k": range(lo, hi), "v": [float(i) for i in range(lo, hi)]})
    )


def test_wap_publish_happy_path(spark, wh):
    t = WarehouseTable(wh, "tier")
    t.append(_df(spark, 0, 100))
    br = t.create_branch("audit")
    br.append(_df(spark, 100, 150))

    # audit phase: branch sees the union, main is untouched
    assert br.read(spark).count() == 150
    assert t.read(spark).count() == 100
    assert t.count_rows() == 100  # metadata-only count agrees

    snap = t.publish_branch("audit", job_id="wap1")
    assert snap.operation == "publish"
    assert snap.metrics["branch_commits"] == 1
    assert t.read(spark).count() == 150
    assert t.count_rows() == 150
    # publish moved zero bytes: every published path already existed
    # in the shared data dir (committed by the branch append)
    import os

    for f in snap.files:
        assert os.path.exists(os.path.join(t.data_dir, f["path"]))


def test_wap_failed_audit_drop_is_metadata_only_then_gc(spark, wh):
    t = WarehouseTable(wh, "tier")
    t.append(_df(spark, 0, 50))
    br = t.create_branch("audit")
    br.append(_df(spark, 50, 60))
    branch_only = set(
        f["path"] for f in br.snapshot(br.current_version()).files
    ) - set(f["path"] for f in t.snapshot(t.current_version()).files)
    assert branch_only

    # while the branch lives, its files are NOT orphans
    assert t.remove_orphans(older_than_s=0.0)["orphans_deleted"] == 0

    t.drop_branch("audit")
    assert t.list_branches() == []
    assert t.read(spark).count() == 50  # main never saw the rows
    # now the branch-only files are collectable debris
    got = t.remove_orphans(older_than_s=0.0)
    assert got["orphans_deleted"] == len(branch_only)
    assert t.read(spark).count() == 50  # GC never touches live data


def test_publish_conflict_when_main_advances(spark, wh):
    t = WarehouseTable(wh, "tier")
    t.append(_df(spark, 0, 10))
    br = t.create_branch("audit")
    br.append(_df(spark, 10, 20))
    t.append(_df(spark, 90, 95))  # concurrent writer wins on main
    with pytest.raises(ConcurrentCommitError):
        t.publish_branch("audit")
    # main history is what the concurrent writer left — no clobber
    assert t.read(spark).count() == 15


def test_publish_empty_branch_rejected_and_names_validated(spark, wh):
    t = WarehouseTable(wh, "tier")
    t.append(_df(spark, 0, 10))
    t.create_branch("audit")
    with pytest.raises(ValueError):
        t.publish_branch("audit")  # no commits beyond the base
    with pytest.raises(ValueError):
        t.create_branch("audit")  # duplicate
    with pytest.raises(FileNotFoundError):
        t.branch("nope")


def test_branch_of_empty_table_publishes_as_v1(spark, wh):
    t = WarehouseTable(wh, "tier")
    br = t.create_branch("bootstrap")
    br.append(_df(spark, 0, 25))
    snap = t.publish_branch("bootstrap")
    assert snap.version == 1 and snap.parent is None
    assert t.read(spark).count() == 25


def test_branch_maintenance_refused(spark, wh):
    t = WarehouseTable(wh, "tier")
    t.append(_df(spark, 0, 10))
    br = t.create_branch("audit")
    with pytest.raises(RuntimeError):
        br.remove_orphans(older_than_s=0.0)
    with pytest.raises(RuntimeError):
        br.expire_snapshots(keep_last=1)


def test_tag_pins_snapshot_through_expiry(spark, wh):
    t = WarehouseTable(wh, "tier")
    t.append(_df(spark, 0, 10))
    v_tagged = t.create_tag("release-1")
    assert v_tagged == 1
    for lo in range(1, 7):
        t.overwrite(_df(spark, lo * 10, lo * 10 + 10))

    got = t.expire_snapshots(keep_last=2)
    assert got["expired_snapshots"] > 0
    # tagged manifest survived outside the keep_last window...
    assert 1 in t.versions()
    # ...and so did its data files: the tagged read still works
    assert t.read_tag(spark, "release-1").count() == 10
    assert t.tags() == {"release-1": 1}

    # immutability: re-pointing requires drop + create
    with pytest.raises(ValueError):
        t.create_tag("release-1", version=t.current_version())
    t.drop_tag("release-1")
    t.overwrite(_df(spark, 0, 5))
    got2 = t.expire_snapshots(keep_last=2)
    assert got2["expired_snapshots"] > 0
    assert 1 not in t.versions()  # untagged → normal expiry applies


def test_expiry_keeps_files_a_live_branch_references(spark, wh):
    t = WarehouseTable(wh, "tier")
    t.append(_df(spark, 0, 10))
    br = t.create_branch("audit")  # base pins v1's files
    for lo in range(1, 8):
        t.overwrite(_df(spark, lo * 10, lo * 10 + 10))
    t.expire_snapshots(keep_last=1)
    # v1's manifest is gone from main, but the branch still reads its
    # base files — expiry must not have deleted them
    assert br.read(spark).count() == 10


def test_publish_race_loses_at_manifest(spark, wh):
    """Two publishers (or publish vs append) racing for the same
    version number: exactly one wins, the loser gets
    ConcurrentCommitError — never a clobbered manifest."""
    t = WarehouseTable(wh, "tier")
    t.append(_df(spark, 0, 10))
    b1 = t.create_branch("a1")
    b1.append(_df(spark, 10, 20))
    b2 = t.create_branch("a2")
    b2.append(_df(spark, 20, 30))
    t.publish_branch("a1")
    with pytest.raises(ConcurrentCommitError):
        t.publish_branch("a2")
    assert t.read(spark).count() == 20
