"""CLONE (Delta's CREATE TABLE CLONE / VERSION AS OF): snapshot
equality, time-travel clones, post-clone independence, stats
carry-over, and vacuum safety of the hardlinked files."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F  # noqa: F401

from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
    TxnTable,
)


def _rows(spark, lo, hi, status="new"):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v"),
        F.lit(status).alias("status"))


def _ids(spark, t):
    return {r.id for r in t.read(spark).collect()}


def test_clone_snapshot_and_time_travel(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    src.append(_rows(spark, 0, 100))
    v1 = src.append(_rows(spark, 100, 200))
    src.delete_where(spark, "id >= 150")

    latest = src.clone(str(tmp_path / "latest"))
    assert _ids(spark, latest) == set(range(150))
    assert (latest.history()[0]["meta"]["operation"] == "clone"
            and latest.history()[0]["meta"]["source_version"]
            == src.latest_version())

    old = src.clone(str(tmp_path / "old"), version=v1)
    assert _ids(spark, old) == set(range(200))  # pre-delete snapshot


def test_clone_refuses_nonempty_dest_and_missing_src(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    with pytest.raises(ValueError, match="no commits"):
        src.clone(str(tmp_path / "c"))
    src.append(_rows(spark, 0, 10))
    dest = TxnTable(str(tmp_path / "dest"))
    dest.append(_rows(spark, 0, 5))
    with pytest.raises(ValueError, match="not empty"):
        src.clone(str(tmp_path / "dest"))


def test_clone_refuses_dest_with_stray_files(spark, tmp_path):
    """A dest that is not a txn table but contains files (mistyped path,
    half-deleted table) must raise, not be merged into or overwritten
    (ADVICE r5: the old EEXIST fallback copy2'd over pre-existing
    files)."""
    src = TxnTable(str(tmp_path / "src"))
    src.append(_rows(spark, 0, 10))
    stray = tmp_path / "stray"
    stray.mkdir()
    keep = stray / "precious.txt"
    keep.write_text("do not clobber")
    with pytest.raises(ValueError, match="not empty"):
        src.clone(str(stray))
    assert keep.read_text() == "do not clobber"


def test_clone_evolves_independently(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    src.append(_rows(spark, 0, 100))
    c = src.clone(str(tmp_path / "c"))
    c.append(_rows(spark, 100, 130))
    src.delete_where(spark, "id < 10")
    assert _ids(spark, c) == set(range(130))
    assert _ids(spark, src) == set(range(10, 100))


def test_clone_carries_stats_for_pruning(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    for lo in (0, 1000, 2000):
        src.append(_rows(spark, lo, lo + 100))
    c = src.clone(str(tmp_path / "c"))
    # stats came from the source commit docs, not a re-harvest: the
    # range planner prunes the clone exactly like the source
    assert len(c.pruned_dirs("id", 1000, 1099)) == 1
    assert c.pruned_dirs("id", 1000, 1099) == src.pruned_dirs(
        "id", 1000, 1099)
    got = {r.id for r in c.read_range(spark, "id", 1000, 1099).collect()}
    assert got == set(range(1000, 1100))


def test_clone_survives_source_vacuum(spark, tmp_path):
    """Hardlinked files stay readable after the source overwrites and
    vacuums away its name for them — the clone's link holds the inode."""
    src = TxnTable(str(tmp_path / "src"))
    src.append(_rows(spark, 0, 100))
    c = src.clone(str(tmp_path / "c"))
    src.overwrite(_rows(spark, 500, 510))
    src.vacuum(keep_versions=False, older_than_seconds=0)
    assert _ids(spark, src) == set(range(500, 510))
    assert _ids(spark, c) == set(range(100))
