"""Incremental materialized-view maintenance (operators/mv.py): the
partials maintained from the change feed must equal the direct
aggregation of the source snapshot after ANY commit sequence, including
histories the feed cannot express row-wise (resync path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.operators.mv import (
    maintain_agg_view,
    read_agg_view,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
    TxnTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, grp string, val int")


def _want(spark, src):
    return {(r.grp, r.cnt, r.sm) for r in
            src.read(spark).groupBy("grp")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("val").alias("sm")).collect()}


def _got(spark, view):
    return {(r.grp, r.cnt, r.sm) for r in
            read_agg_view(spark, view).collect()}


def test_mv_incremental_equals_recompute(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    src.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]))
    assert maintain_agg_view(spark, src, view, ["grp"], "val") == 0
    assert _got(spark, view) == _want(spark, src)
    # merge (update + insert), rewrite delete, DV delete — each applied
    # as its own delta
    src.merge(spark, _df(spark, [(1, "a", 100), (4, "c", 7)]), "id")
    maintain_agg_view(spark, src, view, ["grp"], "val")
    assert _got(spark, view) == _want(spark, src)
    src.delete_where(spark, "id = 2")
    maintain_agg_view(spark, src, view, ["grp"], "val")
    assert _got(spark, view) == _want(spark, src)
    src.delete_where(spark, "id = 4", use_dv=True)
    maintain_agg_view(spark, src, view, ["grp"], "val")
    assert _got(spark, view) == _want(spark, src)
    assert ("c", 1, 7) not in _got(spark, view)  # group fully deleted


def test_mv_refresh_is_idempotent_and_batched(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    src.append(_df(spark, [(1, "a", 1)]))
    v = maintain_agg_view(spark, src, view, ["grp"], "val")
    before = view.latest_version()
    # no new source commits: no-op, no empty commit
    assert maintain_agg_view(spark, src, view, ["grp"], "val") == v
    assert view.latest_version() == before
    # several source commits between refreshes: one combined delta
    src.append(_df(spark, [(2, "a", 2)]))
    src.append(_df(spark, [(3, "b", 3)]))
    maintain_agg_view(spark, src, view, ["grp"], "val")
    assert _got(spark, view) == _want(spark, src)
    assert view.latest_version() == before + 1


def test_mv_resyncs_over_non_cdf_history(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    src.append(_df(spark, [(1, "a", 1), (2, "b", 2)]))
    maintain_agg_view(spark, src, view, ["grp"], "val")
    # full overwrite: not row-wise expressible -> full resync, flagged
    src.overwrite(_df(spark, [(9, "z", 9)]))
    maintain_agg_view(spark, src, view, ["grp"], "val")
    assert _got(spark, view) == _want(spark, src) == {("z", 1, 9)}
    assert view.last_meta().get("mv_resync") is True
    # and incremental maintenance resumes after the resync
    src.append(_df(spark, [(10, "z", 1)]))
    maintain_agg_view(spark, src, view, ["grp"], "val")
    assert _got(spark, view) == {("z", 2, 10)}
    assert view.last_meta().get("mv_resync") is None


def test_mv_streaming_maintenance(spark, tmp_path):
    """The CDF-stream-driven view (streaming/mv.py) converges to the
    direct aggregation through append + MERGE + DELETE commits, and a
    restart on the same checkpoint re-applies nothing."""
    from sport_advantages_moderne_data_infrastructure_spark.streaming.mv import (
        write_stream_agg_view,
    )

    src = TxnTable(str(tmp_path / "src"))
    view_path = str(tmp_path / "view")
    ck = str(tmp_path / "ck")
    src.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]))
    src.merge(spark, _df(spark, [(1, "a", 100), (4, "c", 7)]), "id")
    src.delete_where(spark, "id = 2")

    def drain():
        q = write_stream_agg_view(spark, src.path, view_path, ck,
                                  ["grp"], "val", app_id="mvstream")
        q.awaitTermination(120)

    drain()
    view = TxnTable(view_path)
    assert _got(spark, view) == _want(spark, src)
    v = view.latest_version()
    drain()  # restart: nothing new, nothing re-applied
    assert view.latest_version() == v
    src.append(_df(spark, [(5, "b", 50)]))
    drain()
    assert _got(spark, view) == _want(spark, src)


def test_mv_survives_uncaptured_dv_delete(spark, tmp_path):
    """DV DELETE with capture_changes=False: the feed raises, so the MV
    must resync from a snapshot — not silently drift past the delete."""
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    src.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]))
    maintain_agg_view(spark, src, view, ["grp"], "val")
    src.delete_where(spark, "id = 2", use_dv=True, capture_changes=False)
    maintain_agg_view(spark, src, view, ["grp"], "val")
    assert _got(spark, view) == _want(spark, src) == {("a", 1, 10),
                                                      ("b", 1, 5)}
    assert view.last_meta().get("mv_resync") is True


def test_mv_concurrent_commit_not_double_applied(spark, tmp_path,
                                                 monkeypatch):
    """A source commit landing between latest_version() capture and the
    feed read must NOT be applied in this refresh AND replayed in the
    next (the feed is bounded upto the captured version)."""
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    src.append(_df(spark, [(1, "a", 10)]))
    maintain_agg_view(spark, src, view, ["grp"], "val")
    src.append(_df(spark, [(2, "a", 5)]))

    real_rc = src.read_changes
    fired = {}

    def racing_rc(spark_, since_version, **kw):
        if not fired:
            fired["x"] = True
            src.append(_df(spark, [(3, "a", 100)]))  # lands mid-refresh
        return real_rc(spark_, since_version=since_version, **kw)

    monkeypatch.setattr(src, "read_changes", racing_rc)
    maintain_agg_view(spark, src, view, ["grp"], "val")
    maintain_agg_view(spark, src, view, ["grp"], "val")  # picks up id=3
    assert _got(spark, view) == _want(spark, src) == {("a", 3, 115)}


def test_mv_auto_strategy_picks_by_table_size(spark, tmp_path,
                                              monkeypatch):
    """auto = rescan under the measured crossover row count (the
    refresh's fixed cost dominates a cheap scan), incremental above
    it. Observed via whether the change feed is consulted at all."""
    import sport_advantages_moderne_data_infrastructure_spark.operators.mv as mvmod

    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    src.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))

    calls = []
    real_rc = src.read_changes

    def counting_rc(*a, **kw):
        calls.append(1)
        return real_rc(*a, **kw)

    monkeypatch.setattr(src, "read_changes", counting_rc)
    maintain_agg_view(spark, src, view, ["grp"], "val", strategy="auto")
    assert not calls  # tiny table: rescan, feed never read
    assert _got(spark, view) == _want(spark, src)

    monkeypatch.setattr(mvmod, "_AUTO_RESCAN_ROWS", 1)
    src.append(_df(spark, [(3, "a", 7)]))
    maintain_agg_view(spark, src, view, ["grp"], "val", strategy="auto")
    assert calls  # "large" table: incremental, feed consulted
    assert _got(spark, view) == _want(spark, src)


def test_mv_explicit_rescan_strategy(spark, tmp_path):
    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    src.append(_df(spark, [(1, "a", 1), (2, "b", 2)]))
    src.overwrite(_df(spark, [(9, "z", 9)]))  # non-CDF history: fine
    maintain_agg_view(spark, src, view, ["grp"], "val",
                      strategy="rescan")
    assert _got(spark, view) == _want(spark, src) == {("z", 1, 9)}
