"""Exactly-once streaming JDBC publish (streaming/jdbcsink.py) against
real embedded Derby: upsert semantics, ledger-based replay skip, and a
genuine writeStream restart on the same checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from sport_advantages_moderne_data_infrastructure_spark.sources import io
from sport_advantages_moderne_data_infrastructure_spark.streaming.jdbcsink import (
    jdbc_exactly_once_sink,
)

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url(spark, tmp_path):
    spark.sparkContext._jvm.System.setProperty(
        "derby.stream.error.file", str(tmp_path / "derby.log"))
    return f"jdbc:derby:{tmp_path}/derbydb;create=true"


def _read_target(spark, url, table):
    return (spark.read.format("jdbc").option("url", url)
            .option("dbtable", table)
            .option("driver", DERBY_PROPS["driver"]).load())


def test_upsert_publish_and_replay_skip(spark, derby_url):
    sink = jdbc_exactly_once_sink(
        spark, derby_url, "agg_out", ["g"], "appA",
        properties=DERBY_PROPS)

    b0 = spark.createDataFrame(
        [Row(g=i, cnt=10 * i) for i in range(1, 6)])
    sink(b0, 0)
    got = {r["g"]: r["cnt"] for r in
           _read_target(spark, derby_url, "agg_out").collect()}
    assert got == {i: 10 * i for i in range(1, 6)}

    # batch 1 updates keys 3-5 and adds 6: DELETE+INSERT upsert
    b1 = spark.createDataFrame(
        [Row(g=i, cnt=100 * i) for i in range(3, 7)])
    sink(b1, 1)
    got = {r["g"]: r["cnt"] for r in
           _read_target(spark, derby_url, "agg_out").collect()}
    assert got == {1: 10, 2: 20, 3: 300, 4: 400, 5: 500, 6: 600}

    # replay of batch 1 with DIFFERENT (corrupted) content: the ledger
    # row proves the batch already published, so nothing may change
    b1_replay = spark.createDataFrame([Row(g=3, cnt=-1)])
    sink(b1_replay, 1)
    got2 = {r["g"]: r["cnt"] for r in
            _read_target(spark, derby_url, "agg_out").collect()}
    assert got2 == got


def test_ledger_is_scoped_by_app_id(spark, derby_url):
    sink_a = jdbc_exactly_once_sink(
        spark, derby_url, "multi_out", ["g"], "appA",
        properties=DERBY_PROPS)
    sink_b = jdbc_exactly_once_sink(
        spark, derby_url, "multi_out", ["g"], "appB",
        properties=DERBY_PROPS)
    sink_a(spark.createDataFrame([Row(g=1, cnt=1)]), 0)
    # same batch_id, different app: must NOT be skipped
    sink_b(spark.createDataFrame([Row(g=2, cnt=2)]), 0)
    got = {r["g"]: r["cnt"] for r in
           _read_target(spark, derby_url, "multi_out").collect()}
    assert got == {1: 1, 2: 2}


def test_writestream_restart_is_exactly_once(spark, derby_url, tmp_path):
    """Real micro-batch execution: stream a parquet directory into the
    sink, then restart on the SAME checkpoint — Structured Streaming
    re-offers the last batch, the ledger absorbs it, and the target
    count must not grow."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    rows = spark.range(100).select(
        F.col("id").alias("g"), (F.col("id") * 2).alias("cnt"))
    rows.write.parquet(src)

    sink = jdbc_exactly_once_sink(
        spark, derby_url, "stream_out", ["g"], "stream1",
        properties=DERBY_PROPS)

    def run():
        q = (spark.readStream.schema(rows.schema).parquet(src)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    n1 = _read_target(spark, derby_url, "stream_out").count()
    assert n1 == 100
    run()  # restart on the same checkpoint
    n2 = _read_target(spark, derby_url, "stream_out").count()
    assert n2 == 100


def test_missing_key_column_fails_fast(spark, derby_url):
    sink = jdbc_exactly_once_sink(
        spark, derby_url, "bad_out", ["nope"], "appX",
        properties=DERBY_PROPS)
    with pytest.raises(ValueError, match="key columns"):
        sink(spark.createDataFrame([Row(g=1)]), 0)


def test_change_feed_to_mv_to_jdbc_serving_loop(spark, derby_url, tmp_path):
    """The composed replacement for the reference's serving loop
    (read_delta.py:47-53 re-aggregate + data_validation_dag.py:129
    re-INSERT into Postgres): txn source commits -> change-feed-driven
    MV refresh -> exactly-once JDBC publish of the refreshed groups.
    After every cycle the RDBMS table must equal a direct GROUP BY of
    the source snapshot, and re-publishing a cycle must change nothing."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.mv import (
        maintain_agg_view, read_agg_view,
    )
    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
        TxnTable,
    )

    src = TxnTable(str(tmp_path / "src"))
    view = TxnTable(str(tmp_path / "view"))
    sink = jdbc_exactly_once_sink(
        spark, derby_url, "served", ["grp"], "mv_serve",
        properties=DERBY_PROPS)

    def df(rows):
        return spark.createDataFrame(rows, "id int, grp string, val int")

    def want():
        return {(r.grp, r.cnt, r.sm) for r in
                src.read(spark).groupBy("grp")
                .agg(F.count(F.lit(1)).alias("cnt"),
                     F.sum("val").alias("sm")).collect()}

    def served():
        return {(r["grp"], r["cnt"], r["sm"]) for r in
                _read_target(spark, derby_url, "served").collect()}

    # cycle 0: load
    src.append(df([(1, "a", 10), (2, "a", 20), (3, "b", 5)]))
    maintain_agg_view(spark, src, view, ["grp"], "val")
    sink(read_agg_view(spark, view), 0)
    assert served() == want()

    # cycle 1: merge raises a group, adds another; publish refresh
    src.merge(spark, df([(1, "a", 100), (4, "c", 7)]), "id")
    maintain_agg_view(spark, src, view, ["grp"], "val")
    sink(read_agg_view(spark, view), 1)
    assert served() == want()

    # replay of cycle 1 (scheduler retry): ledger absorbs it
    sink(read_agg_view(spark, view), 1)
    assert served() == want()


def test_composite_and_quoted_string_keys(spark, derby_url):
    """The chunked-delete upsert must handle composite keys (OR-chain
    path) and string keys containing quotes (literal escaping)."""
    sink = jdbc_exactly_once_sink(
        spark, derby_url, "ck_out", ["k1", "k2"], "appC",
        properties=DERBY_PROPS)
    b0 = spark.createDataFrame(
        [Row(k1=1, k2="a'b", v=10), Row(k1=1, k2="plain", v=20),
         Row(k1=2, k2="a'b", v=30)])
    sink(b0, 0)
    # updates the (1, a'b) row only; (1, plain) and (2, a'b) survive
    sink(spark.createDataFrame([Row(k1=1, k2="a'b", v=99)]), 1)
    got = {(r["k1"], r["k2"]): r["v"] for r in
           _read_target(spark, derby_url, "ck_out").collect()}
    assert got == {(1, "a'b"): 99, (1, "plain"): 20, (2, "a'b"): 30}


def test_full_frame_replace(spark, derby_url):
    """full_frame=True: each publish is a complete snapshot — rows
    absent from the new frame must disappear."""
    sink = jdbc_exactly_once_sink(
        spark, derby_url, "ff_out", ["g"], "appF",
        properties=DERBY_PROPS, full_frame=True)
    sink(spark.createDataFrame([Row(g=1, cnt=1), Row(g=2, cnt=2)]), 0)
    sink(spark.createDataFrame([Row(g=2, cnt=20), Row(g=3, cnt=3)]), 1)
    got = {r["g"]: r["cnt"] for r in
           _read_target(spark, derby_url, "ff_out").collect()}
    assert got == {2: 20, 3: 3}
    # replay guard still applies
    sink(spark.createDataFrame([Row(g=9, cnt=9)]), 1)
    got2 = {r["g"]: r["cnt"] for r in
            _read_target(spark, derby_url, "ff_out").collect()}
    assert got2 == got


def test_sql_literal_temporal_and_nonfinite():
    """Temporal keys render as typed ANSI literals (implicit
    varchar->timestamp casts fail on Derby); non-finite floats have no
    valid SQL literal and must be rejected, not emitted as bare
    nan/inf tokens that abort the publish transaction."""
    import datetime
    from sport_advantages_moderne_data_infrastructure_spark.streaming.jdbcsink import (  # noqa: E501
        _sql_literal,
    )
    assert _sql_literal(datetime.date(2024, 3, 1)) == "{d '2024-03-01'}"
    assert _sql_literal(
        datetime.datetime(2024, 3, 1, 12, 30, 5)
    ) == "{ts '2024-03-01 12:30:05'}"
    assert _sql_literal(
        datetime.datetime(2024, 3, 1, 12, 30, 5, 250000)
    ) == "{ts '2024-03-01 12:30:05.250000'}"
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="non-finite"):
            _sql_literal(bad)


def test_execute_tolerant_exact_sqlstate(spark, derby_url):
    """Exists-races tolerate by EXACT SQLState off the Java cause
    chain; an unrelated failure whose message text happens to contain
    a state code must still raise."""
    from sport_advantages_moderne_data_infrastructure_spark.streaming.jdbcsink import (  # noqa: E501
        _connect, _execute_tolerant, _sqlstate,
    )
    conn = _connect(spark, derby_url, DERBY_PROPS["driver"])
    try:
        _execute_tolerant(conn, 'CREATE TABLE "tol_t" (i INT)')
        _execute_tolerant(conn, 'CREATE TABLE "tol_t" (i INT)')  # X0Y32
        # a syntax error naming an exists-state in its MESSAGE must
        # not be swallowed (old substring matching would eat it)
        with pytest.raises(Exception):
            _execute_tolerant(conn, 'CREATE TABLE "X0Y32 42P07"')
        # and the state extractor sees the real code, not message text
        try:
            st = conn.createStatement()
            st.execute('CREATE TABLE "tol_t" (i INT)')
        except Exception as e:
            assert _sqlstate(e) == "X0Y32"
        finally:
            st.close()
    finally:
        conn.close()


def test_staging_join_strategy_upserts(spark, derby_url):
    """The set-based staging-join DELETE (ANSI EXISTS form on Derby)
    publishes the same upsert result as the inlist path — it is the
    no-driver-collect plan Postgres/MySQL get by default."""
    sink = jdbc_exactly_once_sink(
        spark, derby_url, "sj_out", ["g"], "appSJ",
        properties=DERBY_PROPS, upsert_strategy="staging_join")
    sink(spark.createDataFrame([Row(g=i, cnt=10 * i)
                                for i in range(1, 5)]), 0)
    sink(spark.createDataFrame([Row(g=i, cnt=100 * i)
                                for i in range(3, 6)]), 1)
    got = {r["g"]: r["cnt"] for r in
           _read_target(spark, derby_url, "sj_out").collect()}
    assert got == {1: 10, 2: 20, 3: 300, 4: 400, 5: 500}


def test_inlist_key_cap_falls_back_to_staging_join(spark, derby_url):
    """A batch with more distinct keys than max_inlist_keys must not
    collect them all to the driver — it falls back to the set-based
    DELETE and still publishes correctly."""
    sink = jdbc_exactly_once_sink(
        spark, derby_url, "cap_out", ["g"], "appCap",
        properties=DERBY_PROPS, max_inlist_keys=3)
    sink(spark.createDataFrame([Row(g=i, cnt=i) for i in range(10)]), 0)
    sink(spark.createDataFrame([Row(g=i, cnt=-i) for i in range(10)]), 1)
    got = {r["g"]: r["cnt"] for r in
           _read_target(spark, derby_url, "cap_out").collect()}
    assert got == {i: -i for i in range(10)}


def test_temporal_key_upsert_roundtrip(spark, derby_url):
    """Date-keyed publish through the inlist path: the typed DATE
    literal must compare against Derby's DATE column (the quoted-string
    fallback relied on an implicit cast Derby rejects)."""
    import datetime
    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)
    sink = jdbc_exactly_once_sink(
        spark, derby_url, "dt_out", ["d"], "appDT",
        properties=DERBY_PROPS)
    sink(spark.createDataFrame([Row(d=d1, cnt=1), Row(d=d2, cnt=2)]), 0)
    sink(spark.createDataFrame([Row(d=d2, cnt=20)]), 1)
    got = {r["d"]: r["cnt"] for r in
           _read_target(spark, derby_url, "dt_out").collect()}
    assert got == {d1: 1, d2: 20}


def test_unknown_strategy_rejected(spark, derby_url):
    with pytest.raises(ValueError, match="upsert_strategy"):
        jdbc_exactly_once_sink(spark, derby_url, "x", ["g"], "a",
                               upsert_strategy="merge")


def test_staging_join_delete_sql_per_dialect_snapshots():
    """Pin the generated set-based DELETE per dialect (r7 verdict #6:
    the postgres/mysql strings are dialect-selected but only Derby
    executes in-env). MySQL must get backtick identifiers and CAST AS
    CHAR for LOB keys — default-config MySQL rejects ANSI double
    quotes and CAST AS VARCHAR; Postgres/ANSI keep double quotes."""
    from sport_advantages_moderne_data_infrastructure_spark.streaming.jdbcsink import (  # noqa: E501
        _lob_key_cast,
        _quote_ident,
        _staging_join_delete,
    )

    def qkey_for(dialect, lob_keys=()):
        def _qkey(qual, k):
            ref = f"{qual}.{_quote_ident(dialect, k)}"
            return (_lob_key_cast(dialect, ref) if k in lob_keys
                    else ref)
        return _qkey

    assert _staging_join_delete(
        "postgresql", "tgt", "stg", ["k"], qkey_for("postgresql")) == (
        'DELETE FROM tgt t USING stg s WHERE t."k" = s."k"')
    assert _staging_join_delete(
        "mysql", "tgt", "stg", ["k"], qkey_for("mysql")) == (
        "DELETE t FROM tgt t JOIN stg s ON t.`k` = s.`k`")
    # ANSI EXISTS fallback (what Derby executes through the key cap)
    assert _staging_join_delete(
        "derby", "tgt", "stg", ["k"], qkey_for("derby")) == (
        'DELETE FROM tgt WHERE EXISTS '
        '(SELECT 1 FROM stg s WHERE s."k" = tgt."k")')
    # composite + LOB-typed key: per-dialect cast form
    assert _staging_join_delete(
        "mysql", "tgt", "stg", ["k", "name"],
        qkey_for("mysql", lob_keys={"name"})) == (
        "DELETE t FROM tgt t JOIN stg s ON t.`k` = s.`k` AND "
        "CAST(t.`name` AS CHAR) = CAST(s.`name` AS CHAR)")
    assert _staging_join_delete(
        "postgresql", "tgt", "stg", ["k", "name"],
        qkey_for("postgresql", lob_keys={"name"})) == (
        'DELETE FROM tgt t USING stg s WHERE t."k" = s."k" AND '
        'CAST(t."name" AS VARCHAR(32672)) = '
        'CAST(s."name" AS VARCHAR(32672))')


def test_quote_ident_escapes_embedded_quotes():
    from sport_advantages_moderne_data_infrastructure_spark.streaming.jdbcsink import (  # noqa: E501
        _quote_ident,
    )

    assert _quote_ident("mysql", 'we`ird') == "`we``ird`"
    assert _quote_ident("postgresql", 'we"ird') == '"we""ird"'
