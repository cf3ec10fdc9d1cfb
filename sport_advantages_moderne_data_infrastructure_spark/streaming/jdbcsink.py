"""Exactly-once streaming publish into an RDBMS (K3 streaming leg).

The reference serves its aggregates to Postgres with plain re-INSERTs —
an Airflow task writes `INSERT INTO sport_advantages.sport_activities`
rows on every validation cycle (airflow/dags/data_validation_dag.py:129)
and the batch loader is a psycopg2 ``execute_values`` loop
(commute_validation/sql_scripts.py:104-148). Neither is idempotent: a
retried task or a restarted consumer writes the same rows again.

This module is the Structured-Streaming-correct version, the standard
two-phase pattern for publishing micro-batches into a transactional
store that Spark cannot write atomically:

1. **Bulk leg (executor-parallel):** the micro-batch lands in a
   per-target STAGING table via ``df.write.jdbc`` — Spark's partitioned
   bulk path, so the data volume never funnels through the driver. At
   100 TB-pipeline scale the published frames are aggregates (an MV, a
   quality report), but the pattern holds for any size the RDBMS can
   absorb: the heavy bytes move on the cluster side.
2. **Publish leg (one driver-side transaction):** DELETE the target
   rows whose keys appear in staging, INSERT the staging rows, and
   record ``(app_id, batch_id)`` in a ledger table — all in ONE
   transaction. Micro-batch replay (Structured Streaming re-offers the
   last uncommitted batch after a restart) hits the ledger row and
   skips; a crash between the staging write and the publish leaves only
   staging garbage that the replayed batch overwrites.

The upsert is DELETE+INSERT by key, with the DELETE as BATCHED point
deletes on an index the sink creates with the target (portable — every
JDBC engine executes indexed point deletes well, while a correlated
EXISTS/IN-subquery DELETE measured MINUTES for a 100k-key re-publish on
Derby, whose optimizer re-runs the subquery per row; MERGE would be
dialect-specific). ``full_frame=True`` (a complete-snapshot publisher,
e.g. a materialized view) short-circuits to an unqualified DELETE +
INSERT. Either way re-publishing a frame is idempotent even before the
ledger check.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

LEDGER_TABLE = "stream_sink_ledger"

# Derby signals "table already exists" with SQLState X0Y32; Postgres uses
# 42P07, MySQL 42S01. Creation is CREATE-then-tolerate because neither
# ANSI SQL nor Derby has CREATE TABLE IF NOT EXISTS.
_EXISTS_STATES = {"X0Y32", "42P07", "42S01"}


def _connect(spark: SparkSession, url: str, driver: str | None):
    jvm = spark.sparkContext._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    return jvm.java.sql.DriverManager.getConnection(url)


def _sqlstate(exc) -> str | None:
    """The real SQLState off a py4j-wrapped SQLException, walking the
    Java cause chain — NOT a substring match over the stringified
    exception, which would also match a state code appearing in an
    unrelated error's message text (a quoted identifier, wrapped cause
    prose) and silently swallow a genuine failure."""
    je = getattr(exc, "java_exception", None)
    seen = 0
    while je is not None and seen < 8:
        try:
            st = je.getSQLState()
        except Exception:
            st = None
        if st:
            return str(st)
        try:
            je = je.getCause()
        except Exception:
            return None
        seen += 1
    return None


def _execute_tolerant(conn, sql: str) -> None:
    """Run DDL, tolerating only already-exists races (by exact
    SQLState, never message substring)."""
    st = conn.createStatement()
    try:
        st.execute(sql)
    except Exception as e:  # py4j wraps java.sql.SQLException
        if _sqlstate(e) not in _EXISTS_STATES:
            raise
    finally:
        st.close()


def _sql_literal(v) -> str:
    """Render a key value as a SQL literal (keys are equality-compared,
    so only scalar types appear; strings escape embedded quotes).
    Temporal keys render as typed JDBC escape literals — relying on an
    implicit varchar→timestamp comparison cast fails on Derby — and
    non-finite floats are rejected outright: repr() would emit the
    bare tokens ``nan``/``inf``, invalid SQL that aborts the publish
    transaction (and NaN never equals itself as an upsert key anyway)."""
    if v is None:
        return "NULL"  # never matches under =; NULL-keyed rows append
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float) and not math.isfinite(v):
        raise ValueError(f"non-finite float {v!r} is not usable as an "
                         "upsert key (no valid SQL literal; NaN does "
                         "not equal itself under =)")
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    # JDBC escape literals: expanded by every driver's Statement (Derby
    # rejects the ANSI DATE '...' prefix form outright)
    if isinstance(v, datetime.datetime):
        base = v.strftime("%Y-%m-%d %H:%M:%S")
        frac = f".{v.microsecond:06d}" if v.microsecond else ""
        return "{ts '" + base + frac + "'}"
    if isinstance(v, datetime.date):
        return "{d '" + v.isoformat() + "'}"
    return "'" + str(v).replace("'", "''") + "'"


def _dialect(url: str) -> str:
    """Engine family off the JDBC URL (``jdbc:postgresql://...`` →
    ``postgresql``) — picks the upsert DELETE strategy."""
    parts = url.split(":")
    return parts[1].lower() if len(parts) > 1 and parts[0] == "jdbc" \
        else "unknown"


def _quote_ident(dialect: str, name: str) -> str:
    """Dialect-correct identifier quoting. Default-config MySQL (no
    ANSI_QUOTES) rejects double-quoted identifiers — it wants
    backticks, the same convention Spark's own JDBC writer uses there;
    everyone else takes the ANSI double-quote form."""
    if dialect == "mysql":
        return "`" + name.replace("`", "``") + "`"
    return '"' + name.replace('"', '""') + '"'


def _lob_key_cast(dialect: str, ref: str) -> str:
    """Equality-comparable cast for a LOB-typed key reference. MySQL
    has no ``CAST(... AS VARCHAR)`` — ``CHAR`` is its string cast
    target; ANSI engines take VARCHAR (sized for Derby's max)."""
    if dialect == "mysql":
        return f"CAST({ref} AS CHAR)"
    return f"CAST({ref} AS VARCHAR(32672))"


def _staging_join_delete(dialect: str, target: str, staging: str,
                         key_cols: list[str], qkey) -> str:
    """One set-based DELETE of target rows whose keys appear in
    staging. Engines with hash-join DELETE support get their native
    join form (Postgres ``USING``, MySQL multi-table ``JOIN``) — the
    right plan at any key cardinality, and it never collects keys to
    the driver. The ANSI ``EXISTS`` fallback is correct everywhere but
    slow on Derby (its planner re-runs the subquery per target row —
    measured minutes at 100k keys, PLANS.md §JDBC publish), so Derby
    only reaches it through the key-cap guard."""
    if dialect == "postgresql":
        on = " AND ".join(f"{qkey('t', k)} = {qkey('s', k)}"
                          for k in key_cols)
        return f"DELETE FROM {target} t USING {staging} s WHERE {on}"
    if dialect == "mysql":
        on = " AND ".join(f"{qkey('t', k)} = {qkey('s', k)}"
                          for k in key_cols)
        return f"DELETE t FROM {target} t JOIN {staging} s ON {on}"
    on = " AND ".join(f"{qkey('s', k)} = {qkey(target, k)}"
                      for k in key_cols)
    return (f"DELETE FROM {target} WHERE EXISTS "
            f"(SELECT 1 FROM {staging} s WHERE {on})")


def _chunked_deletes(target: str, key_cols: list[str], rows,
                     key_ref, chunk: int = 1000):
    """Yield DELETE statements covering ``rows`` in ``chunk``-key
    pieces: single-column keys as literal IN-lists (index multi-probe
    on every engine), composite keys as OR-chains of conjunctions."""
    for i in range(0, len(rows), chunk):
        part = rows[i:i + chunk]
        if len(key_cols) == 1:
            k = key_cols[0]
            lits = ", ".join(_sql_literal(r[k]) for r in part)
            yield (f"DELETE FROM {target} WHERE "
                   f"{key_ref(k)} IN ({lits})")
        else:
            preds = " OR ".join(
                "(" + " AND ".join(
                    f"{key_ref(k)} = {_sql_literal(r[k])}"
                    for k in key_cols) + ")"
                for r in part)
            yield f"DELETE FROM {target} WHERE {preds}"


def jdbc_exactly_once_sink(
        spark: SparkSession, url: str, target: str, key_cols: list[str],
        app_id: str, properties: dict | None = None,
        ledger: str = LEDGER_TABLE,
        full_frame: bool = False,
        upsert_strategy: str = "auto",
        max_inlist_keys: int = 200_000) -> Callable[[DataFrame, int],
                                                    None]:
    """Build a ``foreachBatch`` callable publishing each micro-batch into
    JDBC table ``target`` exactly once, upserting on ``key_cols``.

    ``app_id`` scopes the ledger the way the txnlog sink's ``txnAppId``
    does: two different streams publishing into one target never collide
    on batch ids. ``full_frame=True`` declares that every published
    frame is a COMPLETE snapshot (e.g. the whole materialized view):
    the upsert then becomes an unqualified DELETE + INSERT — the fast
    path for serving aggregates, and the semantics are identical
    because a full frame supersedes every prior row.

    ``upsert_strategy`` selects how target rows matching staged keys
    are deleted: ``"staging_join"`` — one set-based DELETE joining the
    staging table (no driver collect at all; the right plan on engines
    whose planner hash-joins DELETEs); ``"inlist"`` — chunked literal
    IN-list / OR-chain deletes probing the key index (measured fastest
    on Derby, whose planner re-runs join subqueries per row); or
    ``"auto"`` — staging_join for postgresql/mysql, inlist otherwise.
    The inlist path collects distinct batch keys to the driver, so it
    is capped at ``max_inlist_keys``: a batch carrying more distinct
    keys falls back to the set-based staging-join DELETE (correct
    everywhere, slow on Derby) — publishers whose frames are complete
    snapshots should pass ``full_frame=True`` instead and skip key
    matching entirely. Usage::

        sink = jdbc_exactly_once_sink(spark, url, "agg_out", ["g"], "q1",
                                      properties=DERBY_PROPS)
        df.writeStream.foreachBatch(sink).option("checkpointLocation", ck)
    """
    if upsert_strategy not in ("auto", "staging_join", "inlist"):
        raise ValueError(f"unknown upsert_strategy: {upsert_strategy!r}")
    props = dict(properties or {})
    dialect = _dialect(url)
    if upsert_strategy == "auto":
        upsert_strategy = ("staging_join"
                           if dialect in ("postgresql", "mysql")
                           else "inlist")
    # staging is scoped per (target, app): two streams publishing into
    # one target never overwrite each other's in-flight staging rows
    # (their publish transactions still serialize at the RDBMS)
    app_slug = "".join(c if c.isalnum() else "_" for c in app_id)[:32]
    staging = f"{target}_stg_{app_slug}"
    driver = props.get("driver")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        cols = list(batch_df.columns)
        missing = [k for k in key_cols if k not in cols]
        if missing:
            raise ValueError(f"key columns {missing} not in batch "
                             f"columns {cols}")
        conn = _connect(spark, url, driver)
        try:
            conn.setAutoCommit(True)
            _execute_tolerant(
                conn, f"CREATE TABLE {ledger} (app_id VARCHAR(128), "
                      "batch_id BIGINT)")
            # replay guard: the ledger row commits in the SAME
            # transaction as the published rows, so seeing it here means
            # this batch's rows are fully in the target
            ps = conn.prepareStatement(
                f"SELECT 1 FROM {ledger} WHERE app_id = ? AND "
                "batch_id = ?")
            ps.setString(1, app_id)
            ps.setLong(2, batch_id)
            rs = ps.executeQuery()
            seen = rs.next()
            rs.close()
            ps.close()
            if seen:
                return

            # bulk leg: executor-parallel staging write (overwrite drops
            # any half-written staging from a crashed prior attempt)
            batch_df.write.jdbc(url=url, table=staging, mode="overwrite",
                                properties=props)

            # publish leg: one transaction — upsert + ledger row
            conn.setAutoCommit(False)
            try:
                _execute_tolerant(
                    conn, f"CREATE TABLE {target} AS SELECT * FROM "
                          f"{staging} WITH NO DATA")
                # without an index on the upsert key, the DELETE's
                # correlated EXISTS degrades to an O(target × staging)
                # scan (measured: a 100k-key re-publish on unindexed
                # Derby runs minutes; indexed it is seconds). Real
                # targets want this index anyway — create it with the
                # table, tolerating both exists-races and non-indexable
                # key types (LOB keys fall back to the scan plan).
                idx_cols = ", ".join(_quote_ident(dialect, k)
                                     for k in key_cols)
                try:
                    _execute_tolerant(
                        conn, f"CREATE INDEX {target}_upsert_key ON "
                              f"{target} ({idx_cols})")
                except Exception:
                    pass
                # Spark's JDBC writer creates columns as QUOTED (and so
                # case-sensitive) identifiers — every data-column
                # reference must quote the exact DataFrame column name.
                # Spark also maps StringType to CLOB on Derby, and LOBs
                # are not equality-comparable: key columns of LOB type
                # compare through a VARCHAR cast (no-op on engines that
                # map strings to TEXT/VARCHAR already).
                lob_types = {2005, 2011, -1}  # CLOB, NCLOB, LONGVARCHAR
                st = conn.createStatement()
                rs = st.executeQuery(
                    f"SELECT * FROM {staging} WHERE 1=0")
                md = rs.getMetaData()
                coltype = {md.getColumnName(i + 1): md.getColumnType(i + 1)
                           for i in range(md.getColumnCount())}
                rs.close()
                st.close()

                def _key(k: str) -> str:
                    ref = _quote_ident(dialect, k)
                    if coltype.get(k) in lob_types:
                        return _lob_key_cast(dialect, ref)
                    return ref

                def _qkey(qual: str, k: str) -> str:
                    ref = f"{qual}.{_quote_ident(dialect, k)}"
                    if coltype.get(k) in lob_types:
                        return _lob_key_cast(dialect, ref)
                    return ref

                st = conn.createStatement()
                try:
                    if full_frame:
                        # a complete snapshot supersedes every prior
                        # row: unqualified DELETE, no key matching
                        st.executeUpdate(f"DELETE FROM {target}")
                    elif upsert_strategy == "staging_join":
                        # one set-based DELETE joining staging — no
                        # key collect; engines that hash-join DELETEs
                        # (Postgres USING, MySQL JOIN) do this well at
                        # any key cardinality
                        st.executeUpdate(_staging_join_delete(
                            dialect, target, staging, key_cols, _qkey))
                    else:
                        # Per-key delete as CHUNKED literal IN-list /
                        # OR-chain deletes on the key index — NOT a
                        # correlated-subquery DELETE (Derby re-executes
                        # an EXISTS/IN subquery per target row: minutes
                        # for a 100k-key re-publish) and NOT a JDBC
                        # PreparedStatement batch (per-row py4j calls:
                        # ~35 s for 100k keys). The distinct keys come
                        # out of SPARK in one BOUNDED collect — capped
                        # at max_inlist_keys (limit cap+1, so driver
                        # memory is bounded even when the batch carries
                        # millions of keys); over the cap it falls back
                        # to the set-based staging-join DELETE. Each
                        # statement deletes 1000 keys via index probes;
                        # the bulk ROWS still move executor-parallel
                        # in the staging write.
                        keys = (batch_df.select(*key_cols).distinct()
                                .limit(max_inlist_keys + 1).collect())
                        if len(keys) > max_inlist_keys:
                            st.executeUpdate(_staging_join_delete(
                                dialect, target, staging, key_cols,
                                _qkey))
                        else:
                            for sql in _chunked_deletes(
                                    target, key_cols, keys, _key):
                                st.executeUpdate(sql)
                    col_list = ", ".join(_quote_ident(dialect, c)
                                         for c in cols)
                    st.executeUpdate(
                        f"INSERT INTO {target} ({col_list}) "
                        f"SELECT {col_list} FROM {staging}")
                finally:
                    st.close()
                ps = conn.prepareStatement(
                    f"INSERT INTO {ledger} (app_id, batch_id) "
                    "VALUES (?, ?)")
                ps.setString(1, app_id)
                ps.setLong(2, batch_id)
                ps.executeUpdate()
                ps.close()
                conn.commit()
            except Exception:
                conn.rollback()
                raise
        finally:
            conn.close()

    return _sink
