"""Generated & identity columns on the txnlog format (r11, Delta's
GENERATED ALWAYS AS [IDENTITY] as writer features): computation and
allocation live in the WRITER, values are materialized so readers are
unaffected, allocation rides the optimistic expected-version commit so
racing writers can never hand out the same id."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.sources import txnlog as TL
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
    TxnConflictError,
    TxnProtocolError,
    TxnTable,
)

GEN_EXPR = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


def _orders(spark, n=300):
    return (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy("o_orderkey").limit(n))


def _table(tmp_path, name="t"):
    t = TxnTable(str(tmp_path / name))
    t.set_generated_column("total_cents", GEN_EXPR)
    t.set_identity_column("rid", start=1, step=1)
    return t


def test_append_allocates_contiguous_and_computes(spark, tmp_path):
    o = _orders(spark)
    t = _table(tmp_path)
    a = o.filter(F.col("o_orderkey") % 2 == 0).repartition(4)
    b = o.filter(F.col("o_orderkey") % 2 == 1).repartition(3)
    na, nb = a.count(), b.count()
    t.append(a)
    t.append(b)
    s = t.read(spark)
    got = s.agg(F.count("*"), F.countDistinct("rid"),
                F.min("rid"), F.max("rid")).first()
    assert tuple(got) == (na + nb, na + nb, 1, na + nb)
    # per-commit contiguity: batch A took exactly [1, na]
    assert (s.filter(F.col("o_orderkey") % 2 == 0)
            .agg(F.max("rid")).first()[0]) == na
    assert s.filter(
        F.col("total_cents") != F.expr(GEN_EXPR)).count() == 0


def test_strict_always_rejects_provided_columns(spark, tmp_path):
    o = _orders(spark, 20)
    t = _table(tmp_path)
    t.append(o)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.append(t.read(spark).limit(1))  # carries rid + total_cents
    with pytest.raises(ValueError, match="IDENTITY"):
        t.merge(spark, t.read(spark).drop("total_cents").limit(1),
                key="o_orderkey")


def test_merge_updates_keep_ids_inserts_allocate(spark, tmp_path):
    o = _orders(spark)
    t = _table(tmp_path)
    a = o.filter(F.col("o_orderkey") % 2 == 0)
    na = a.count()
    t.append(a)
    upd = (a.filter(F.col("o_orderkey") % 4 == 0)
           .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    new = o.filter(F.col("o_orderkey") % 2 == 1)
    nn = new.count()
    t.merge(spark, upd.unionByName(new), key="o_orderkey")
    s = t.read(spark)
    got = s.agg(F.count("*"), F.countDistinct("rid"),
                F.max("rid")).first()
    assert tuple(got) == (na + nn, na + nn, na + nn)
    # updated rows kept their pre-merge ids (all allocated in batch 1)
    assert (s.filter(F.col("o_orderkey") % 4 == 0)
            .agg(F.max("rid")).first()[0]) <= na
    # generated column recomputed on the updated rows
    assert s.filter(
        F.col("total_cents") != F.expr(GEN_EXPR)).count() == 0
    # change feed inserts carry their allocated ids
    ch = t.read_changes(spark, since_version=0)
    assert ch.filter("_change_type = 'insert' and rid is null"
                     ).count() == 0


def test_first_merge_creates_through_generation(spark, tmp_path):
    o = _orders(spark, 40)
    t = _table(tmp_path)
    t.merge(spark, o, key="o_orderkey")  # empty table: first commit
    s = t.read(spark)
    assert s.agg(F.countDistinct("rid")).first()[0] == 40
    assert s.filter(
        F.col("total_cents") != F.expr(GEN_EXPR)).count() == 0


def test_overwrite_never_reissues_ids(spark, tmp_path):
    o = _orders(spark, 60)
    t = _table(tmp_path)
    t.append(o.limit(40))
    t.overwrite(o.limit(25))
    s = t.read(spark)
    # high water survived the overwrite: fresh ids start past 40
    assert s.agg(F.min("rid")).first()[0] == 41
    assert s.agg(F.countDistinct("rid")).first()[0] == 25


def test_identity_step_and_start(spark, tmp_path):
    o = _orders(spark, 10)
    t = TxnTable(str(tmp_path / "s"))
    t.set_identity_column("rid", start=100, step=10)
    t.append(o)
    vals = sorted(r["rid"] for r in t.read(spark).select("rid").collect())
    assert vals == list(range(100, 200, 10))


def test_declaration_conflicts_rejected(tmp_path):
    t = TxnTable(str(tmp_path / "c"))
    t.set_generated_column("g", "1 + 1")
    with pytest.raises(ValueError, match="generated"):
        t.set_identity_column("g")
    t.set_identity_column("rid")
    with pytest.raises(ValueError, match="one per table"):
        t.set_identity_column("rid2")
    with pytest.raises(ValueError, match="identity"):
        t.set_generated_column("rid", "2")
    with pytest.raises(ValueError, match="step"):
        TxnTable(str(tmp_path / "z")).set_identity_column("i", step=0)


def test_writer_protocol_floor(spark, tmp_path, monkeypatch):
    """Declaring generation bumps min_writer to 2: a pre-generation
    writer must refuse to write (it would append rows with generated
    columns missing and ids unallocated) while readers stay at their
    existing floor."""
    o = _orders(spark, 10)
    t = _table(tmp_path)
    t.append(o)
    t2 = TxnTable(t.path)
    monkeypatch.setattr(TL, "_WRITER_CAPABILITY", 1)
    with pytest.raises(TxnProtocolError, match="writer"):
        t2.append(o)
    # reading is unaffected (values are plain materialized columns)
    assert t2.read(spark).count() == 10


def test_racing_allocation_conflicts_not_duplicates(spark, tmp_path):
    """The loser of a commit race must NOT publish ids computed from
    the stale high water: a competing append lands between allocation
    and commit -> the stale commit raises TxnConflictError; the public
    append() retry loop re-assigns and stays unique."""
    o = _orders(spark, 60)
    t = _table(tmp_path)
    t.append(o.limit(20))
    ident = t.generation_config()["identity"]
    v0 = t.latest_version()
    gen = t._apply_generated(o.limit(5))  # noqa: SLF001
    stale, hw_meta, handle = t._assign_identity(gen, ident)  # noqa: SLF001
    try:
        TxnTable(t.path).append(o.limit(10))  # competing writer wins
        rel = t._write_data(stale)  # noqa: SLF001
        with pytest.raises(TxnConflictError):
            t.commit([rel], [], hw_meta, expected_version=v0)
    finally:
        handle.unpersist()
    # the public path recovers: re-reads the high water, stays unique
    t.append(o.limit(5))
    s = t.read(spark)
    assert (s.agg(F.countDistinct("rid")).first()[0]
            == s.count() == 35)
    assert s.agg(F.max("rid")).first()[0] == 35


def test_streaming_append_sink_allocates_exactly_once(spark, tmp_path):
    """The JVM foreachBatch txn append sink composes with identity:
    each micro-batch allocates inside its guarded commit, a restart on
    the same checkpoint re-allocates NOTHING (the ledger skips the
    replayed commit, so the high water does not move)."""
    from sport_advantages_moderne_data_infrastructure_spark.streaming.pipeline import (
        write_stream_txn_append,
    )

    o = _orders(spark, 80).select("o_orderkey", "o_totalprice")
    src = str(tmp_path / "src")
    o.repartition(4).write.parquet(src)
    t = TxnTable(str(tmp_path / "sink"))
    t.set_identity_column("rid")

    stream = (spark.readStream.schema(o.schema)
              .option("maxFilesPerTrigger", "2").parquet(src))
    q = write_stream_txn_append(stream, t.path, str(tmp_path / "ck"))
    q.awaitTermination(120)
    q.stop()
    s1 = t.read(spark)
    n1, d1, m1 = s1.agg(F.count("*"), F.countDistinct("rid"),
                        F.max("rid")).first()
    assert n1 == 80 and d1 == 80 and m1 == 80

    q2 = write_stream_txn_append(
        (spark.readStream.schema(o.schema)
         .option("maxFilesPerTrigger", "2").parquet(src)),
        t.path, str(tmp_path / "ck"))
    q2.awaitTermination(60)
    q2.stop()
    assert t.read(spark).agg(F.max("rid")).first()[0] == 80
    assert t.read(spark).count() == 80


def test_rename_drop_guard_metadata_refs(spark, tmp_path):
    """Renaming/dropping a column that a CHECK constraint or generated
    expression references would brick every future write at expression
    resolution — the schema change must refuse with the remedy named;
    an unreferenced column still renames fine."""
    o = _orders(spark, 10)
    t = TxnTable(str(tmp_path / "g"))
    t.set_generated_column("total_cents", GEN_EXPR)
    t.set_identity_column("rid")
    t.append(o)
    t.add_check_constraint("pos_price", "o_totalprice > 0")

    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column("o_totalprice", "price")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.drop_column("o_totalprice")
    with pytest.raises(ValueError, match="generated column"):
        t.drop_column("total_cents")
    with pytest.raises(ValueError, match="identity column"):
        t.rename_column("rid", "row_id")

    t.drop_check_constraint("pos_price")
    with pytest.raises(ValueError, match="generated column"):
        # still blocked: the generated expr references o_totalprice
        t.rename_column("o_totalprice", "price")
    # an unreferenced column renames fine, and writes keep working
    t.rename_column("o_custkey", "cust")
    t.append(o.withColumnRenamed("o_custkey", "cust"))
    assert t.read(spark).count() == 20


def test_clone_carries_generation_and_high_water(spark, tmp_path):
    """CLONE of a generated/identity table: the declarations carry
    over, the clone's commit 0 seeds the source's high water (ids the
    cloned snapshot holds are never re-issued), and the min_writer
    floor rises on the clone."""
    o = _orders(spark, 30)
    t = _table(tmp_path)
    t.append(o)
    c = t.clone(str(tmp_path / "dst"))
    cfg = c.generation_config()
    assert cfg["identity"]["col"] == "rid"
    assert "total_cents" in cfg["generated"]
    c.append(o.withColumn("o_orderkey", F.col("o_orderkey") + 900_000))
    s = c.read(spark)
    assert s.agg(F.countDistinct("rid")).first()[0] == 60
    assert s.agg(F.max("rid")).first()[0] == 60  # continued past 30
    import json
    import os
    proto = json.load(open(os.path.join(c.log_dir, "protocol.json")))
    assert proto["min_writer_version"] >= 2


def test_update_where_recomputes_generated(spark, tmp_path):
    """SETting a column a generated expression reads RECOMPUTES the
    generated value in the same CASE rewrite (r12, replacing the r11
    refusal); SETting the generated/identity column itself still
    refuses; unrelated SETs and deletes are unaffected."""
    o = _orders(spark, 20)
    t = _table(tmp_path)
    t.append(o)
    with pytest.raises(ValueError, match="engine-generated"):
        t.update_where(spark, "o_orderkey = 1", {"total_cents": "0"})
    with pytest.raises(ValueError, match="engine-generated"):
        t.update_where(spark, "o_orderkey = 1", {"rid": "99"})
    t.update_where(spark, "o_orderkey <= 3",
                   {"o_totalprice": "o_totalprice * 2"})
    s = t.read(spark)
    # every row (touched or not) satisfies the generation invariant
    assert s.filter(
        F.expr(f"total_cents != {GEN_EXPR}")).count() == 0
    assert s.filter("o_orderkey <= 3").count() > 0
    # the change feed's postimages carry the RECOMPUTED value too
    ch = (t.read_changes(spark, since_version=t.latest_version() - 1)
          .filter(F.col("_change_type") == "update_postimage"))
    assert ch.count() > 0
    assert ch.filter(F.expr(f"total_cents != {GEN_EXPR}")).count() == 0
    t.update_where(spark, "o_orderkey = 1", {"o_custkey": "0"})
    assert t.read(spark).filter("o_custkey = 0").count() >= 1
    t.delete_where(spark, "o_orderkey = 1")
    assert t.read(spark).filter("o_orderkey = 1").count() == 0


def test_update_where_recompute_substitutes_simultaneously(spark,
                                                           tmp_path):
    """Two SET columns where one's RHS references the other: the
    generation rewrite substitutes both SIMULTANEOUSLY — each SET RHS
    keeps reading the pre-image, never another SET's expression."""
    t = TxnTable(str(tmp_path / "sim"))
    t.set_generated_column("s", "a + b")
    df = (_orders(spark, 4)
          .select(F.col("o_orderkey").alias("k"),
                  F.lit(10).alias("a"), F.lit(100).alias("b")))
    t.append(df)
    # post: a = b(pre) = 100, b = a(pre) + 1 = 11  ->  s = 111
    t.update_where(spark, "k = 1", {"a": "b", "b": "a + 1"})
    r = t.read(spark).filter("k = 1").first()
    assert (r["a"], r["b"], r["s"]) == (100, 11, 111)
    assert t.read(spark).filter("k != 1").filter(
        "s != a + b").count() == 0


def test_streaming_merge_sink_composes_with_identity(spark, tmp_path):
    """The streaming MERGE sink rides TxnTable.merge, so identity
    composes for free: matched keys keep their ids across update
    batches, fresh keys allocate, and the whole feed stays unique."""
    from sport_advantages_moderne_data_infrastructure_spark.streaming.pipeline import (
        write_stream_merge_txn,
    )

    o = _orders(spark, 60).select("o_orderkey", "o_totalprice")
    t = TxnTable(str(tmp_path / "tgt"))
    t.set_identity_column("rid")
    t.append(o.limit(30))

    # a feed that UPDATES the first 30 keys and INSERTS 30 new ones
    feed = (o.limit(30)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("ts", F.lit(1.0))
            .unionByName(
                o.exceptAll(o.limit(30)).withColumn("ts", F.lit(1.0))))
    src = str(tmp_path / "src")
    feed.repartition(2).write.parquet(src)
    q = write_stream_merge_txn(
        (spark.readStream.schema(feed.schema)
         .option("maxFilesPerTrigger", "1").parquet(src)),
        t.path, str(tmp_path / "ck"), key="o_orderkey",
        order_col="ts")
    q.awaitTermination(120)
    q.stop()
    s = t.read(spark)
    n, d, mx = s.agg(F.count("*"), F.countDistinct("rid"),
                     F.max("rid")).first()
    assert n == 60 and d == 60 and mx == 60
    # the original 30 keys kept their first-allocation ids
    assert (s.join(o.limit(30), "o_orderkey", "left_semi")
            .agg(F.max("rid")).first()[0]) <= 30


def test_recompute_skips_string_literals(spark, tmp_path):
    """Review r12: the post-SET substitution must not rewrite a SET
    column's NAME inside a string literal of the generation expression
    — only real column references substitute."""
    t = TxnTable(str(tmp_path / "lit"))
    t.set_generated_column(
        "label", "CONCAT('status', ': ', status)")
    df = (_orders(spark, 4)
          .select(F.col("o_orderkey").alias("k"),
                  F.lit("open").alias("status")))
    t.append(df)
    assert t.read(spark).filter("label != 'status: open'").count() == 0
    t.update_where(spark, "k = 1", {"status": "'closed'"})
    r = {row["k"]: row["label"] for row in t.read(spark).collect()}
    assert r[1] == "status: closed"
    assert all(v == "status: open" for k, v in r.items() if k != 1)
