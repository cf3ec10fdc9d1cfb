"""_delta_log interop (r13, VERDICT r12 missing #3): export a txn
table's history as a Delta-protocol JSON log and read Delta-format
directories with plain Spark (no delta jars). Reference anchor: the
reference's Delta sink/consumer pair (spark/SaveDelta.scala:157-163,
airflow/config/read_delta.py:219-222) — this is the boundary a real
deployment swaps at."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.sources.deltainterop import (
    export_delta_log,
    read_delta_dir,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
    TxnTable,
)


def _orders(spark, n=120):
    return (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .select("o_orderkey", "o_totalprice", "o_orderdate")
            .orderBy("o_orderkey").limit(n))


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_export_roundtrip_plain_table(spark, tmp_path):
    """append → delete (rewrite) → overwrite history exports one JSON
    commit per txn version; the pure-Spark reader reproduces every
    version's snapshot (Delta version numbers == txn versions)."""
    o = _orders(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.append(o.limit(80))
    t.append(o.offset(80))
    t.delete_where(spark, "o_orderkey % 7 = 0")  # rewrite mode (no DV)
    log_dir = export_delta_log(t)
    names = sorted(os.listdir(log_dir))
    assert names == [f"{v:020d}.json" for v in range(3)]
    # commit 0 carries protocol + metaData
    with open(os.path.join(log_dir, names[0])) as fh:
        kinds = [next(iter(json.loads(ln))) for ln in fh if ln.strip()]
    assert kinds[0] == "protocol" and "metaData" in kinds
    got = read_delta_dir(spark, t.path)
    assert _rows(got.select("o_orderkey", "o_totalprice")) == _rows(
        t.read(spark).select("o_orderkey", "o_totalprice"))
    # time travel through the exported log matches txn time travel
    for v in (0, 1, 2):
        assert read_delta_dir(spark, t.path, version=v).count() \
            == t.read(spark, version=v).count()


def test_export_roundtrip_partitioned_generated(spark, tmp_path):
    """Partition-by-generated layout: add actions carry decoded
    partitionValues, metaData carries partitionColumns + the generated
    expression in field metadata, and the reader re-attaches the key
    from the log via one broadcast mapping (values match the engine's
    own read bit-for-bit)."""
    o = _orders(spark)
    t = TxnTable(str(tmp_path / "p"))
    t.set_generated_column("order_month",
                           "DATE_FORMAT(o_orderdate, 'yyyy-MM')")
    t.set_partition_column("order_month")
    t.append(o)
    t.overwrite_partitions(
        o.limit(30).withColumn("o_totalprice",
                               F.col("o_totalprice") * 2),
        "order_month")
    log_dir = export_delta_log(t)
    meta = None
    with open(os.path.join(log_dir, f"{0:020d}.json")) as fh:
        for ln in fh:
            a = json.loads(ln)
            if "metaData" in a:
                meta = a["metaData"]
            if "add" in a:
                assert set(a["add"]["partitionValues"]) == {
                    "order_month"}
    assert meta is not None
    assert meta["partitionColumns"] == ["order_month"]
    fields = {f["name"]: f
              for f in json.loads(meta["schemaString"])["fields"]}
    assert "order_month" in fields
    assert fields["order_month"]["type"] == "string"  # recorded type
    assert (fields["order_month"].get("metadata", {})
            .get("delta.generationExpression")
            == "DATE_FORMAT(o_orderdate, 'yyyy-MM')")
    got = read_delta_dir(spark, t.path)
    want = t.read(spark)
    cols = ["o_orderkey", "o_totalprice"]
    assert _rows(got.select(*cols)) == _rows(want.select(*cols))
    assert _rows(got.select(
        "o_orderkey", F.col("order_month").cast("string"))) == _rows(
        want.select("o_orderkey", F.col("order_month").cast("string")))


def test_export_refusals_are_loud(spark, tmp_path):
    """DV-bearing and column-mapped snapshots refuse to export with a
    remedial hint — silently dropping the mask or the mapping would
    corrupt the foreign reader's view."""
    o = _orders(spark, 40)
    t = TxnTable(str(tmp_path / "dv"))
    t.append(o)
    t.delete_where(spark, "o_orderkey % 3 = 0", use_dv=True)
    with pytest.raises(ValueError, match="deletion vectors"):
        export_delta_log(t)
    # materialize_dvs: ONE export-only OPTIMIZE commit swaps the
    # masked dirs — the txn table keeps its DVs and version count
    v_txn = t.latest_version()
    export_delta_log(t, spark, materialize_dvs=True)
    got = read_delta_dir(spark, t.path)
    assert got.filter("o_orderkey % 3 = 0").count() == 0
    assert got.count() == t.read(spark).count()
    assert t.latest_version() == v_txn          # txn untouched
    assert t.snapshot_dvs()                     # DVs still live
    # pre-materialization version through the exported log: unmasked
    # (the documented DV-era caveat)
    assert read_delta_dir(spark, t.path, version=v_txn).count() == 40
    # a full compact still works as the alternative
    t.compact(spark)
    export_delta_log(t)
    got2 = read_delta_dir(spark, t.path)
    assert got2.count() == t.read(spark).count()
    assert got2.filter("o_orderkey % 3 = 0").count() == 0

    m = TxnTable(str(tmp_path / "cm"))
    m.append(o)
    m.rename_column("o_totalprice", "price")
    with pytest.raises(ValueError, match="column mapping"):
        export_delta_log(m)


def test_reader_handles_foreign_log_and_checkpoint(spark, tmp_path):
    """A hand-built Delta dir shaped like real delta-spark output —
    hive-style paths, a single-part parquet CHECKPOINT, JSON commits
    after it, an add superseded by a remove — reads correctly: the
    checkpoint supplies the base state, the JSON tail replays over it,
    and the partition column comes back typed from partitionValues."""
    from pyspark.sql.types import StructType

    root = str(tmp_path / "foreign")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    schema = StructType.fromJson(json.loads(
        '{"type":"struct","fields":['
        '{"name":"id","type":"long","nullable":true,"metadata":{}},'
        '{"name":"v","type":"double","nullable":true,"metadata":{}},'
        '{"name":"day","type":"integer","nullable":true,"metadata":{}}'
        ']}'))
    meta = {"id": "x", "format": {"provider": "parquet"},
            "schemaString": json.dumps(schema.jsonValue()),
            "partitionColumns": ["day"],
            "configuration": {"delta.appendOnly": "false"}}

    def write_part(name, rows):
        d = os.path.join(root, os.path.dirname(name))
        os.makedirs(d, exist_ok=True)
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.table({"id": pa.array(
            [r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.float64())}),
            os.path.join(root, name))
        return name

    f0 = write_part("day=1/part-000.parquet", [(1, 1.0), (2, 2.0)])
    f1 = write_part("day=2/part-001.parquet", [(3, 3.0)])
    f2 = write_part("day=2/part-002.parquet", [(4, 4.0)])
    f3 = write_part("day=3/part-003.parquet", [(5, 5.0)])

    def add(p, day):
        return {"add": {"path": p, "partitionValues": {"day": str(day)},
                        "size": os.path.getsize(os.path.join(root, p)),
                        "modificationTime": 0, "dataChange": True}}

    # v0: metaData + f0,f1   v1 (CHECKPOINTED): + f2
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        fh.write(json.dumps(add(f0, 1)) + "\n")
        fh.write(json.dumps(add(f1, 2)) + "\n")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps(add(f2, 2)) + "\n")
    # checkpoint at v1: the v0+v1 action state as plain parquet — built
    # the way real writers build it (actions as one struct-typed frame)
    cpdf = spark.read.json([os.path.join(log, f"{0:020d}.json"),
                            os.path.join(log, f"{1:020d}.json")])
    cpdf.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "cp"))
    import glob as g
    import shutil
    shutil.copy(
        g.glob(str(tmp_path / "cp" / "part-*.parquet"))[0],
        os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    # v2 (JSON tail past the checkpoint): remove f1, add f3
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"remove": {
            "path": f1, "deletionTimestamp": 0,
            "dataChange": True}}) + "\n")
        fh.write(json.dumps(add(f3, 3)) + "\n")

    got = read_delta_dir(spark, root)
    assert dict(got.dtypes)["day"] == "int"
    assert _rows(got) == {(1, 1.0, 1), (2, 2.0, 1), (4, 4.0, 2),
                          (5, 5.0, 3)}
    # version param: at v1 f1 is still live, f3 absent
    assert _rows(read_delta_dir(spark, root, version=1)) == {
        (1, 1.0, 1), (2, 2.0, 1), (3, 3.0, 2), (4, 4.0, 2)}
    # DV-bearing adds refuse rather than resurrect deleted rows
    with open(os.path.join(log, f"{3:020d}.json"), "w") as fh:
        a = add(f3, 3)
        a["add"]["deletionVector"] = {"storageType": "u"}
        fh.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="deletion vector"):
        read_delta_dir(spark, root)


def test_reader_empty_and_retrofit_layouts(spark, tmp_path):
    """A fully-removed log reads as an empty frame of the declared
    schema; a repartition_table retrofit exports with the LAST metaData
    carrying the new layout and the reader follows it."""
    o = _orders(spark, 50)
    t = TxnTable(str(tmp_path / "r"))
    t.append(o)
    t.set_generated_column("order_month",
                           "DATE_FORMAT(o_orderdate, 'yyyy-MM')")
    t.repartition_table(spark, "order_month")
    export_delta_log(t)
    got = read_delta_dir(spark, t.path)
    assert got.count() == 50
    assert "order_month" in got.columns
    assert _rows(got.select("o_orderkey", F.col("order_month")
                            .cast("string"))) == _rows(
        t.read(spark).select("o_orderkey", F.col("order_month")
                             .cast("string")))
    # pre-retrofit version through the exported log: plain layout
    v0 = read_delta_dir(spark, t.path, version=0)
    assert v0.count() == 50

    e = TxnTable(str(tmp_path / "e"))
    e.append(o.limit(10))
    e.delete_where(spark, "o_orderkey IS NOT NULL")  # purge everything
    export_delta_log(e)
    empty = read_delta_dir(spark, e.path)
    assert empty.count() == 0
    assert "o_orderkey" in empty.columns


def test_export_checkpoint_and_log_retention(spark, tmp_path):
    """export_delta_checkpoint writes a single-part parquet checkpoint
    + _last_checkpoint at the latest version; the reader then plans
    from it, so JSON commits at/below the checkpoint can be cleaned up
    (Delta's logRetentionDuration) without losing the snapshot."""
    from sport_advantages_moderne_data_infrastructure_spark.sources.deltainterop import (
        export_delta_checkpoint,
    )

    o = _orders(spark, 90)
    t = TxnTable(str(tmp_path / "cp"))
    t.append(o.limit(30))
    t.append(o.offset(30).limit(30))
    t.delete_where(spark, "o_orderkey % 5 = 0")
    export_delta_log(t)
    want = _rows(t.read(spark).select("o_orderkey", "o_totalprice"))

    cp = export_delta_checkpoint(spark, t.path)
    log = os.path.join(t.path, "_delta_log")
    assert os.path.basename(cp) == f"{2:020d}.checkpoint.parquet"
    last = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert last["version"] == 2
    # simulate log retention: drop every JSON commit the checkpoint
    # covers — the snapshot must survive on checkpoint state alone
    for v in range(3):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    got = read_delta_dir(spark, t.path)
    assert _rows(got.select("o_orderkey", "o_totalprice")) == want
    # a new export tail past the checkpoint keeps composing
    t.append(o.offset(60))
    export_delta_log(t)  # rewrites the full log; v3 is the new tail
    got2 = read_delta_dir(spark, t.path)
    assert got2.count() == t.read(spark).count()


def test_export_schema_evolving_partitioned_overwrite(spark, tmp_path):
    """Schema evolution on a PARTITIONED table rides overwrite() of
    the evolved shape (merge_schema appends are refused on declared
    layouts), and a partitioned commit records no doc schema (the key
    lives in the path) — the exporter must merge the adds' footer
    struct over the carried schema so the widened column reaches
    metaData instead of being silently dropped."""
    o = _orders(spark, 60)
    t = TxnTable(str(tmp_path / "evo"))
    t.set_generated_column("order_month",
                           "DATE_FORMAT(o_orderdate, 'yyyy-MM')")
    t.set_partition_column("order_month")
    t.append(o.limit(30))
    t.overwrite(o.withColumn(
        "note", F.concat(F.lit("n"), F.col("o_orderkey"))))
    export_delta_log(t)
    got = read_delta_dir(spark, t.path)
    assert "note" in got.columns
    assert got.filter("note IS NOT NULL").count() == 60
    assert got.count() == 60
    # the pre-evolution version still reads with its own (narrower)
    # metaData through the exported log
    v0 = read_delta_dir(spark, t.path, version=0)
    assert "note" not in v0.columns and v0.count() == 30


def test_reader_name_mode_column_mapping(spark, tmp_path):
    """A foreign Delta table with columnMapping.mode=name (the shape
    every renamed/dropped-column Delta table has): files carry
    PHYSICAL col-<uuid> names, partitionValues key physically, and the
    reader renames back through the schema's field metadata."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "cmname")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    schema_json = {
        "type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName":
                              "col-aaa"}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName":
                              "col-bbb"}},
            {"name": "day", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName":
                              "col-ccc"}},
        ]}
    meta = {"id": "y", "format": {"provider": "parquet"},
            "schemaString": json.dumps(schema_json),
            "partitionColumns": ["day"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"}}

    def write_part(name, rows):
        os.makedirs(os.path.join(root, os.path.dirname(name)) or root,
                    exist_ok=True)
        pq.write_table(pa.table({
            "col-aaa": pa.array([r[0] for r in rows], pa.int64()),
            "col-bbb": pa.array([r[1] for r in rows], pa.float64())}),
            os.path.join(root, name))
        return name

    f0 = write_part("part-000.parquet", [(1, 1.0), (2, 2.0)])
    f1 = write_part("part-001.parquet", [(3, 3.0)])
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        for p, d in ((f0, "7"), (f1, "8")):
            fh.write(json.dumps({"add": {
                "path": p, "partitionValues": {"col-ccc": d},
                "size": os.path.getsize(os.path.join(root, p)),
                "modificationTime": 0, "dataChange": True}}) + "\n")
    got = read_delta_dir(spark, root)
    assert set(got.columns) == {"id", "v", "day"}
    assert dict(got.dtypes)["day"] == "int"
    assert _rows(got) == {(1, 1.0, 7), (2, 2.0, 7), (3, 3.0, 8)}
    # 'id' mode still refuses loudly
    meta2 = {**meta, "configuration": {
        "delta.columnMapping.mode": "id"}}
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"metaData": meta2}) + "\n")
    with pytest.raises(ValueError, match="column mapping mode"):
        read_delta_dir(spark, root)


def test_materialize_dvs_on_partitioned_table(spark, tmp_path):
    """DV materialization export on a PARTITIONED table: only the
    masked subdirs rewrite (cold partitions keep their original files
    in the exported log), partitionValues survive, and the exported
    snapshot equals the engine's own DV-masked read."""
    from sport_advantages_moderne_data_infrastructure_spark.sources.deltainterop import (
        read_delta_dir as rdd,
    )

    o = _orders(spark, 100)
    t = TxnTable(str(tmp_path / "pdv"))
    t.set_generated_column("order_month",
                           "DATE_FORMAT(o_orderdate, 'yyyy-MM')")
    t.set_partition_column("order_month")
    t.append(o)
    t.delete_where(spark, "o_orderkey % 4 = 0", use_dv=True)
    dv_dirs = set(t.snapshot_dvs())
    assert dv_dirs
    export_delta_log(t, spark, materialize_dvs=True)
    got = rdd(spark, t.path)
    want = t.read(spark)
    assert got.count() == want.count()
    assert got.filter("o_orderkey % 4 = 0").count() == 0
    assert _rows(got.select(
        "o_orderkey", F.col("order_month").cast("string"))) == _rows(
        want.select("o_orderkey", F.col("order_month").cast("string")))
    # cold partitions keep their ORIGINAL files in the exported view
    cold = [f for f in got.inputFiles()
            if "/data/" in f
            and not any(d in f for d in dv_dirs)]
    assert cold, "expected untouched original files for unmasked dirs"
