"""``txnlog`` as a first-class Spark data source (Python DataSource API,
Spark 4): ``spark.readStream.format("txnlog").load(path)`` streams a
transactional table's append change feed — the idiomatic replacement for
the reference's poll-the-table-again batch loop (read_delta.py:47-53
re-reads and re-counts the whole Delta table every cycle; here each
micro-batch reads exactly the commits since the last checkpointed
version). ``spark.read.format("txnlog")`` gives batch snapshot reads with
time travel via ``option("version", N)``. The WRITE side is symmetric:
``df.write.format("txnlog").mode("append"|"overwrite")`` publishes one
atomic commit per job, and ``writeStream.format("txnlog")`` is an
exactly-once streaming append sink (per-micro-batch atomic commit +
batch-id replay guard — the Delta streaming-sink shape of
SaveDelta.scala:156-163 without the jars).

Design: offsets are log versions ({"version": N}), so exactly-once
restart falls out of Structured Streaming's offset checkpointing plus the
log's immutability. Partition planning is one InputPartition per
committed data file — executors read files directly with pyarrow (no
driver data movement, unlike SimpleDataSourceStreamReader); at scale the
per-batch task count equals the files the commits added, exactly the
Kafka-partition ≙ file mapping the rest of the streaming layer assumes.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from .txnlog import TxnTable


@dataclass
class _FilePartition(InputPartition):
    path: str  # one parquet file; value may be a partition-subdir file
    part_col: str | None = None
    part_val: str | None = None


def _files_of(table: TxnTable, rel_dirs: list[str]) -> list[_FilePartition]:
    parts = []
    for rel in rel_dirs:
        base = os.path.basename(rel)
        col, _, val = base.partition("=") if "=" in base else (None, "", None)
        for f in sorted(glob.glob(os.path.join(table.path, rel, "*.parquet"))):
            parts.append(_FilePartition(f, col, val))
    return parts


def _normalize_ts(table):
    """Spark writes INT96/nanosecond timestamps that pyarrow surfaces as
    Timestamp(NANOSECOND) — unsupported by the DataSource Arrow bridge;
    cast them to microseconds (Spark's native precision, lossless here)."""
    import pyarrow as pa

    for i, f in enumerate(table.schema):
        if pa.types.is_timestamp(f.type) and f.type.unit != "us":
            table = table.set_column(
                i, f.name,
                table.column(i).cast(pa.timestamp("us", f.type.tz)))
    return table


def _read_file(p: _FilePartition):
    """Executor-side: one parquet file → arrow batches. The partition
    column (if the file lives in a ``col=value`` subdir) is re-attached
    from partition metadata, mirroring Spark's own partitioned reads."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = _normalize_ts(pq.read_table(p.path))
    if p.part_col is not None:
        t = t.append_column(
            p.part_col, pa.array([int(p.part_val)] * len(t), pa.int32()))
    yield from t.to_batches()


class _TxnStreamReader(DataSourceStreamReader):
    def __init__(self, path: str):
        self.table = TxnTable(path)

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        v = self.table.latest_version()
        return {"version": -1 if v is None else v}

    def partitions(self, start: dict, end: dict):
        adds: list[str] = []
        for v in self.table.versions():
            if start["version"] < v <= end["version"]:
                doc = self.table._doc(v)  # noqa: SLF001
                if doc["removes"]:
                    raise ValueError(
                        f"txnlog stream: version {v} is a rewrite "
                        f"({doc['meta'].get('operation', 'overwrite/merge')});"
                        " the change feed is append-only")
                adds.extend(doc["adds"])
        return _files_of(self.table, adds)

    def read(self, partition: _FilePartition):
        return _read_file(partition)

    def commit(self, end: dict) -> None:
        pass  # the log is immutable; nothing to clean up


class _TxnBatchReader(DataSourceReader):
    def __init__(self, path: str, version: int | None):
        self.table = TxnTable(path)
        self.version = version

    def partitions(self):
        return _files_of(self.table, self.table.snapshot_dirs(self.version))

    def read(self, partition: _FilePartition):
        return _read_file(partition)


@dataclass
class _DirCommit(WriterCommitMessage):
    rel_dir: str | None  # None when the task partition was empty


class _TxnWriterBase:
    """Shared executor-side write: each task writes its own commit dir
    under ``data/`` (invisible until a log doc references it), the driver
    publishes all task dirs in ONE atomic commit — the manifest-commit
    pattern every lakehouse sink uses; failed/speculative task dirs are
    never referenced and fall to ``vacuum()``."""

    def __init__(self, path: str, schema):
        self.path = path
        self.spark_schema = schema

    def write(self, iterator) -> _DirCommit:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        rows = [r.asDict(recursive=True) for r in iterator]
        if not rows:
            return _DirCommit(None)
        arrow = to_arrow_schema(self.spark_schema)
        t = pa.Table.from_pylist(rows, schema=arrow)
        rel = os.path.join("data", _uuid.uuid4().hex)
        os.makedirs(os.path.join(self.path, rel), exist_ok=True)
        pq.write_table(t, os.path.join(self.path, rel, "part-0.parquet"))
        return _DirCommit(rel)

    def _adds(self, messages) -> list[str]:
        return [m.rel_dir for m in messages if m is not None and m.rel_dir]

    def _drop(self, messages) -> None:
        import shutil

        for rel in self._adds(messages):
            shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)


class _TxnStreamWriter(_TxnWriterBase, DataSourceStreamWriter):
    def commit(self, messages, batchId: int) -> None:
        table = TxnTable(self.path)
        if table.last_meta().get("stream_batch_id") == batchId:
            self._drop(messages)  # replayed batch: already committed
            return
        adds = self._adds(messages)
        if adds:
            table.commit(adds, [], {"stream_batch_id": batchId,
                                    "operation": "stream_append"})

    def abort(self, messages, batchId: int) -> None:
        self._drop(messages)


class _TxnBatchWriter(_TxnWriterBase, DataSourceWriter):
    def __init__(self, path: str, schema, overwrite: bool):
        super().__init__(path, schema)
        self.overwrite = overwrite

    def commit(self, messages) -> None:
        table = TxnTable(self.path)
        adds = self._adds(messages)
        removes = table.snapshot_dirs() if self.overwrite else []
        if adds or removes:
            table.commit(adds, removes,
                         {"operation":
                          "overwrite" if self.overwrite else "append"})

    def abort(self, messages) -> None:
        self._drop(messages)


class TxnLogDataSource(DataSource):
    """``format("txnlog")`` — register once per session with
    :func:`register_txn_source`. Options: ``path`` (table root; or pass to
    ``load()``), ``version`` (batch time travel)."""

    @classmethod
    def name(cls) -> str:
        return "txnlog"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("txnlog: .load(<table path>) is required")
        return path

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import IntegerType, StructField

        import pyarrow.parquet as pq

        table = TxnTable(self._path())
        version = self.options.get("version")
        dirs = table.snapshot_dirs(None if version is None else int(version))
        if not dirs:
            raise ValueError(f"txnlog: empty table {table.path}")
        files = _files_of(table, dirs[-1:])  # newest commit defines schema
        import pyarrow as pa
        arrow = pa.schema([
            pa.field(f.name, pa.timestamp("us", f.type.tz))
            if pa.types.is_timestamp(f.type) and f.type.unit != "us" else f
            for f in pq.read_schema(files[0].path)])
        spark_schema = from_arrow_schema(arrow)
        if files[0].part_col is not None:
            spark_schema = spark_schema.add(
                StructField(files[0].part_col, IntegerType()))
        return spark_schema

    def streamReader(self, schema) -> _TxnStreamReader:
        return _TxnStreamReader(self._path())

    def reader(self, schema) -> _TxnBatchReader:
        version = self.options.get("version")
        return _TxnBatchReader(self._path(),
                               None if version is None else int(version))

    def streamWriter(self, schema, overwrite: bool) -> _TxnStreamWriter:
        return _TxnStreamWriter(self._path(), schema)

    def writer(self, schema, overwrite: bool) -> _TxnBatchWriter:
        return _TxnBatchWriter(self._path(), schema, overwrite)


def register_txn_source(spark) -> None:
    spark.dataSource.register(TxnLogDataSource)
