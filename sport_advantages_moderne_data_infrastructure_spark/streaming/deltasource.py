"""Structured-Streaming SOURCE over a foreign Delta directory — the
consumer half of the interop seam (r14 session 5).

``sources/deltainterop.py`` made the engine's tables READABLE by real
Delta consumers and real Delta tables readable in batch; this module
makes a Delta directory STREAMABLE with plain Spark, via Spark 4's
Python DataSource API (``pyspark.sql.datasource``) — the exact
capability delta-spark users exercise with
``spark.readStream.format("delta")`` (reference anchor: the
reference's streaming leg consumes its Delta sink's appends;
spark/SaveDelta.scala:157-163 is the producing side):

- offsets are LOG VERSIONS (``{"version": N}``): each micro-batch is
  the ``dataChange`` adds of the commits in ``(start, end]``, one
  input partition per added file, replayed deterministically — so
  Spark's own checkpointing gives exactly-once across restarts with
  no source-side state;
- executor-side reads are Arrow ``RecordBatch`` iterators straight
  from the parquet footers (the Python-source fast path — no
  row-by-row Python), with partition columns re-attached from the
  add's ``partitionValues`` and cast to the declared schema;
- Delta's streaming semantics for non-append commits: a commit that
  REMOVES data files with ``dataChange=true`` raises by default
  (resync guidance), ``skipChangeCommits`` skips the whole commit
  (Delta's option of the same name), ``ignoreDeletes`` admits
  delete-only commits' adds;
- scope refusals are LOUD: deletion-vector adds and column-mapped
  tables raise at planning time (their physical layout needs the
  batch reader's decode paths — ``read_delta_dir`` — not a streaming
  tail).

Bootstrap contract: like Delta's default, streaming starts at the
table's LATEST version (only new commits flow); ``startingVersion``
accepts an int or ``"earliest"`` to replay history. The
full-table-then-tail pattern is ``read_delta_dir(path)`` at version V
followed by a stream with ``startingVersion=V+1``.
"""
from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class _AddPartition(InputPartition):
    """One added file of one commit — the unit of executor read."""

    def __init__(self, table_path: str, rel_path: str,
                 part_values: dict, version: int):
        self.table_path = table_path
        self.rel_path = rel_path
        self.part_values = part_values
        self.version = version


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _versions(log_dir: str) -> list[int]:
    out = []
    for f in os.listdir(log_dir):
        if f.endswith(".json") and len(f) == 25 and f[:-5].isdigit():
            out.append(int(f[:-5]))
    return sorted(out)


def _commit_actions(log_dir: str, v: int) -> list[dict]:
    with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def _latest_meta(log_dir: str) -> dict:
    """Newest metaData action, walking the JSON commits newest-first
    and falling back to the newest checkpoint (classic parquet or v2
    manifest, sidecars not needed — metaData rides the manifest)."""
    for v in reversed(_versions(log_dir)):
        meta = None
        for a in _commit_actions(log_dir, v):
            if "metaData" in a:
                meta = a["metaData"]
        if meta is not None:
            return meta
    from ..sources.deltainterop import _checkpoint_parts
    cp = _checkpoint_parts(log_dir, None)
    if cp is not None:
        if cp[1][0].endswith(".json"):
            with open(cp[1][0]) as fh:
                for ln in fh:
                    a = json.loads(ln) if ln.strip() else {}
                    if "metaData" in a:
                        return a["metaData"]
        else:
            import pyarrow.parquet as pq
            for part in cp[1]:
                t = pq.read_table(part, columns=["metaData"])
                for row in t.column("metaData").to_pylist():
                    if row and row.get("schemaString"):
                        return row
    raise ValueError(f"no metaData action found in {log_dir}")


def _latest_proto(log_dir: str) -> dict | None:
    """Newest protocol action (JSON commits newest-first, checkpoint
    manifest fallback) — input to the reader-features gate."""
    for v in reversed(_versions(log_dir)):
        proto = None
        for a in _commit_actions(log_dir, v):
            if "protocol" in a:
                proto = a["protocol"]
        if proto is not None:
            return proto
    from ..sources.deltainterop import _checkpoint_parts
    cp = _checkpoint_parts(log_dir, None)
    if cp is not None:
        if cp[1][0].endswith(".json"):
            with open(cp[1][0]) as fh:
                for ln in fh:
                    a = json.loads(ln) if ln.strip() else {}
                    if "protocol" in a:
                        return a["protocol"]
        else:
            import pyarrow.parquet as pq
            for part in cp[1]:
                t = pq.read_table(part, columns=["protocol"])
                for row in t.column("protocol").to_pylist():
                    if row and row.get("minReaderVersion") is not None:
                        return {k: v for k, v in row.items()
                                if v is not None}
    return None


class DeltaDirStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options["path"]
        self._log = _log_dir(self._path)
        self._max_versions = int(
            options.get("maxversionspertrigger", 0)) or None
        self._skip_change = str(
            options.get("skipchangecommits", "false")).lower() == "true"
        self._ignore_deletes = str(
            options.get("ignoredeletes", "false")).lower() == "true"
        start = str(options.get("startingversion", "latest")).lower()
        vs = _versions(self._log)
        if start == "latest":
            self._start_after = vs[-1] if vs else -1
        elif start == "earliest":
            self._start_after = -1
        else:
            self._start_after = int(start) - 1

    def initialOffset(self) -> dict:
        return {"version": self._start_after}

    def latestOffset(self) -> dict:
        vs = _versions(self._log)
        latest = vs[-1] if vs else self._start_after
        # rate limit: at most N versions per micro-batch (Delta's
        # maxFilesPerTrigger analog at version granularity). Engages
        # from the SECOND planned batch: Spark queries latestOffset
        # before initialOffset on a fresh start and resumes restarts
        # from its own checkpoint, so the stream's true position is
        # unknowable on the first call — capping it relative to
        # startingVersion could land BELOW a restart's checkpointed
        # offset and stall the stream forever. The first micro-batch
        # therefore catches up wholesale; every later one is bounded
        # via the position partitions() records.
        if self._max_versions is not None \
                and getattr(self, "_last_start", None) is not None:
            latest = min(latest,
                         self._last_start + self._max_versions)
        return {"version": max(latest, self._start_after)}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        self._last_start = int(end["version"])
        lo, hi = int(start["version"]), int(end["version"])
        have = set(_versions(self._log))
        missing = [v for v in range(lo + 1, hi + 1) if v not in have]
        if missing:
            raise ValueError(
                f"delta stream source: commit JSON missing for "
                f"version(s) {missing[:5]} in {self._log} "
                "(log-compacted or retention-cleaned) — restart the "
                "stream from a snapshot past the missing range")
        parts: list[InputPartition] = []
        for v in range(lo + 1, hi + 1):
            adds, data_removes = [], False
            for a in _commit_actions(self._log, v):
                if "add" in a and a["add"].get("dataChange", True):
                    adds.append(a["add"])
                elif "remove" in a and a["remove"].get("dataChange",
                                                       True):
                    data_removes = True
            if data_removes:
                if self._skip_change:
                    continue  # Delta's skipChangeCommits
                if not (self._ignore_deletes and not adds):
                    raise ValueError(
                        f"delta stream source: version {v} changes "
                        "existing data (dataChange removes) — an "
                        "append-only stream cannot represent it; "
                        "pass skipChangeCommits=true to skip such "
                        "commits or ignoreDeletes=true for "
                        "delete-only commits, else resync from a "
                        "snapshot (Delta's own streaming contract)")
            from urllib.parse import unquote
            for a in adds:
                if a.get("deletionVector"):
                    raise ValueError(
                        f"delta stream source: version {v} carries "
                        "deletion-vector adds — stream reads cannot "
                        "apply DV masks; use read_delta_dir for the "
                        "snapshot and restart past the DV era")
                parts.append(_AddPartition(
                    self._path, unquote(a["path"]),
                    dict(a.get("partitionValues") or {}), v))
        return parts

    def read(self, partition: _AddPartition) -> Iterator:
        """Executor-side: Arrow batches straight from the parquet
        file, partition columns re-attached as constant arrays cast
        to the declared schema types."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        want = {f.name: f for f in self._schema.fields}
        fpath = os.path.join(partition.table_path, partition.rel_path)
        pf = pq.ParquetFile(fpath)
        file_cols = [c for c in pf.schema_arrow.names if c in want
                     and c not in partition.part_values]
        for rb in pf.iter_batches(columns=file_cols):
            n = rb.num_rows
            arrays, names = [], []
            for f in self._schema.fields:
                at = to_arrow_type(f.dataType)
                if f.name in partition.part_values:
                    raw = partition.part_values[f.name]
                    if raw is None or raw == _HIVE_NULL:
                        arrays.append(pa.nulls(n, type=at))
                    else:
                        arrays.append(
                            pa.array([raw] * n,
                                     type=pa.string()).cast(at))
                elif f.name in rb.schema.names:
                    arrays.append(
                        rb.column(f.name).cast(at, safe=False))
                else:
                    arrays.append(pa.nulls(n, type=at))
                names.append(f.name)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing to release


class DeltaDirDataSource(DataSource):
    """``spark.readStream.format("delta_dir").load(path)`` after
    :func:`register_delta_dir_source`. Batch reads should use
    :func:`..sources.deltainterop.read_delta_dir` (JVM-side scan,
    pruning, DV/mapping support) — ``reader()`` says so."""

    @classmethod
    def name(cls) -> str:
        return "delta_dir"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path or not os.path.isdir(_log_dir(path)):
            raise ValueError(
                f"delta_dir source: not a Delta table (no _delta_log)"
                f": {path!r}")
        from ..sources.deltainterop import _check_reader_features
        _check_reader_features(_latest_proto(_log_dir(path)),
                               "delta_dir source")
        meta = _latest_meta(_log_dir(path))
        mode = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none")
        if mode not in ("none", None, ""):
            raise ValueError(
                "delta_dir source: column-mapped tables "
                f"(mode={mode}) need the batch reader's rename/"
                "field-id paths — read_delta_dir — not a streaming "
                "tail")
        return StructType.fromJson(json.loads(meta["schemaString"]))

    def reader(self, schema):
        raise NotImplementedError(
            "delta_dir is a STREAMING source; for batch use "
            "sport_advantages_moderne_data_infrastructure_spark."
            "sources.deltainterop.read_delta_dir (JVM scan, partition "
            "pruning, stats skipping, DVs, column mapping)")

    def streamReader(self, schema: StructType) -> DeltaDirStreamReader:
        return DeltaDirStreamReader(schema, dict(self.options))


def register_delta_dir_source(spark) -> None:
    """Idempotent registration of the ``delta_dir`` streaming format
    on this session."""
    spark.dataSource.register(DeltaDirDataSource)


def stream_delta_dir(spark, path: str, **options):
    """Convenience: register + ``readStream`` over a Delta directory.
    Options: ``startingVersion`` (int | 'earliest' | 'latest',
    default latest), ``maxVersionsPerTrigger``, ``skipChangeCommits``,
    ``ignoreDeletes``."""
    register_delta_dir_source(spark)
    r = spark.readStream.format("delta_dir").option("path", path)
    for k, v in options.items():
        r = r.option(k, str(v))
    return r.load()
