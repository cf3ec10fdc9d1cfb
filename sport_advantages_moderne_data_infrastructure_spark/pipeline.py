"""End-to-end batch pipeline — the reference's Airflow DAG logic
(rewrite_delta_dag.py + data_validation_dag.py) absorbed into a plain
function chain (SURVEY §7 phase 5: the DAG is orchestration wiring, not
query semantics; the engine keeps the semantics).

Flow (mirrors §3.2 of the survey):
  quality gate (GE expectations, hard-fail like the checkpoint at
  data_validation_dag.py:330-361)
  → final table (agg + casts + joins, read_delta.py:234-294)
  → flagship prime analytics (README.md:140-164)
  → partitioned overwrite write (read_delta.py:219-222, plus the
    partitionBy the reference lacks)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .operators.quality import quality_report
from .operators.relational import final_table, prime_query
from .sources import domain as D
from .sources.io import write_overwrite


class DataQualityError(RuntimeError):
    """Raised when an expectation fails — the DAG's hard task failure."""


@dataclass
class PipelineResult:
    quality: list
    final_rows: int
    prime_rows: int
    output_path: str | None


def run_batch_pipeline(spark: SparkSession, sf_dir: str,
                       output_path: str | None = None,
                       partition_by: tuple = ("business_unity",)) -> PipelineResult:
    activities = D.sport_activities(spark, sf_dir)

    quality = quality_report(activities).collect()
    failed = [r["expectation"] for r in quality if not r["passed"]]
    if failed:
        raise DataQualityError(f"expectations failed: {failed}")

    final = final_table(
        D.employees(spark, sf_dir),
        D.commute_validations(spark, sf_dir),
        activities,
    )
    prime = prime_query(final)

    if output_path:
        write_overwrite(prime, output_path, partition_by=list(partition_by))
        written: DataFrame = spark.read.parquet(output_path)
        prime_rows = written.count()
    else:
        prime_rows = prime.count()

    return PipelineResult(
        quality=[r.asDict() for r in quality],
        final_rows=final.count(),
        prime_rows=prime_rows,
        output_path=output_path,
    )
