"""Pluggable table format: Iceberg when the runtime is present, parquet
otherwise — one code path.

The north rule targets Iceberg tables of web pages. This sandbox
vendors no iceberg-spark runtime jar (and has no network), so the
format is detected at session start: if the Iceberg Spark runtime is
on the classpath, index stages are written/read as location-based
Iceberg tables (``format("iceberg")`` over a path, HadoopTables
layout), giving snapshot isolation + hidden-partitioning on ``term``;
otherwise identical-schema parquet datasets are used. All build/query
code goes through :func:`write_stage` / :func:`read_stage` and is
agnostic to the choice.

To enable on a real cluster:
  spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver> \
    --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession


@lru_cache(maxsize=4)
def _iceberg_on_classpath(app_id: str) -> bool:
    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def table_format(spark: SparkSession) -> str:
    return "iceberg" if _iceberg_on_classpath(spark.sparkContext.applicationId) else "parquet"


def write_stage(df: DataFrame, path: str) -> None:
    fmt = table_format(df.sparkSession)
    df.write.mode("overwrite").format(fmt).save(path)


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format(table_format(spark)).load(path)
