"""Native binary serialization (reference save/load_df src/io.jl:835-847)
→ Parquet, the columnar at-rest format the reference's column vectors
approximate.

``save`` defaults to snappy parquet with optional partitioning and
bucketing — the two levers that decide join/agg shuffle cost at 100 TB:
partition columns give scan pruning; bucket columns give shuffle-free
joins on the bucket key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    bucket_by: tuple[int, Sequence[str]] | None = None,
    table_name: str | None = None,
    mode: str = "overwrite",
) -> None:
    """save(filename, df) (reference src/io.jl:835-841)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketed writes require table_name (Hive metastore)")
        w.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(table_name)
        return
    w.parquet(path)


def load_df(spark: SparkSession, path: str) -> DataFrame:
    """load_df(filename) (reference src/io.jl:843-847)."""
    return spark.read.parquet(path)
