"""SQL entry point (SURVEY.md §3): register the driver corpus as temp
views so every relational operator is reachable through ``spark.sql``
(Catalyst compiles either API to the same plans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.readers import TESTDATA_TABLES, load_table


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create/replace one temp view per corpus table; returns the names."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TESTDATA_TABLES)


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run SQL over the registered corpus (registering first if asked)."""
    if sf_dir is not None:
        register_testdata_views(spark, sf_dir)
    return spark.sql(query)
